#!/usr/bin/env bash
# Stage 1.5: build the specific-knowledge annotation via on-device top-k retrieval
set -euo pipefail
python -m evoke_tpu.cli retrieve \
  --data.ann_path "${ANN_PATH:?set ANN_PATH}" \
  --data.image_dir "${IMAGE_DIR:?set IMAGE_DIR}" \
  --trainer.load "${LOAD:?set LOAD to the stage-1 checkpoint dir}" \
  --trainer.version "${VERSION:-retrieve}" "$@"
