#!/usr/bin/env bash
# Test: beam-3 inference + metrics + test_prediction.csv (reference run_cxr_test_224.sh)
set -euo pipefail
python -m evoke_tpu.cli test \
  --data.ann_path "${ANN_PATH:?set ANN_PATH}" \
  --data.image_dir "${IMAGE_DIR:?set IMAGE_DIR}" \
  --model.image_size 224 --decode.beam_size 3 \
  --trainer.load "${LOAD:?set LOAD to the finetuned checkpoint dir}" \
  --trainer.version "${VERSION:-test224}" "$@"
