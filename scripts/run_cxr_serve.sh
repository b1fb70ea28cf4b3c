#!/usr/bin/env bash
# Serve: pipelined streaming inference (no scoring) -> serve_prediction.csv +
# one-line JSON throughput summary. Beyond the reference (it has no serving
# path); defaults mirror run_cxr_test_224.sh's decode configuration.
set -euo pipefail
python -m evoke_tpu.cli serve \
  --data.ann_path "${ANN_PATH:?set ANN_PATH}" \
  --data.image_dir "${IMAGE_DIR:?set IMAGE_DIR}" \
  --model.image_size "${IMAGE_SIZE:-224}" --decode.beam_size 3 \
  --trainer.load "${LOAD:?set LOAD to the finetuned checkpoint dir}" \
  --trainer.version "${VERSION:-serve}" "$@"
