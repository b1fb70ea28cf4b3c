#!/usr/bin/env bash
# Stage 2: knowledge-guided finetune @384 (reference run_cxr_ft_384.sh parity:
# RAdam, pt_lr 5e-6 / ft_lr 5e-5, monitor RCB, 3 decoder layers)
set -euo pipefail
python -m evoke_tpu.cli finetune \
  --data.ann_path "${ANN_PATH:?set ANN_PATH (retrieval-augmented annotation)}" \
  --data.image_dir "${IMAGE_DIR:?set IMAGE_DIR}" \
  --model.image_size 384 --model.num_layers 3 --data.batch_size 32 \
  --optim.optim RAdam --optim.pt_lr 5.0e-6 --optim.ft_lr 5.0e-5 \
  --trainer.ft_monitor_metric RCB \
  --trainer.load "${LOAD:?set LOAD to the stage-1 checkpoint dir}" \
  --trainer.version "${VERSION:-ft384}" "$@"
