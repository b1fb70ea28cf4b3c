#!/usr/bin/env bash
# Stage 1: multi-view contrastive pretraining @224 (reference run_cxr_pt_224.sh parity:
# AdamW lr 5e-5, batch 32, 50 epochs, monitor val all_loss)
set -euo pipefail
python -m evoke_tpu.cli pretrain \
  --data.ann_path "${ANN_PATH:?set ANN_PATH}" \
  --data.image_dir "${IMAGE_DIR:?set IMAGE_DIR}" \
  --model.image_size 224 --data.batch_size 32 \
  --optim.optim AdamW --optim.pt_lr 5.0e-5 \
  --trainer.epochs 50 --trainer.version "${VERSION:-pt224}" "$@"
