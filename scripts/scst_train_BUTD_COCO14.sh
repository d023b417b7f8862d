#!/usr/bin/env bash
# SCST fine-tune BUTDDetection on COCO14 with fixed 36-box bottom-up features.
set -e
cd "$(dirname "$0")/.."
python Main.py \
  --dataset COCO14 \
  --model_type BUTDDetection \
  --use_bu fixed \
  --operation scst_train \
  --scst_num_epochs "${SCST_EPOCHS:-50}" \
  "$@"
