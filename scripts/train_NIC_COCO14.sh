#!/usr/bin/env bash
# XE-train NIC on COCO14 (reference train_NIC_COCO14.sh equivalent).
set -e
cd "$(dirname "$0")/.."
python Main.py \
  --dataset COCO14 \
  --model_type NIC \
  --operation train \
  --num_epochs "${NUM_EPOCHS:-30}" \
  --train_batch_size "${BATCH:-128}" \
  "$@"
