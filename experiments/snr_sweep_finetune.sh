#!/bin/bash
# The reference's headline SNR sweep (BASELINE.md): 50-epoch runs that preload
# the pretrained model (reference FullPrecision/QuantizationAwareTraining.py:192
# hardcodes Weights/tmodel_pretrained.pt). Mirror: fine-tune the long-run
# checkpoint at each training SNR.
#
# Usage: bash experiments/snr_sweep_finetune.sh <pretrained.msgpack> [epochs]
set -e
CKPT="$1"
EPOCHS="${2:-50}"
for SNR in 12 14 16 18 20; do
  python experiments/train_informer.py \
    --snr "$SNR" --epochs "$EPOCHS" --lr 1e-4 \
    --train-samples 65536 --val-samples 4096 \
    --preload "$CKPT" --tag ft \
    2>&1 | grep -vE "^WARNING"
done
