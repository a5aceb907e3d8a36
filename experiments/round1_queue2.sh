#!/bin/bash
# Second serial TPU queue: quantization studies + streaming + complexity,
# then the 14-symbol-slot parity retrain.
set -x
CKPT="$1"

# LSQ QAT demo (nbits=8), preloading FP32 weights.
timeout 2400 python experiments/train_lsq.py --checkpoint "$CKPT" \
  --nbits-min 8 --nbits-max 8 --epochs 30 --steps-per-epoch 113 \
  > /tmp/q_lsq.log 2>&1

# Incremental QAT demo (wl=2 fl=-2 proximal, 1 epoch per fraction).
timeout 2400 python experiments/qat_incremental.py --checkpoint "$CKPT" \
  --rounding proximal --epochs-per-step 1 --steps-per-epoch 113 \
  > /tmp/q_qat.log 2>&1

# Streaming blockwise evaluation with the trained model.
timeout 1200 python experiments/train_streaming.py --checkpoint "$CKPT" \
  > /tmp/q_stream.log 2>&1

# MACs/params report for all model families.
timeout 1200 python experiments/complexity_report.py > /tmp/q_complexity.log 2>&1

echo QUEUE2_DONE
