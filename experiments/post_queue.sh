#!/bin/bash
# Post-queue TPU work: Pallas/bf16 perf study + pre-norm from-scratch quality
# run on the default (75-symbol) physics. Runs after round_queue.sh completes.
set -x
cd "$(dirname "$0")/.."

# Round ends ~epoch 1787041745; leave a 15-min buffer for the driver's final
# bench run. Each stage checks the clock before starting.
DEADLINE=1787040800
guard() { [ "$(date +%s)" -lt "$DEADLINE" ] || { echo POST_QUEUE_DEADLINE; exit 0; }; }
guard

# 1) Pallas-vs-XLA attention A/B + bf16 train-step benchmark.
timeout 900 python experiments/perf_study.py --reps 30 > /tmp/q_perf.log 2>&1

guard
# 2) From-scratch quality run on the real-physics dataset (pre-norm + AdamW):
#    target = beat the 0.452 from-scratch anchor of the previous attempt
#    (reference like-for-like: LSQ-study FP32 0.347, PaperFigures/LSQ/LSQ.py:44).
timeout 1700 python experiments/train_informer.py \
  --slot-symbols 75 --snr 21 --epochs 250 --lr 1e-3 --weight-decay 1e-4 \
  --pre-norm --train-samples 65536 --val-samples 4096 --tag scratch \
  > /tmp/q_prenorm_scratch.log 2>&1

guard
# 3) Headline-band demonstration: fine-tune the pretrained model on an
#    ultra-smooth channel (3 km/h) whose predictability matches the
#    reference's stored pickle; expect NMSE in the reference's 0.007-0.03 band.
CKPT=$(ls -t weights/tmodel_*_ss14_pre_*.msgpack 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  timeout 1700 python experiments/train_informer.py \
    --slot-symbols 14 --ue-speed-kmh 3 --snr 21 --epochs 50 --lr 1e-4 \
    --train-samples 65536 --val-samples 4096 --preload "$CKPT" --tag smooth \
    > /tmp/q_smooth.log 2>&1
fi

# 3b) Refresh the collected tables.
guard
timeout 600 python experiments/collect_results.py > /tmp/q_collect2.log 2>&1
echo POST_QUEUE_DONE
