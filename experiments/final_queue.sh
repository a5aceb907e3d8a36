#!/bin/bash
# End-of-round prioritized TPU queue (replaces the tail of round_queue.sh +
# post_queue.sh when wall-clock is tight). Deadline-guarded per stage.
set -x
cd "$(dirname "$0")/.."

DEADLINE=${DEADLINE:-1787040800}
guard() { [ "$(date +%s)" -lt "$DEADLINE" ] || { echo FINAL_QUEUE_DEADLINE; exit 0; }; }

# 1) Pallas/bf16/quant on-device perf study (ROADMAP pending items).
guard
timeout 800 python experiments/perf_study.py --reps 20 > /tmp/q_perf.log 2>&1

# 2) Headline-band demonstration: smooth-channel (3 km/h) fine-tune.
guard
CKPT=$(ls -t weights/tmodel_*_ss14_pre_*.msgpack 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  timeout 1200 python experiments/train_informer.py \
    --slot-symbols 14 --ue-speed-kmh 3 --snr 21 --epochs 50 --lr 1e-4 \
    --train-samples 65536 --val-samples 4096 --preload "$CKPT" --tag smooth \
    > /tmp/q_smooth.log 2>&1
fi

# 3) Latency matrix (reduced TimingAnalysis sweep).
guard
timeout 900 python experiments/timing_analysis.py \
  --params seq_len --reps 20 > /tmp/q_timing.log 2>&1

# 4) Model-family comparison (reduced budget).
guard
timeout 1200 python experiments/comparison.py --slot-symbols 14 \
  --steps 500 --epochs 5 --train-samples 4096 > /tmp/q_comparison.log 2>&1

# 5) MACs/params report.
guard
timeout 500 python experiments/complexity_report.py > /tmp/q_complexity.log 2>&1

# 6) Tables + figures.
timeout 400 python experiments/collect_results.py > /tmp/q_collect.log 2>&1
timeout 400 python experiments/make_figures.py > /tmp/q_figures.log 2>&1

# 7) Benchmark sanity.
guard
timeout 700 python bench.py > /tmp/q_bench.log 2>&1
echo FINAL_QUEUE_DONE
