#!/bin/bash
# Serial TPU experiment queue for after the pretrain run. One process at a
# time (tunnel exclusivity); everything logs under /tmp/q_*.log.
set -x
CKPT="$1"   # pretrained checkpoint path

# 1) Reference SNR sweep: 50-epoch fine-tunes from the pretrained model
#    (BASELINE.md headline table). snr_db is traced, so all five runs share
#    one compiled program.
for SNR in 12 14 16 18 20; do
  timeout 2000 python experiments/train_informer.py \
    --snr "$SNR" --epochs 50 --lr 1e-4 \
    --train-samples 65536 --val-samples 4096 \
    --preload "$CKPT" --tag ft \
    > "/tmp/q_snr_${SNR}.log" 2>&1
done

# 2) PTQ sweep on the pretrained checkpoint (wl 4..12 x nearest/stochastic).
timeout 2000 python experiments/ptq_sweep.py --checkpoint "$CKPT" \
  --wl-min 4 --wl-max 12 > /tmp/q_ptq.log 2>&1

# 3) Latency matrix (subset of the TimingAnalysis sweep).
timeout 2400 python experiments/timing_analysis.py \
  --params seq_len d_model --reps 50 > /tmp/q_timing.log 2>&1

# 4) Model-family comparison (reduced budget).
timeout 3000 python experiments/comparison.py \
  --steps 1500 --epochs 10 --train-samples 8192 > /tmp/q_comparison.log 2>&1

# 5) End-to-end link sim with the predictor in the loop.
timeout 1200 python experiments/end_to_end_sim.py --checkpoint "$CKPT" \
  > /tmp/q_e2e.log 2>&1

# 6) Final benchmark.
timeout 1200 python bench.py > /tmp/q_bench.log 2>&1
echo QUEUE_DONE
