#!/bin/bash
# Serial TPU experiment queue for the round. One process at a time (tunnel
# exclusivity). Stage logs under /tmp/q_*.log; artifacts under weights/.
#
# Chain: pretrain on the parity dataset (14-symbol slots, matching the
# reference's stored-pickle statistics) -> SNR fine-tune sweep (the BASELINE.md
# headline table) -> PTQ -> LSQ -> incremental QAT -> streaming -> e2e link ->
# timing matrix -> model-family comparison -> complexity -> figures -> bench.
set -x
cd "$(dirname "$0")/.."

SS=14

# 1) Pretrain (reference FullPrecision run; 1000-epoch default there, 800 here).
timeout 4000 python experiments/train_informer.py \
  --slot-symbols $SS --snr 21 --epochs 800 --lr 1e-3 \
  --train-samples 65536 --val-samples 4096 --tag pre \
  > /tmp/q_pretrain.log 2>&1

CKPT=$(ls -t weights/tmodel_*_ss${SS}_pre_*.msgpack 2>/dev/null | head -1)
echo "PRETRAIN_CKPT=$CKPT"
if [ -z "$CKPT" ]; then echo QUEUE_ABORT_NO_CKPT; exit 1; fi

# 2) Reference SNR sweep: 50-epoch fine-tunes from the pretrained model.
for SNR in 12 14 16 18 20; do
  timeout 2000 python experiments/train_informer.py \
    --slot-symbols $SS --snr "$SNR" --epochs 50 --lr 1e-4 \
    --train-samples 65536 --val-samples 4096 \
    --preload "$CKPT" --tag ft \
    > "/tmp/q_snr_${SNR}.log" 2>&1
done

# 3) PTQ sweep (wl 4..12, nearest + stochastic).
timeout 2000 python experiments/ptq_sweep.py --checkpoint "$CKPT" \
  --slot-symbols $SS --wl-min 4 --wl-max 12 > /tmp/q_ptq.log 2>&1

# 4) LSQ QAT (nbits=8) preloading FP32 weights.
timeout 2400 python experiments/train_lsq.py --checkpoint "$CKPT" \
  --slot-symbols $SS --nbits-min 8 --nbits-max 8 --epochs 30 \
  --steps-per-epoch 113 > /tmp/q_lsq.log 2>&1

# 5) Incremental QAT (wl=2 fl=-2 proximal).
timeout 2400 python experiments/qat_incremental.py --checkpoint "$CKPT" \
  --slot-symbols $SS --rounding proximal --epochs-per-step 1 \
  --steps-per-epoch 113 > /tmp/q_qat.log 2>&1

# 6) Streaming blockwise evaluation.
timeout 1200 python experiments/train_streaming.py --checkpoint "$CKPT" \
  --slot-symbols $SS > /tmp/q_stream.log 2>&1

# 7) End-to-end link sim with the predictor in the loop.
timeout 1200 python experiments/end_to_end_sim.py --checkpoint "$CKPT" \
  --slot-symbols $SS > /tmp/q_e2e.log 2>&1

# 8) Latency matrix (subset of the TimingAnalysis sweep).
timeout 2400 python experiments/timing_analysis.py \
  --params seq_len d_model --reps 50 > /tmp/q_timing.log 2>&1

# 9) Model-family comparison (reduced budget).
timeout 3000 python experiments/comparison.py --slot-symbols $SS \
  --steps 1500 --epochs 10 --train-samples 8192 > /tmp/q_comparison.log 2>&1

# 10) MACs/params report.
timeout 1200 python experiments/complexity_report.py > /tmp/q_complexity.log 2>&1

# 11) Collect results + figures.
timeout 600 python experiments/collect_results.py > /tmp/q_collect.log 2>&1
timeout 600 python experiments/make_figures.py > /tmp/q_figures.log 2>&1

# 12) Final benchmark sanity run.
timeout 1200 python bench.py > /tmp/q_bench.log 2>&1
echo QUEUE_DONE
