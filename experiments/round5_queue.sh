#!/bin/bash
# Round-5 TPU queue (VERDICT r4 priorities, in order):
#  1. step_profile with prob rows (launched separately; waited for here)
#  2. attn=prob parity run (the one missing parity cell) — post scatter-fix
#  3. SNR-cluster re-runs with checkpoints (CI-able rows)
#  4. d_ff cluster re-run at the 100-ep recipe + distil off
#  5. parity CI evaluation (64 batches + bootstrap)
#  6. sub-8-bit LSQ + fibbinary (nbits 4-7)
#  7. int8 weight-only serving A/B incl. the d_model=1024 row
#  8. ProbSparse layout crossover measurement
#  9. post-fix prob microprofile + bench
# One TPU job at a time; stages skip when their .done marker exists.
cd /root/repo
mkdir -p weights logs

# Wait for any in-flight experiment to release the TPU.
while ps -ef | grep -E "experiments/(step_profile|prob_profile|train_informer|sweep|train_lsq|int8_|eval_parity|prob_crossover)" | grep -v grep > /dev/null; do
  sleep 30
done

probe() {
  timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print(float((x @ x).sum()))" >/dev/null 2>&1
}
wait_tpu() { until probe; do sleep 90; done; }
stage() {
  local name=$1 tmo=$2; shift 2
  if [ -f "logs/.done_r5_$name" ]; then return 0; fi
  wait_tpu
  echo "=== r5 stage $name $(date -u) ===" >> logs/round5_queue.log
  if timeout "$tmo" "$@" >> "logs/r5_$name.log" 2>&1; then
    touch "logs/.done_r5_$name"
  else
    echo "r5 stage $name failed/timeout rc=$?" >> logs/round5_queue.log
  fi
}

CAL5="--calibrated --ue-speed-kmh 5"
CAL3="--calibrated --ue-speed-kmh 3"
CALF="--calibrated --ue-speed-kmh 30"
ROBUST="--log-every 226 --checkpoint-every 25 --resume"
TI="python experiments/train_informer.py --train-samples 16384 --lr 1e-3"
CKPT=$(ls -t "weights/"tmodel_*r4base_150.msgpack 2>/dev/null | head -1)

# --- 2. the missing parity cell (100 ep to match the committed attn=full row) ---
stage prob_parity 5400 $TI --epochs 100 --attn prob $CALF --tag r5p $ROBUST

# --- 3. SNR cluster with checkpoints (50-ep reference protocol) ---
stage parity_snr 9000 python experiments/sweep.py snr --epochs 50 \
  --train-samples 16384 $CAL5 --lr 1e-3 --tag r5s --log-every 226 \
  --checkpoint-every 25

# --- 4. d_ff at the 100-ep recipe + distil off ---
stage parity_dff 12000 python experiments/sweep.py d_ff --epochs 100 \
  --train-samples 16384 $CAL3 --lr 1e-3 --tag r5d --log-every 226 \
  --checkpoint-every 25
stage parity_distil 3600 $TI --epochs 100 --no-distil $CAL3 --tag r5d $ROBUST

# --- refresh parity table from fresh results, then CI ---
stage collect 600 bash experiments/collect_artifacts.sh
stage parity_ci 5400 python experiments/eval_parity_ci.py \
  --parity weights/parity.json

# --- 6. sub-8-bit LSQ/fibbinary ---
if [ -n "$CKPT" ]; then
  stage lsq_lo 10000 python experiments/train_lsq.py --checkpoint "$CKPT" \
    --nbits-min 4 --nbits-max 7 --epochs 100 $CAL5 --snr 21 \
    --train-samples 16384
  stage lsqfib_lo 10000 python experiments/train_lsq.py --checkpoint "$CKPT" \
    --nbits-min 4 --nbits-max 7 --epochs 100 $CAL5 --snr 21 \
    --train-samples 16384 --fibbinary
fi

# --- 7. int8 weight-only + xl row ---
stage int8_scale 7200 python experiments/int8_scale_ab.py

# --- 8. layout crossover ---
stage prob_crossover 5400 python experiments/prob_crossover.py

# --- 9. post-fix microprofile + bench ---
stage prob_profile_postfix 3600 python experiments/prob_profile.py \
  --out experiments/artifacts/prob_profile_postfix.json
stage bench 2400 python bench.py

stage collect2 600 bash experiments/collect_artifacts.sh
echo R5QDONE >> logs/round5_queue.log
