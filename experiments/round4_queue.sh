#!/bin/bash
# Round-4 TPU queue. Phase A: checkpoints + per-cluster parity runs
# (fast cluster = nominal 30 km/h at the recovered slot geometry, vfast
# cluster = 30-symbol slots; calibrate_fast.py). Phase B: checkpoint-based
# evals (PTQ wl4-15, e2e incl. coded-LDPC + perfect-CSI, int8). Phase C:
# sub-8-bit LSQ. Liveness-gated stages with .done markers; trainers resume
# from checkpoints so a retry continues rather than restarts.
cd /root/repo
mkdir -p weights logs

probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print(float((x @ x).sum()))" >/dev/null 2>&1
}
wait_tpu() { until probe; do sleep 90; done; }
stage() {
  local name=$1 tmo=$2; shift 2
  if [ -f "logs/.done_$name" ]; then return 0; fi
  wait_tpu
  echo "=== r4 stage $name $(date -u) ===" >> logs/round4_queue.log
  if timeout "$tmo" "$@" >> "logs/$name.log" 2>&1; then
    touch "logs/.done_$name"
  else
    echo "r4 stage $name failed/timeout rc=$?" >> logs/round4_queue.log
  fi
}

CAL5="--calibrated --ue-speed-kmh 5"
CALF="--calibrated --ue-speed-kmh 30"
VF="--slot-symbols 30"
ROBUST="--log-every 226 --checkpoint-every 25 --resume"
TI="python experiments/train_informer.py --train-samples 16384 --lr 1e-3"

for pass in 1 2 3; do
  # --- Phase A: flagship checkpoints + fast/vfast parity runs ---
  stage r4base 7200 $TI --epochs 150 $CAL5 --tag r4base $ROBUST
  stage r4ab   7200 $TI --epochs 150 $CAL5 --dtype bfloat16 --prng rbg \
    --use-pallas --tag r4ab $ROBUST
  stage r4f_sl90 5400 $TI --epochs 100 $CALF --tag r4f $ROBUST
  stage r4f_sl25 5400 $TI --epochs 100 --seq-len 25 $CALF --tag r4f $ROBUST
  stage r4f_sl50 5400 $TI --epochs 100 --seq-len 50 $CALF --tag r4f $ROBUST
  stage r4f_sl75 5400 $TI --epochs 100 --seq-len 75 $CALF --tag r4f $ROBUST
  stage r4f_ll5  5400 $TI --epochs 100 --label-len 5  $CALF --tag r4f $ROBUST
  stage r4f_ll15 5400 $TI --epochs 100 --label-len 15 $CALF --tag r4f $ROBUST
  stage r4f_ll20 5400 $TI --epochs 100 --label-len 20 $CALF --tag r4f $ROBUST
  stage r4f_prob 5400 $TI --epochs 100 --attn prob    $CALF --tag r4f $ROBUST
  stage r4v_dm128 3600 $TI --epochs 50 $VF --tag r4v $ROBUST
  stage r4v_dm64  3600 $TI --epochs 50 --d-model 64 $VF --tag r4v $ROBUST
  stage r4v_dm96  3600 $TI --epochs 50 --d-model 96 $VF --tag r4v $ROBUST

  # --- Phase B: evals against the r4base checkpoint ---
  CKPT=$(ls -t weights/tmodel_*r4base_150.msgpack 2>/dev/null | head -1)
  if [ -n "$CKPT" ]; then
    stage ptq 3600 python experiments/ptq_sweep.py --checkpoint "$CKPT" $CAL5
    stage e2e_uncoded 3600 python experiments/end_to_end_sim.py \
      --checkpoint "$CKPT" $CAL5 --out weights/e2e_results.json
    stage e2e_conv 7200 python experiments/end_to_end_sim.py \
      --checkpoint "$CKPT" $CAL5 --coded --fec conv \
      --out weights/e2e_coded_conv.json
    stage e2e_ldpc 9000 python experiments/end_to_end_sim.py \
      --checkpoint "$CKPT" $CAL5 --coded --fec ldpc \
      --out weights/e2e_coded_ldpc.json
    stage e2e_ls 3600 python experiments/end_to_end_sim.py \
      --checkpoint "$CKPT" $CAL5 --csi ls --out weights/e2e_ls.json
    stage e2e_time 3600 python experiments/end_to_end_sim.py \
      --checkpoint "$CKPT" $CAL5 --domain time --out weights/e2e_time.json
    stage int8_serving 2400 python experiments/int8_serving.py $CAL5
    stage int8_scale 4800 python experiments/int8_scale_ab.py
    # --- Phase C: sub-8-bit LSQ extension (reference stops at 8) ---
    stage lsq_lo 12000 python experiments/train_lsq.py --checkpoint "$CKPT" \
      --nbits-min 4 --nbits-max 7 --epochs 100 $CAL5 --snr 21 \
      --train-samples 16384
    stage lsqfib_lo 12000 python experiments/train_lsq.py --checkpoint "$CKPT" \
      --nbits-min 4 --nbits-max 7 --epochs 100 $CAL5 --snr 21 \
      --train-samples 16384 --fibbinary
  fi

  stage perf_r4 5400 python experiments/perf_study.py
  stage bench_r4 1800 python bench.py
done

echo R4QDONE >> logs/round4_queue.log
