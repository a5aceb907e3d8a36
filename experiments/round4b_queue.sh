#!/bin/bash
# Round-4 priority queue (replaces the tail of round4_queue.sh when wall
# clock runs short): highest VERDICT-impact stages first. Assumes the
# pass-1 ptq stage may still be running when launched — waits for it.
cd /root/repo
mkdir -p weights logs

# Wait for any in-flight stage process to release the TPU.
while ps -ef | grep -E "experiments/(ptq_sweep|train_informer|end_to_end_sim|int8_|train_lsq|perf_study|step_profile)" | grep -v grep > /dev/null; do
  sleep 30
done
[ -f weights/ptq_results.json ] && touch logs/.done_ptq

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
  echo "=== r4b stage $name $(date -u) ===" >> logs/round4_queue.log
  if timeout "$tmo" "$@" >> "logs/$name.log" 2>&1; then
    touch "logs/.done_$name"
  else
    echo "r4b stage $name failed/timeout rc=$?" >> logs/round4_queue.log
  fi
  bash experiments/collect_artifacts.sh > logs/collect_r4.log 2>&1 || true
}

CAL5="--calibrated --ue-speed-kmh 5"
CALF="--calibrated --ue-speed-kmh 30"
ROBUST="--log-every 226 --checkpoint-every 25 --resume"
TI="python experiments/train_informer.py --train-samples 16384 --lr 1e-3"
CKPT=$(ls -t weights/tmodel_*r4base_150.msgpack 2>/dev/null | head -1)

for pass in 1 2; do
  stage r4f_prob 5400 $TI --epochs 100 --attn prob $CALF --tag r4f $ROBUST
  if [ -n "$CKPT" ]; then
    stage e2e_ldpc 5400 python experiments/end_to_end_sim.py \
      --checkpoint "$CKPT" $CAL5 --coded --fec ldpc \
      --out weights/e2e_coded_ldpc.json
    stage int8_scale 3600 python experiments/int8_scale_ab.py
    stage step_profile 4200 python experiments/step_profile.py
    stage e2e_conv 5400 python experiments/end_to_end_sim.py \
      --checkpoint "$CKPT" $CAL5 --coded --fec conv \
      --out weights/e2e_coded_conv.json
    stage int8_serving 2400 python experiments/int8_serving.py $CAL5
    stage lsq_lo 8000 python experiments/train_lsq.py --checkpoint "$CKPT" \
      --nbits-min 4 --nbits-max 7 --epochs 100 $CAL5 --snr 21 \
      --train-samples 16384
    stage lsqfib_lo 8000 python experiments/train_lsq.py --checkpoint "$CKPT" \
      --nbits-min 4 --nbits-max 7 --epochs 100 $CAL5 --snr 21 \
      --train-samples 16384 --fibbinary
    stage e2e_uncoded 3600 python experiments/end_to_end_sim.py \
      --checkpoint "$CKPT" $CAL5 --out weights/e2e_results.json
    stage e2e_ls 3600 python experiments/end_to_end_sim.py \
      --checkpoint "$CKPT" $CAL5 --csi ls --out weights/e2e_ls.json
    stage e2e_time 3600 python experiments/end_to_end_sim.py \
      --checkpoint "$CKPT" $CAL5 --domain time --out weights/e2e_time.json
  fi
  stage perf_r4 5400 python experiments/perf_study.py
  stage bench_canon 1800 python bench.py
done

bash experiments/collect_artifacts.sh > logs/collect_r4.log 2>&1 || true
echo R4BQDONE >> logs/round4_queue.log
