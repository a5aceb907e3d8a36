#!/bin/bash
# Round-5 follow-on queue: runs after round5_queue.sh prints R5QDONE.
# Extra measurements that depend on round-5 code/artifacts:
#  - int8_serving with the weight-only mode (accuracy + latency on the
#    trained flagship)
#  - a second driver-style bench run (median methodology sanity)
cd /root/repo
mkdir -p weights logs

while ! grep -q R5QDONE logs/round5_queue.log 2>/dev/null; do sleep 60; done

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
  echo "=== r5b stage $name $(date -u) ===" >> logs/round5_queue.log
  if timeout "$tmo" "$@" >> "logs/r5_$name.log" 2>&1; then
    touch "logs/.done_r5_$name"
  else
    echo "r5b stage $name failed/timeout rc=$?" >> logs/round5_queue.log
  fi
}

stage int8_serving_wo 3600 python experiments/int8_serving.py \
  --calibrated --ue-speed-kmh 5 --out weights/int8_serving.json
# Settle the bench-default question with interleaved (drift-cancelling)
# timing at the bench shape: f32+BD vs bf16+BD, both rbg.
stage dtype_ab 3600 python experiments/interleaved_ab.py \
  --variants float32+bd+rbg bfloat16+bd+rbg --rounds 10 --steps 28 \
  --out weights/interleaved_ab_r5.json
# Re-run nbits 8-11 from the SAME FP32 preload as the new 4-7 rows (the
# committed 8-11 rows preloaded the older r2cos-50 checkpoint and sit ~0.7 dB
# above the 4-bit row purely from the weaker start — one preload for the
# whole curve).
CKPT=$(ls -t "weights/"tmodel_*r4base_150.msgpack 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  stage lsq_hi 10000 python experiments/train_lsq.py --checkpoint "$CKPT" \
    --nbits-min 8 --nbits-max 11 --epochs 100 --calibrated --ue-speed-kmh 5 \
    --snr 21 --train-samples 16384
  stage lsqfib_hi 10000 python experiments/train_lsq.py --checkpoint "$CKPT" \
    --nbits-min 8 --nbits-max 11 --epochs 100 --calibrated --ue-speed-kmh 5 \
    --snr 21 --train-samples 16384 --fibbinary
fi

stage bench2 2400 python bench.py
stage collect3 600 bash experiments/collect_artifacts.sh
echo R5Q2DONE >> logs/round5_queue.log
