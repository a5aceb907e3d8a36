#!/bin/bash
# Round-5 continuation queue. The previous session's environment was wiped
# (gitignored weights/ lost), which cost (a) the interleaved dtype A/B
# artifact cited by BENCH.md/ROADMAP and (b) the r4base flagship checkpoint
# the LSQ sub-8 rows preloaded. This queue regenerates the A/B artifact and
# rebuilds the whole LSQ / LSQ-fibbinary nbits 4-11 curve from ONE fresh
# flagship preload so every row is curve-comparable and records its preload.
# Stages copy their outputs into experiments/artifacts/ immediately so the
# end-of-round commit captures them even if the queue is cut mid-run.
cd /root/repo
mkdir -p weights logs experiments/artifacts

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
  echo "=== r5c stage $name $(date -u) ===" >> logs/round5c_queue.log
  if timeout "$tmo" "$@" >> "logs/$name.log" 2>&1; then
    touch "logs/.done_$name"
  else
    echo "r5c stage $name failed/timeout rc=$?" >> logs/round5c_queue.log
  fi
  # incremental artifact capture after every stage
  for f in interleaved_ab_r5.json lsq_results.json lsq_fibbinary_results.json; do
    [ -f "weights/$f" ] && cp "weights/$f" experiments/artifacts/
  done
}

CAL5="--calibrated --ue-speed-kmh 5"
ROBUST="--log-every 226 --checkpoint-every 25 --resume"
TI="python experiments/train_informer.py --train-samples 16384 --lr 1e-3"

# 1. Regenerate the dtype A/B artifact (drift-cancelling interleaved timing).
stage dtype_ab_r5c 3600 python experiments/interleaved_ab.py \
  --variants float32+bd+rbg bfloat16+bd+rbg --rounds 10 --steps 28 \
  --out weights/interleaved_ab_r5.json

# 2. Fresh flagship FP32 checkpoint (same recipe as r4base).
stage r5base 7200 $TI --epochs 150 $CAL5 --tag r5base $ROBUST

# 3. Full equal-preload LSQ curves, nbits 4-11, both variants.
CKPT=$(ls -t "weights/"tmodel_*r5base_150.msgpack 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  stage lsq_eq 20000 python experiments/train_lsq.py --checkpoint "$CKPT" \
    --nbits-min 4 --nbits-max 11 --epochs 100 $CAL5 --snr 21 \
    --train-samples 16384
  stage lsqfib_eq 20000 python experiments/train_lsq.py --checkpoint "$CKPT" \
    --nbits-min 4 --nbits-max 11 --epochs 100 $CAL5 --snr 21 \
    --train-samples 16384 --fibbinary
fi

stage collect_r5c 600 bash experiments/collect_artifacts.sh
stage bench_r5c 2400 python bench.py
echo R5CQDONE >> logs/round5c_queue.log
