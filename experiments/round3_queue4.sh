#!/bin/bash
# Round-3 final pass: scale demo + artifact collection after queue3.
cd /root/repo
while ! grep -q R3Q3DONE logs/round3_queue.log 2>/dev/null; do sleep 60; done

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
  echo "=== stage $name $(date -u) ===" >> logs/round3_queue.log
  if timeout "$tmo" "$@" > "logs/$name.log" 2>&1; then
    touch "logs/.done_$name"
  else
    echo "stage $name failed/timeout rc=$?" >> logs/round3_queue.log
  fi
}

stage scale_demo 3000 python experiments/scale_demo.py
stage scale_demo_f32 2400 python experiments/scale_demo.py --dtype float32 --sizes large xl --out weights/scale_demo_f32.json

wait_tpu
cp weights/scale_demo*.json experiments/artifacts/ 2>/dev/null
bash experiments/collect_artifacts.sh > logs/collect_r3d.log 2>&1 || true
echo R3Q4DONE >> logs/round3_queue.log
