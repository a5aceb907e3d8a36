#!/bin/bash
# Round-3 follow-on queue: runs after round3_queue.sh finishes.
cd /root/repo
while ! grep -q R3QDONE logs/round3_queue.log 2>/dev/null; do sleep 60; done

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

# int8 serving eval on the freshest flagship checkpoint
stage int8_serving 1800 python experiments/int8_serving.py --calibrated --ue-speed-kmh 5

wait_tpu
bash experiments/collect_artifacts.sh > logs/collect_r3b.log 2>&1 || true
echo R3Q2DONE >> logs/round3_queue.log
