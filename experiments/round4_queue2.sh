#!/bin/bash
# Round-4 follow-up queue: waits for round4_queue.sh, then runs the
# step-profile breakdown, bench variants, and final collection.
cd /root/repo
while ! grep -q R4QDONE logs/round4_queue.log 2>/dev/null; do sleep 60; done

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
  echo "=== r4q2 stage $name $(date -u) ===" >> logs/round4_queue.log
  if timeout "$tmo" "$@" >> "logs/$name.log" 2>&1; then
    touch "logs/.done_$name"
  else
    echo "r4q2 stage $name failed/timeout rc=$?" >> logs/round4_queue.log
  fi
}

for pass in 1 2; do
  stage step_profile 5400 python experiments/step_profile.py
  stage bench_canon 1800 env CETPU_BENCH_DTYPE=bfloat16 CETPU_BENCH_PRNG=rbg \
    python bench.py
  stage bench_xla_f32 1800 env CETPU_BENCH_PALLAS=0 python bench.py
done

wait_tpu
bash experiments/collect_artifacts.sh > logs/collect_r4.log 2>&1 || true
echo R4Q2DONE >> logs/round4_queue.log
