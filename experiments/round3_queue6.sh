#!/bin/bash
# Round-3 final measurement pass: re-measure kernels/bench with the final
# (pad-hoisted) BD kernel, then collect everything.
cd /root/repo
while ! grep -q R3Q5DONE logs/round3_queue.log 2>/dev/null; do sleep 60; done

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
  echo "=== q6 stage $name $(date -u) ===" >> logs/round3_queue.log
  if timeout "$tmo" "$@" >> "logs/$name.log" 2>&1; then
    touch "logs/.done_$name"
  else
    echo "q6 stage $name failed/timeout rc=$?" >> logs/round3_queue.log
  fi
}

stage perf_final 5400 python experiments/perf_study.py
stage bench_final 1800 python bench.py
stage bench_final_xla 1800 env CETPU_BENCH_PALLAS=0 python bench.py

wait_tpu
cp weights/scale_demo*.json experiments/artifacts/ 2>/dev/null
bash experiments/collect_artifacts.sh > logs/collect_r3f.log 2>&1 || true
echo R3Q6DONE >> logs/round3_queue.log
