#!/bin/bash
# Round-3 sweeper: after queue6, retry ANY stage still missing its .done
# marker (up to 3 passes), then final collection. Stages resume from their
# checkpoints, so a retry continues rather than restarts.
cd /root/repo
while ! grep -q R3Q6DONE logs/round3_queue.log 2>/dev/null; do sleep 60; done

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
  echo "=== q7 stage $name $(date -u) ===" >> logs/round3_queue.log
  if timeout "$tmo" "$@" >> "logs/$name.log" 2>&1; then
    touch "logs/.done_$name"
  else
    echo "q7 stage $name failed/timeout rc=$?" >> logs/round3_queue.log
  fi
}

CAL5="--calibrated --ue-speed-kmh 5"
CAL3="--calibrated --ue-speed-kmh 3"
ROBUST="--log-every 226 --checkpoint-every 25 --resume"

for pass in 1 2 3; do
  for DF in 64 96 128 192 256; do
    stage r3c_dff$DF 7200 python experiments/train_informer.py \
      --epochs 150 --train-samples 16384 --d-ff $DF $CAL3 --lr 1e-3 --tag r3c $ROBUST
  done
  stage r3c_nodistil 7200 python experiments/train_informer.py \
    --epochs 150 --train-samples 16384 --no-distil $CAL3 --lr 1e-3 --tag r3c $ROBUST
  stage r3s_sl75 5400 python experiments/train_informer.py \
    --epochs 50 --train-samples 16384 --seq-len 75 $CAL5 --lr 1e-3 --tag r3s $ROBUST
  stage r3s_ll20 5400 python experiments/train_informer.py \
    --epochs 50 --train-samples 16384 --label-len 20 $CAL5 --lr 1e-3 --tag r3s $ROBUST
  stage r3s_prob 5400 python experiments/train_informer.py \
    --epochs 50 --train-samples 16384 --attn prob $CAL5 --lr 1e-3 --tag r3s $ROBUST
  stage r3pal 5400 python experiments/train_informer.py \
    --epochs 50 --train-samples 16384 --use-pallas $CAL5 --lr 1e-3 --tag r3pal $ROBUST
  stage int8_serving 2400 python experiments/int8_serving.py --calibrated --ue-speed-kmh 5
  stage scale_demo 4800 python experiments/scale_demo.py
  stage scale_demo_f32 3600 python experiments/scale_demo.py --dtype float32 --sizes large xl --out weights/scale_demo_f32.json
  stage perf_final 5400 python experiments/perf_study.py
  stage bench_final 1800 python bench.py
  stage bench_final_xla 1800 env CETPU_BENCH_PALLAS=0 python bench.py
done

wait_tpu
cp weights/scale_demo*.json experiments/artifacts/ 2>/dev/null
bash experiments/collect_artifacts.sh > logs/collect_r3g.log 2>&1 || true
echo R3Q7DONE >> logs/round3_queue.log
