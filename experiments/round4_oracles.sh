#!/bin/bash
# Round-4 per-cluster AR-oracle bounds (CPU; runs concurrently with the TPU
# queue). One artifact per cluster, consumed by collect_results.Bounds.
cd /root/repo
mkdir -p weights logs
O() { # name, args...
  local name=$1; shift
  if [ -f "weights/ar_oracle_$name.json" ]; then return 0; fi
  echo "=== oracle $name $(date -u) ===" >> logs/round4_oracles.log
  timeout 7200 env JAX_PLATFORMS=cpu python experiments/ar_oracle.py \
    --out "weights/ar_oracle_$name.json" "$@" \
    >> logs/round4_oracles.log 2>&1 \
    || echo "oracle $name failed rc=$?" >> logs/round4_oracles.log
}

O cal_v5  --calibrated --ue-speed-kmh 5  --snr 12 14 16 18 20 21
O cal_v3  --calibrated --ue-speed-kmh 3  --snr 21
O cal_v30_sl90 --calibrated --ue-speed-kmh 30 --snr 21 --seq-len 90
O cal_v30_sl75 --calibrated --ue-speed-kmh 30 --snr 21 --seq-len 75
O cal_v30_sl50 --calibrated --ue-speed-kmh 30 --snr 21 --seq-len 50
O cal_v30_sl25 --calibrated --ue-speed-kmh 30 --snr 21 --seq-len 25 --order 18
O ss30 --slot-symbols 30 --snr 21
cp weights/ar_oracle_*.json experiments/artifacts/ 2>/dev/null
echo R4ORACLESDONE >> logs/round4_oracles.log
