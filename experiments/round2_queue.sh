#!/bin/bash
# Round-2 main TPU queue: quant studies, pruning, comparison, e2e, timing,
# perf, bench — run after the sweep queue (SWEEPSDONE marker). Each stage is
# independent (|| true) and logged under logs/.
cd /root/repo
while ! grep -q SWEEPSDONE logs/sweep_queue.log 2>/dev/null; do sleep 30; done
CK21="weights/tmodel_ei_16_di_16_co_16_sl_90_ll_10_pl_5_f_5_dm_128_nh_8_el_[4, 3]_dl_3_df_64_do_0.05_at_full_em_fixed_ac_gelu_21_cal_v5_r2cos_50.msgpack"
CAL="--calibrated --ue-speed-kmh 5"

timeout 4000 python experiments/train_lsq.py --checkpoint "$CK21" --nbits-min 8 --nbits-max 11 \
  --epochs 100 $CAL --snr 21 --train-samples 16384 > logs/lsq_sweep.log 2>&1 || true
timeout 4000 python experiments/train_lsq.py --checkpoint "$CK21" --nbits-min 8 --nbits-max 11 \
  --epochs 100 $CAL --snr 21 --train-samples 16384 --fibbinary > logs/lsq_fib_sweep.log 2>&1 || true

for r in stochastic distant; do
  timeout 2400 python experiments/qat_incremental.py --checkpoint "$CK21" --rounding $r \
    $CAL --train-samples 16384 > logs/qat_${r}.log 2>&1 || true
done
for r in proximal stochastic distant; do
  timeout 2400 python experiments/qat_incremental.py --checkpoint "$CK21" --rounding $r \
    --codebook fibonacci $CAL --train-samples 16384 > logs/qat_fib_${r}.log 2>&1 || true
done

timeout 2400 python experiments/prune.py --checkpoint "$CK21" --target-sparsity 0.9 \
  --epochs 50 $CAL --train-samples 16384 > logs/prune_run.log 2>&1 || true

timeout 5400 python experiments/comparison.py $CAL --epochs 50 --train-samples 8192 \
  > logs/comparison_cal.log 2>&1 || true

timeout 1200 python experiments/end_to_end_sim.py --checkpoint "$CK21" $CAL \
  --out weights/e2e_results.json > logs/e2e_uncoded.log 2>&1 || true
timeout 1800 python experiments/end_to_end_sim.py --checkpoint "$CK21" $CAL --coded --fec conv \
  --out weights/e2e_coded_conv.json > logs/e2e_conv.log 2>&1 || true
timeout 2400 python experiments/end_to_end_sim.py --checkpoint "$CK21" $CAL --coded --fec ldpc \
  --out weights/e2e_coded_ldpc.json > logs/e2e_ldpc.log 2>&1 || true
timeout 1200 python experiments/end_to_end_sim.py --checkpoint "$CK21" $CAL --csi ls \
  --out weights/e2e_ls.json > logs/e2e_ls.log 2>&1 || true
timeout 1200 python experiments/end_to_end_sim.py --checkpoint "$CK21" $CAL --domain time \
  --out weights/e2e_time.json > logs/e2e_time.log 2>&1 || true

timeout 3600 python experiments/timing_analysis.py --out weights/runtime.json > logs/timing.log 2>&1 || true
timeout 3600 python experiments/perf_study.py > logs/perf_study2.log 2>&1 || true
timeout 1200 python bench.py > logs/bench_r2.log 2>&1 || true
echo MAINQDONE
