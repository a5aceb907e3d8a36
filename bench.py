"""Benchmark: training throughput of the flagship InformerStack on TPU.

Measures the fully fused jitted train step (window sampling + AWGN + fwd/bwd +
Adam) at the reference FullPrecision configuration (batch 256, seq_len 90,
d_model 128, e_layers [4,3], d_layers 3, full attention, distil on) and prints
one JSON line. Baseline: the reference's A100 training throughput of
~3,370 samples/s (76 ms/batch of 256; BASELINE.md).
"""

import json
import statistics
import time

import jax

from channelestimationtransformer_tpu.core.runtime import setup as _rt_setup
_rt_setup()
import jax.numpy as jnp
import numpy as np


def main():
    from channelestimationtransformer_tpu.core.config import (
        InformerConfig,
        TrainConfig,
    )
    from channelestimationtransformer_tpu.models import build_informer
    from channelestimationtransformer_tpu.train.trainer import (
        create_train_state,
        train_chunk,
    )

    import os

    # The fused block-diagonal Pallas attention path is the default: measured
    # +25% over the XLA einsum path at the flagship config (25.9k vs 20.7k
    # samples/s, logs/bench_r3_*.log; numerics verified by bd_check on
    # hardware and the exactness test suite). CETPU_BENCH_PALLAS=0 reverts
    # to the pure-XLA path.
    use_pallas = os.environ.get("CETPU_BENCH_PALLAS", "1") == "1"
    # Activation dtype + PRNG impl knobs: bfloat16 activations halve HBM
    # traffic on the latency-bound step, and rbg keys replace the threefry
    # ALU ladder with the TPU hardware generator for the ~20M randoms/step
    # (sampling + AWGN + dropout). bf16+rbg is the canonical default since
    # the identical-recipe 150-epoch training A/B measured it quality-equal
    # (-0.09 dB, i.e. slightly better; experiments/artifacts/canon_ab.json).
    dtype = os.environ.get("CETPU_BENCH_DTYPE", "bfloat16")
    prng = os.environ.get("CETPU_BENCH_PRNG", "rbg")
    cfg = InformerConfig(use_pallas=use_pallas, dtype=dtype)  # reference FullPrecision effective config
    tc = TrainConfig()
    model = build_informer(cfg)
    state = create_train_state(model, rng=jax.random.key(0), cfg=cfg, train_cfg=tc)

    rng = np.random.default_rng(0)
    # Same dataset scale as the real pretrain runs (65536 samples resident in
    # HBM) so the measurement reflects production training, not a toy gather.
    n, slots = 65536, 100
    h = jnp.asarray(rng.normal(size=(n, slots, 16)).astype(np.float32))

    kwargs = dict(
        batch_size=tc.batch_size,
        label_len=cfg.label_len,
        seq_len=cfg.seq_len,
        pred_len=cfg.pred_len,
        snr_db=21.0,
    )

    # Warmup / compile (two chunks: the first compiles, the second warms the
    # donated-state steady path).
    key = jax.random.key(1, impl=prng)
    steps = 28  # quarter-epoch chunks, timed individually for a median
    for i in range(2):
        state, m = train_chunk(
            state, h, jax.random.fold_in(key, 1000 + i), num_steps=steps, **kwargs
        )
    float(m["loss_sum"])

    # Median over many independently-timed chunks instead of a mean over few:
    # the axon tunnel's round-trip latency drifts on minute timescales
    # (BENCH.md r02 post-mortem; experiments/interleaved_ab.py), and a mean is
    # polluted by any one slow chunk. 12 x 28-step chunks = 3,072 samples per
    # timing point, median-of-12 is robust to drift spikes in either tail.
    times = []
    for i in range(12):
        t0 = time.perf_counter()
        state, m = train_chunk(
            state, h, jax.random.fold_in(key, i), num_steps=steps, **kwargs
        )
        # Force completion: on the axon tunnel runtime block_until_ready
        # returns BEFORE execution finishes (verified: it inflates throughput
        # 50-150x); fetching the value is the only reliable barrier.
        float(m["loss_sum"])
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)

    samples_per_s = steps * tc.batch_size / dt
    baseline = 3370.0  # A100 80GB, reference FullPrecision/Figures/SNR.txt
    print(
        json.dumps(
            {
                "metric": "train_samples_per_sec",
                "value": round(samples_per_s, 1),
                "unit": "samples/s",
                "vs_baseline": round(samples_per_s / baseline, 3),
                # Self-describing knobs so historical BENCH_r0N.json artifacts
                # stay comparable when defaults move (ADVICE r4).
                "dtype": dtype,
                "prng": prng,
                "use_pallas": use_pallas,
                "method": "median_of_12x28step_chunks",
                "chunk_ms_spread": [round(t * 1000, 1) for t in sorted(times)],
            }
        )
    )


if __name__ == "__main__":
    main()
