"""Inference latency harness.

Reference: ``TimingAnalysis/TrainInformer.py:91-151``: CUDA events around the
forward pass, 20 warmup + 1000 timed reps, mean/std ms, swept over
e_layers/d_layers/n_heads/d_ff/d_model/seq_len/pred_len/label_len
(``:226-264``) -> ``runtime2.pickle``.

TPU equivalent: scan-amortized on-device latency via
``utils.profiling.time_fn_amortized`` — ``inner`` data-dependent forwards
chained in one compiled program, timed through the value-fetch barrier
(``block_until_ready`` returns early on this runtime and per-rep dispatch RTT
swamps millisecond kernels; the round-1 artifact showed the symptoms: std >
mean, non-monotone seq_len). Compile excluded by warmup. Produces the same
sweep matrix as JSON + pickle, plus batch/seq monotonicity sanity checks.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from channelestimationtransformer_tpu.core.runtime import setup as _rt_setup
_rt_setup()
import jax.numpy as jnp
import numpy as np

from channelestimationtransformer_tpu.core.config import InformerConfig
from channelestimationtransformer_tpu.models import build_informer

DEFAULT_SWEEP = {
    "e_layers": [(2, 1), (3, 2), (4, 3)],
    "d_layers": [1, 2, 3],
    "n_heads": [4, 8, 16],
    "d_ff": [32, 64, 128, 256],
    "d_model": [64, 128, 256],
    "seq_len": [25, 50, 75, 90],
    "pred_len": [1, 5, 10],
    "label_len": [5, 10, 20],
}

BASE = dict(seq_len=90, label_len=10, pred_len=5, d_model=128, n_heads=8,
            e_layers=(4, 3), d_layers=3, d_ff=64)


def measure(cfg: InformerConfig, batch: int, warmup: int, reps: int,
            inner: int = 20):
    from channelestimationtransformer_tpu.utils.profiling import (
        time_fn_amortized,
    )

    model = build_informer(cfg)
    x_enc = jnp.zeros((batch, cfg.seq_len, cfg.enc_in))
    x_dec = jnp.zeros((batch, cfg.dec_len, cfg.dec_in))
    variables = model.init(jax.random.key(0), x_enc, x_dec)

    # x_enc is the scan carry (perturbed per iteration for the dependency
    # chain); variables/x_dec are closed over.
    def fwd(a, v, b):
        return model.apply(v, a, b)

    return time_fn_amortized(
        fwd, x_enc, variables, x_dec, inner=inner, warmup=3, reps=reps
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--reps", type=int, default=10,
                   help="outer timing reps (each runs --inner chained fwds)")
    p.add_argument("--inner", type=int, default=20,
                   help="chained forwards per compiled program")
    p.add_argument("--params", nargs="+",
                   default=list(DEFAULT_SWEEP) + ["batch"],
                   help="which sweep axes to run")
    p.add_argument("--out", default="weights/runtime.json")
    args = p.parse_args()

    results = {}
    for pname in args.params:
        values = [64, 128, 256] if pname == "batch" else DEFAULT_SWEEP[pname]
        for value in values:
            overrides = dict(BASE)
            batch = args.batch
            if pname == "batch":
                batch = value
            else:
                overrides[pname] = value
            cfg = InformerConfig(**overrides)
            mean_ms, std_ms = measure(cfg, batch, 3, args.reps, args.inner)
            key = f"{pname}={value}"
            results[key] = {"mean_ms": mean_ms, "std_ms": std_ms,
                            "samples_per_s": batch / (mean_ms / 1000)}
            print(f"{key}: {mean_ms:.3f} +- {std_ms:.3f} ms "
                  f"({results[key]['samples_per_s']:.0f} samples/s)", flush=True)

    # Sanity: on-device latency must grow with work. A violation means the
    # measurement is broken (the round-1 block_until_ready artifact), not
    # that a bigger model is faster.
    checks = {"seq_len": DEFAULT_SWEEP["seq_len"], "batch": [64, 128, 256]}
    sane = True
    for axis, vals in checks.items():
        series = [results[f"{axis}={v}"]["mean_ms"]
                  for v in vals if f"{axis}={v}" in results]
        # Allow 5% jitter between adjacent points.
        for a, b in zip(series, series[1:]):
            if b < a * 0.95:
                sane = False
                print(f"MONOTONICITY VIOLATION on {axis}: {series}")
    results["_monotonic"] = sane

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    with open(args.out.replace(".json", ".pickle"), "wb") as f:
        pickle.dump(results, f)
    print(json.dumps({"sweep": "timing", "entries": len(results),
                      "monotonic": sane}))


if __name__ == "__main__":
    main()
