"""Inference latency harness.

Reference: ``TimingAnalysis/TrainInformer.py:91-151``: CUDA events around the
forward pass, 20 warmup + 1000 timed reps, mean/std ms, swept over
e_layers/d_layers/n_heads/d_ff/d_model/seq_len/pred_len/label_len
(``:226-264``) -> ``runtime2.pickle``.

TPU equivalent: ``block_until_ready`` walls around the jitted forward; compile
excluded by warmup. Produces the same sweep matrix as JSON + pickle.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

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


def measure(cfg: InformerConfig, batch: int, warmup: int, reps: int):
    model = build_informer(cfg)
    x_enc = jnp.zeros((batch, cfg.seq_len, cfg.enc_in))
    x_dec = jnp.zeros((batch, cfg.dec_len, cfg.dec_in))
    variables = model.init(jax.random.key(0), x_enc, x_dec)
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b))

    for _ in range(warmup):
        jax.block_until_ready(fwd(variables, x_enc, x_dec))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(variables, x_enc, x_dec))
        times.append((time.perf_counter() - t0) * 1000)
    return float(np.mean(times)), float(np.std(times))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--warmup", type=int, default=20)
    p.add_argument("--reps", type=int, default=100)
    p.add_argument("--params", nargs="+", default=list(DEFAULT_SWEEP),
                   help="which sweep axes to run")
    p.add_argument("--out", default="weights/runtime.json")
    args = p.parse_args()

    results = {}
    for pname in args.params:
        for value in DEFAULT_SWEEP[pname]:
            overrides = dict(BASE)
            overrides[pname] = value
            cfg = InformerConfig(**overrides)
            mean_ms, std_ms = measure(cfg, args.batch, args.warmup, args.reps)
            key = f"{pname}={value}"
            results[key] = {"mean_ms": mean_ms, "std_ms": std_ms,
                            "samples_per_s": args.batch / (mean_ms / 1000)}
            print(f"{key}: {mean_ms:.3f} +- {std_ms:.3f} ms "
                  f"({results[key]['samples_per_s']:.0f} samples/s)", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    with open(args.out.replace(".json", ".pickle"), "wb") as f:
        pickle.dump(results, f)
    print(json.dumps({"sweep": "timing", "entries": len(results)}))


if __name__ == "__main__":
    main()
