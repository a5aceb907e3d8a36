"""Interleaved train-step variant A/B (tunnel-drift-robust).

The sequential variant loop in ``perf_study.train_step_dtype_ab`` times each
variant minutes apart; the axon tunnel's round-trip latency drifts on that
timescale, which can masquerade as a variant effect. This driver compiles
every variant first (persistent-cache hits), then times them interleaved
round-robin and reports per-variant medians — per-step differences survive,
drift cancels.

Writes weights/interleaved_ab.json.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from channelestimationtransformer_tpu.core.runtime import setup as _rt_setup
_rt_setup()
import jax.numpy as jnp
import numpy as np

from channelestimationtransformer_tpu.core.config import InformerConfig, TrainConfig
from channelestimationtransformer_tpu.models import build_informer
from channelestimationtransformer_tpu.train.trainer import (
    create_train_state,
    train_chunk,
)

VARIANTS = (
    "float32", "bfloat16", "float32+bd", "bfloat16+bd",
    "float32+bd+rbg", "bfloat16+bd+rbg",
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10, help="steps per chunk")
    p.add_argument("--rounds", type=int, default=8)
    p.add_argument("--variants", nargs="*", default=list(VARIANTS))
    p.add_argument("--out", default="weights/interleaved_ab.json")
    args = p.parse_args()

    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(size=(2048, 100, 16)), jnp.float32)
    tc = TrainConfig()

    runners = {}
    for variant in args.variants:
        tokens = variant.split("+")
        cfg = InformerConfig(dtype=tokens[0], use_pallas="bd" in tokens)
        impl = "rbg" if "rbg" in tokens else None
        model = build_informer(cfg)
        state = create_train_state(
            model, rng=jax.random.key(0), cfg=cfg, train_cfg=tc
        )
        kwargs = dict(
            num_steps=args.steps, batch_size=tc.batch_size,
            label_len=cfg.label_len, seq_len=cfg.seq_len,
            pred_len=cfg.pred_len, snr_db=21.0,
        )
        key = jax.random.key(2, impl=impl) if impl else jax.random.key(2)
        # compile + warm (donated state threads through)
        for i in range(2):
            state, m = train_chunk(state, h, jax.random.fold_in(key, i), **kwargs)
        float(m["loss_sum"])
        runners[variant] = {"state": state, "key": key, "kwargs": kwargs,
                            "times": []}
        print(f"compiled {variant}", flush=True)

    for r in range(args.rounds):
        for variant in args.variants:
            ru = runners[variant]
            t0 = time.perf_counter()
            ru["state"], m = train_chunk(
                ru["state"], h, jax.random.fold_in(ru["key"], 100 + r),
                **ru["kwargs"],
            )
            float(m["loss_sum"])  # value fetch = reliable barrier
            ru["times"].append((time.perf_counter() - t0) * 1000)
        print(f"round {r}: " + " ".join(
            f"{v}={runners[v]['times'][-1]:.1f}ms" for v in args.variants),
            flush=True)

    out = []
    for variant in args.variants:
        ts = runners[variant]["times"]
        med = statistics.median(ts)
        out.append({
            "variant": variant, "steps_per_chunk": args.steps,
            "median_ms_per_batch": round(med / args.steps, 4),
            "all_chunk_ms": [round(t, 2) for t in ts],
            "samples_per_s": round(
                tc.batch_size * args.steps / (med / 1000), 1),
        })
        print(json.dumps({k: v for k, v in out[-1].items()
                          if k != "all_chunk_ms"}), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
