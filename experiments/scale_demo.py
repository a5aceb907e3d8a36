"""Scale demo: throughput + MXU utilization at production model sizes.

The reference's architecture is tiny (d_model 128, d_ff 64) — at that scale
the train step is latency-bound and utilization numbers say nothing. This
driver scales the same InformerStack program up (d_model/d_ff/seq_len) and
reports, per size: fused-train-step ms, samples/s, model FLOPs from XLA's
``cost_analysis``, and the achieved fraction of the chip's peak — evidence
that the framework's single program rides the MXU when the FLOPs are there
(DESIGN.md §8), instead of being tuned only for the reference's toy dims.

Writes weights/scale_demo.json.
"""

from __future__ import annotations

import argparse
import json
import os
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

# v5e peak: 394 TFLOP/s int8, 197 bf16; f32 via MXU input rounding runs at
# the bf16 rate per pass.
PEAK_FLOPS = {"bfloat16": 197e12, "float32": 197e12}

SIZES = [
    # (name, d_model, d_ff, seq_len, batch)
    ("reference", 128, 64, 90, 256),
    ("medium", 256, 1024, 128, 256),
    ("large", 512, 2048, 256, 128),
    ("xl", 1024, 4096, 256, 64),
    # same models at batches that amortize per-step fixed costs (HBM allows
    # it easily; the reference's batch=256 convention is a toy-size choice)
    ("large_b512", 512, 2048, 256, 512),
    ("xl_b256", 1024, 4096, 256, 256),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--chunks", type=int, default=3)
    p.add_argument("--sizes", nargs="*", default=None,
                   help="subset of config names to run")
    p.add_argument("--out", default="weights/scale_demo.json")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    rows = []
    sizes = [r for r in SIZES if args.sizes is None or r[0] in args.sizes]
    for name, d_model, d_ff, seq_len, batch in sizes:
        try:
            cfg = InformerConfig(
                d_model=d_model, d_ff=d_ff, seq_len=seq_len,
                dtype=args.dtype,
            )
            tc = TrainConfig(batch_size=batch)
            model = build_informer(cfg)
            state = create_train_state(
                model, rng=jax.random.key(0), cfg=cfg, train_cfg=tc
            )
            n_params = sum(
                int(np.prod(v.shape)) for v in jax.tree_util.tree_leaves(state.params)
            )
            h = jnp.asarray(
                rng.normal(size=(4096, seq_len + 10, 16)).astype(np.float32)
            )
            kwargs = dict(
                num_steps=args.steps, batch_size=batch, label_len=cfg.label_len,
                seq_len=cfg.seq_len, pred_len=cfg.pred_len, snr_db=21.0,
            )

            # FLOPs of one fused step from the compiled executable. Lower a
            # num_steps=1 chunk: XLA:TPU's cost_analysis counts a while-loop
            # (lax.scan) body ONCE, ignoring the trip count — lowering the
            # measured num_steps>1 chunk and dividing by num_steps therefore
            # under-reports FLOPs by exactly num_steps (verified: the same
            # xl program reports 483 GF on the TPU backend at num_steps=10
            # vs 4,833 GF on XLA:CPU at num_steps=1). A 1-step chunk is the
            # unambiguous per-step count on both backends.
            kwargs1 = dict(kwargs, num_steps=1)
            lowered = jax.jit(
                lambda s, hh, k: train_chunk(s, hh, k, **kwargs1),
            ).lower(state, h, jax.random.key(1))
            cost = lowered.compile().cost_analysis()
            flops_step_xla = float(cost.get("flops", 0.0)) if cost else 0.0

            key = jax.random.key(2)
            state, m = train_chunk(state, h, key, **kwargs)  # compile+warm
            float(m["loss_sum"])
            t0 = time.perf_counter()
            for i in range(args.chunks):
                state, m = train_chunk(
                    state, h, jax.random.fold_in(key, i), **kwargs
                )
                float(m["loss_sum"])  # fetch = the reliable barrier here
            dt = (time.perf_counter() - t0) / args.chunks
            ms_step = dt * 1000 / args.steps
            flops_step = flops_step_xla
            achieved = flops_step / (ms_step / 1e3)
            row = {
                "config": name, "d_model": d_model, "d_ff": d_ff,
                "seq_len": seq_len, "batch": batch, "params": n_params,
                "dtype": args.dtype,
                "ms_per_step": round(ms_step, 3),
                "samples_per_s": round(batch / (ms_step / 1e3), 1),
                "gflops_per_step": round(flops_step / 1e9, 2),
                "achieved_tflops": round(achieved / 1e12, 2),
                "mxu_fraction": round(achieved / PEAK_FLOPS[args.dtype], 4),
            }
        except Exception as exc:  # noqa: BLE001 — transient tunnel failures
            row = {"config": name, "error": str(exc)[:200]}
        print(json.dumps(row), flush=True)
        rows.append(row)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
