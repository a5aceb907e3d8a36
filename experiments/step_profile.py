"""Flagship train-step breakdown: where the 10-13 ms go (VERDICT r3 §6).

The flagship step (InformerStack ei16/sl90/dm128/el[4,3]/dl3/df64, batch 256)
runs at ~3-7% MXU because its matmuls are tiny (DESIGN.md §8) — this driver
pins down *what* the time is, by measured ablation rather than speculation:

- canonical config (bf16 + BD Pallas attention + RBG keys) vs the f32/XLA
  baseline, and the round-4 ``fuse_qkv`` variant (Q/K/V as one matmul);
- forward+loss only vs full fwd+bwd+Adam (backward/optimizer share);
- component ablations: no-distil (removes the conv+BatchNorm pyramid),
  dropout=0 (removes mask generation), single-stack encoder;
- batch scaling 256/512/1024 at fixed per-sample work: if ms/step grows far
  sublinearly, the floor is per-step dispatch/latency, not bandwidth or
  FLOPs.

All timings use the value-fetch barrier (``block_until_ready`` returns early
on the tunneled axon runtime — see bench.py) and median-of-chunks to ride
out tunnel drift. Output: ``weights/step_profile.json``.
"""

from __future__ import annotations

import argparse
import dataclasses
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
    eval_chunk,
    train_chunk,
)

STEPS = 10


def measure(cfg: InformerConfig, *, batch: int, prng: str | None,
            chunks: int, fwd_only: bool = False) -> dict:
    h = jnp.asarray(
        np.random.default_rng(1).normal(size=(4096, 100, 16)), jnp.float32
    )
    tc = TrainConfig(batch_size=batch)
    model = build_informer(cfg)
    state = create_train_state(model, rng=jax.random.key(0), cfg=cfg, train_cfg=tc)
    kwargs = dict(
        batch_size=batch, label_len=cfg.label_len,
        seq_len=cfg.seq_len, pred_len=cfg.pred_len, snr_db=21.0,
    )
    key = jax.random.key(2, impl=prng) if prng else jax.random.key(2)

    times = []
    if fwd_only:
        for i in range(2):
            m = eval_chunk(state, h, jax.random.fold_in(key, i),
                           num_batches=STEPS, **kwargs)
            float(m["nmse"])
        for i in range(chunks):
            t0 = time.perf_counter()
            m = eval_chunk(state, h, jax.random.fold_in(key, 10 + i),
                           num_batches=STEPS, **kwargs)
            float(m["nmse"])
            times.append(time.perf_counter() - t0)
    else:
        for i in range(2):
            state, m = train_chunk(state, h, jax.random.fold_in(key, i),
                                   num_steps=STEPS, **kwargs)
        float(m["loss_sum"])
        for i in range(chunks):
            t0 = time.perf_counter()
            state, m = train_chunk(state, h, jax.random.fold_in(key, 10 + i),
                                   num_steps=STEPS, **kwargs)
            float(m["loss_sum"])
            times.append(time.perf_counter() - t0)
    ms = statistics.median(times) * 1000 / STEPS
    return {"ms_per_step": round(ms, 3),
            "samples_per_s": round(batch / (ms / 1000), 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chunks", type=int, default=7)
    p.add_argument("--out", default="weights/step_profile.json")
    args = p.parse_args()

    canon = InformerConfig(dtype="bfloat16", use_pallas=True)
    rows = {}

    def run(name, cfg, *, batch=256, prng="rbg", fwd_only=False):
        try:
            rows[name] = measure(cfg, batch=batch, prng=prng,
                                 chunks=args.chunks, fwd_only=fwd_only)
        except Exception as exc:  # noqa: BLE001
            rows[name] = {"error": str(exc)[:200]}
        print(json.dumps({name: rows[name]}), flush=True)

    run("canonical_bf16_bd_rbg", canon)
    run("canonical_fuse_qkv", dataclasses.replace(canon, fuse_qkv=True))
    run("baseline_f32_xla",
        InformerConfig(), prng=None)
    # ProbSparse rows (VERDICT r4 item 1): the flagship's alternate attention
    # mode, vs the reference's A100 prob baseline of 2,230 samples/s.
    run("prob_bf16_rbg", dataclasses.replace(canon, attn="prob"))
    run("prob_f32_xla",
        dataclasses.replace(InformerConfig(), attn="prob"), prng=None)
    run("fwd_only_canonical", canon, fwd_only=True)
    run("fwd_only_prob",
        dataclasses.replace(canon, attn="prob"), fwd_only=True)
    run("no_distil", dataclasses.replace(canon, distil=False))
    run("no_dropout", dataclasses.replace(canon, dropout=0.0))
    run("single_stack", dataclasses.replace(canon, e_layers=(4,)))
    run("batch_512", canon, batch=512)
    run("batch_1024", canon, batch=1024)
    run("batch_1024_fuse",
        dataclasses.replace(canon, fuse_qkv=True), batch=1024)

    base = rows.get("canonical_bf16_bd_rbg", {}).get("ms_per_step")
    summary = {"rows": rows, "steps_per_chunk": STEPS}
    if base:
        shares = {}
        for k in ("fwd_only_canonical", "no_distil", "no_dropout",
                  "single_stack", "canonical_fuse_qkv"):
            v = rows.get(k, {}).get("ms_per_step")
            if v:
                shares[k] = {"delta_ms": round(base - v, 3),
                             "delta_pct": round(100 * (base - v) / base, 1)}
        summary["vs_canonical"] = shares
        b1024 = rows.get("batch_1024", {}).get("ms_per_step")
        if b1024:
            summary["batch_scaling_note"] = (
                f"4x batch costs {round(b1024 / base, 2)}x time -> "
                f"{'latency-floor' if b1024 / base < 2.5 else 'compute'}-bound "
                "at batch 256"
            )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary.get("vs_canonical", {})))


if __name__ == "__main__":
    main()
