"""Structured-pruning experiment — the Pruning(WIP) study, completed.

Reference: ``Pruning(WIP)/prune.py:132-314``: neural_compressor snip_momentum
pruning with a 4x1 block pattern to 90% sparsity, gradual schedule woven into
the FP32 training loop via pruner callbacks.

Here: the same gradual cubic schedule drives a pure-function pruning mask
applied after each optimizer step inside the jitted loop.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from channelestimationtransformer_tpu.core.runtime import setup as _rt_setup
_rt_setup()
import numpy as np

from channelestimationtransformer_tpu.channel.cdl import (
    add_channel_args,
    cdl_from_args,
)
from channelestimationtransformer_tpu.channel.dataset import make_window_dataset
from channelestimationtransformer_tpu.core.config import InformerConfig, TrainConfig
from channelestimationtransformer_tpu.models import build_informer
from channelestimationtransformer_tpu.ops.prune import (
    apply_pruning,
    cubic_sparsity_schedule,
    measured_sparsity,
)
from channelestimationtransformer_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)
from channelestimationtransformer_tpu.train.trainer import (
    create_train_state,
    eval_step,
    train_step_impl,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--target-sparsity", type=float, default=0.9)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--steps-per-epoch", type=int, default=226)
    p.add_argument("--snr", type=float, default=21.0)
    p.add_argument("--train-samples", type=int, default=8192)
    add_channel_args(p)
    p.add_argument("--out", default="weights")
    args = p.parse_args()

    cfg = InformerConfig()
    tc = TrainConfig(lr=1e-4, num_epochs=args.epochs,
                     steps_per_epoch=args.steps_per_epoch)
    model = build_informer(cfg)
    state = create_train_state(model, rng=jax.random.key(0), cfg=cfg, train_cfg=tc)
    if args.checkpoint:
        state, _, _ = load_checkpoint(args.checkpoint, state)
        state = state.replace(step=0, opt_state=state.tx.init(state.params))
        print(f"Preloaded {args.checkpoint}", flush=True)

    train_ds = make_window_dataset(
        jax.random.key(100), model=cdl_from_args(args), num_samples=args.train_samples,
        num_slots=100, seq_len=cfg.seq_len, pred_len=cfg.pred_len, snr_db=args.snr,
    )
    val_ds = make_window_dataset(
        jax.random.key(101), model=cdl_from_args(args), num_samples=2048,
        num_slots=100, seq_len=cfg.seq_len, pred_len=cfg.pred_len, snr_db=args.snr,
    )
    kw = dict(batch_size=tc.batch_size, label_len=cfg.label_len,
              seq_len=cfg.seq_len, pred_len=cfg.pred_len, snr_db=args.snr)

    # One scanned program for a whole epoch of (train step -> re-prune), with
    # the ramp's sparsity as a TRACED scalar: per-step dispatch plus one
    # recompile per sparsity level made the ramp compile/dispatch-bound.
    @partial(jax.jit, donate_argnums=(0,), static_argnames=("num_steps",))
    def prune_epoch(state, h, rng, sparsity, num_steps):
        def body(st, step_key):
            st, metrics = train_step_impl(st, h, step_key, **kw)
            st = st.replace(params=apply_pruning(st.params, sparsity))
            return st, metrics["loss"]

        keys = jax.random.split(rng, num_steps)
        state, _ = jax.lax.scan(body, state, keys)
        return state

    total_steps = args.epochs * args.steps_per_epoch
    rng = jax.random.key(9)
    results = []
    for epoch in range(args.epochs):
        # One sparsity level per epoch along the cubic ramp over the first
        # 60% of training.
        sparsity = round(cubic_sparsity_schedule(
            epoch * args.steps_per_epoch, target=args.target_sparsity,
            start_step=0, end_step=int(total_steps * 0.6),
        ), 4)
        rng, sub = jax.random.split(rng)
        state = prune_epoch(state, train_ds.h, sub, jnp.float32(sparsity),
                            args.steps_per_epoch)
        split = np.zeros(cfg.pred_len)
        nm = 0.0
        for i in range(4):
            m = eval_step(state, val_ds.h, jax.random.fold_in(rng, i), **kw)
            split += np.asarray(m["split"]); nm += float(m["nmse"])
        actual = measured_sparsity(jax.device_get(state.params))
        results.append({"epoch": epoch, "sparsity": sparsity,
                        "measured_sparsity": actual, "val_nmse": nm / 4})
        print(f"| epoch {epoch:3d} | sparsity {sparsity:.3f} "
              f"(measured {actual:.3f}) | valid nmse {nm / 4:.4f}", flush=True)

    os.makedirs(args.out, exist_ok=True)
    save_checkpoint(state, args.out, "pruned_", args.epochs)
    with open(os.path.join(args.out, "prune_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"sweep": "prune", "final": results[-1]}))


if __name__ == "__main__":
    main()
