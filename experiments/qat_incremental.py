"""Incremental (progressive) quantization-aware training.

Reference: ``QuantizationStudy/QuantizationAwareTraining/QuantizationAwareTraining.py``
(+ the Fibonacci variant ``…Fibonacci/ParallelExecution.py``): wl=2, fl=-2;
a per-rounding fraction schedule (``:369-379``); at each fraction, train 10
epochs where every optimizer step is followed by partial weight quantization
at that fraction (``OptimLP.step(percentage)``); ``--weight-quant-setting
full`` quantizes everything every step for 70 epochs.

Here the post-step weight transform happens inside the jitted QAT train step
(on-device threshold; the reference round-trips weights to host every step,
SURVEY §7.4 quirk 7).
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
from channelestimationtransformer_tpu.ops.quant import (
    apply_weight_quant,
    fibonacci_quantize_partial,
    fixed_point_quantize,
    fixed_point_quantize_partial,
)
from channelestimationtransformer_tpu.ops.quant.settings import (
    build_weight_quant_settings,
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

# Reference fraction schedules (QuantizationAwareTraining.py:369-379).
SCHEDULES = {
    "proximal": [0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.85, 0.9, 0.95, 0.98, 0.99,
                 0.995, 0.998, 0.999, 0.9995, 0.9998, 0.9999, 1.0],
    "stochastic": [0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45, 0.5,
                   0.55, 0.60, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95, 1.0],
    "distant": [0.001, 0.0025, 0.005, 0.01, 0.025, 0.05, 0.1, 0.15, 0.2, 0.25,
                0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None, help="pretrained FP32 checkpoint")
    p.add_argument("--wl", type=int, default=2)
    p.add_argument("--fl", type=int, default=None, help="default wl-4")
    p.add_argument("--rounding", choices=["proximal", "stochastic", "distant"],
                   default="proximal")
    p.add_argument("--setting", choices=["partial", "full"], default="partial")
    p.add_argument("--codebook", choices=["fixed", "fibonacci"], default="fixed")
    p.add_argument("--snr", type=float, default=21.0)
    p.add_argument("--epochs-per-step", type=int, default=10)
    p.add_argument("--steps-per-epoch", type=int, default=226)
    p.add_argument("--train-samples", type=int, default=8192)
    add_channel_args(p)
    p.add_argument("--out", default="weights")
    args = p.parse_args()
    fl = args.fl if args.fl is not None else args.wl - 4

    cfg = InformerConfig()
    tc = TrainConfig(lr=1e-4)
    model = build_informer(cfg)
    state = create_train_state(model, rng=jax.random.key(0), cfg=cfg, train_cfg=tc)
    if args.checkpoint:
        state, _, _ = load_checkpoint(args.checkpoint, state)
        # Fresh optimizer/schedule for the new phase (the restored opt_state
        # carries the pretrain run's schedule step count).
        state = state.replace(step=0, opt_state=state.tx.init(state.params))
        print(f"Preloaded {args.checkpoint}")

    if args.setting == "partial":
        if args.codebook == "fibonacci":
            qfn = lambda w, pct, key: fibonacci_quantize_partial(
                w, args.wl, fl, pct, rounding=args.rounding, key=key
            )
        else:
            qfn = lambda w, pct, key: fixed_point_quantize_partial(
                w, pct, args.wl, fl, rounding=args.rounding, key=key
            )
        schedule = SCHEDULES[args.rounding]
        epochs_per_step = args.epochs_per_step
    else:
        qfn = lambda w, pct, key: fixed_point_quantize(
            w, args.wl, fl,
            rounding="stochastic" if args.rounding == "stochastic" else "nearest",
            key=key,
        )
        schedule = [1.0]
        epochs_per_step = 70

    settings = build_weight_quant_settings(state.params, qfn)
    print(f"Quantizing {len(settings)} weight tensors; wl={args.wl} fl={fl} "
          f"{args.rounding}/{args.setting}/{args.codebook}")

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

    # A whole epoch of (train step -> post-step weight quantization) runs as
    # ONE scanned program per dispatch — per-step dispatch (~45 ms tunnel
    # RTT) made the schedule dispatch-bound (226x overhead per epoch). pct
    # is a TRACED scalar (the partial quantizers' edge guards are lax
    # selects), so the whole 18-fraction schedule reuses one compilation.
    @partial(jax.jit, donate_argnums=(0,), static_argnames=("num_steps",))
    def qat_epoch(state, h, rng, pct, num_steps):
        def body(carry, step_key):
            st = carry
            k1, k2 = jax.random.split(step_key)
            st, metrics = train_step_impl(st, h, k1, **kw)
            st = st.replace(
                params=apply_weight_quant(
                    st.params, settings, percentage=pct, key=k2
                )
            )
            return st, metrics["loss"] if "loss" in metrics else 0.0

        keys = jax.random.split(rng, num_steps)
        state, _ = jax.lax.scan(body, state, keys)
        return state

    results = []
    rng = jax.random.key(3)
    for pct in schedule:
        for epoch in range(epochs_per_step):
            rng, sub = jax.random.split(rng)
            state = qat_epoch(state, train_ds.h, sub, jnp.float32(pct),
                              args.steps_per_epoch)
        split = np.zeros(cfg.pred_len)
        nm = 0.0
        for i in range(8):
            m = eval_step(state, val_ds.h, jax.random.fold_in(rng, i), **kw)
            split += np.asarray(m["split"]); nm += float(m["nmse"])
        results.append({"fraction": pct, "val_nmse": nm / 8,
                        "val_split": (split / 8).tolist()})
        print(f"| fraction {pct} | valid nmse {nm / 8:.4f}", flush=True)

    tag = f"wl{args.wl}_fl{fl}_{args.rounding}_{args.setting}_{args.codebook}"
    os.makedirs(args.out, exist_ok=True)
    save_checkpoint(state, args.out, f"qat_{tag}_", len(schedule))
    with open(os.path.join(args.out, f"qat_{tag}.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"sweep": "qat", "tag": tag, "final": results[-1]}))


if __name__ == "__main__":
    main()
