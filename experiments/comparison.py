"""Model-family comparison: RNN / GRU / LSTM / Transformer / Informer.

Reference: ``ComparisonLSTMvsRNNvsGRUvsTransformer/trainingScripts/Train*.py``:
train each family on the same dataset (RNN-family as teacher-forced denoisers,
loss on the last 10 slots of ``H_noise -> H``; transformers seq-to-seq), then
sweep evaluation SNR 12..21 dB; per-model per-horizon NMSE via closed-loop
rollout for the recurrent nets. Results -> ``loss_<model>.pkl``-equivalent
JSON (+ pickle for reference-tooling compatibility).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from channelestimationtransformer_tpu.core.runtime import setup as _rt_setup
_rt_setup()
import jax.numpy as jnp
import numpy as np
import optax

from channelestimationtransformer_tpu.channel.cdl import (
    add_channel_args,
    cdl_from_args,
)
from channelestimationtransformer_tpu.channel.dataset import make_window_dataset
from channelestimationtransformer_tpu.core.config import (
    InformerConfig,
    RecurrentConfig,
    TrainConfig,
    TransformerConfig,
)
from channelestimationtransformer_tpu.core.metrics import nmse, nmse_split
from channelestimationtransformer_tpu.data.windows import sample_windows
from channelestimationtransformer_tpu.models import build_informer
from channelestimationtransformer_tpu.models.recurrent import RecurrentPredictor
from channelestimationtransformer_tpu.models.transformer import Transformer
from channelestimationtransformer_tpu.train.trainer import Trainer


def train_recurrent(cell, train_ds, val_ds, cfg, steps, lr=1e-3, seed=0):
    """Teacher-forced denoiser training (reference ``TrainLSTM.py``: loss on
    the last 10 slots of the one-step-ahead output vs the clean channel)."""
    rcfg = RecurrentConfig(features=16, input_size=128, hidden_size=256,
                           num_layers=2, cell=cell)
    model = RecurrentPredictor(config=rcfg)
    x0 = jnp.zeros((2, cfg.seq_len, 16))
    params = model.init(jax.random.key(seed), x0)["params"]
    tx = optax.adam(lr)
    opt = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt, rng):
        clean, noisy, _, _ = sample_windows(rng, train_ds, 64)

        def loss_fn(p):
            # Teacher-forced one-step-ahead output aligned with the input
            # (out[t] estimates slot t from slots <t); denoising loss on the
            # last 10 slots, reference TrainLSTM semantics.
            out = model.apply({"params": p}, noisy)
            return nmse(out[:, -10:], clean[:, -10:])

        l, g = jax.value_and_grad(loss_fn)(params)
        upd, opt2 = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt2, l

    rng = jax.random.key(seed + 1)
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        params, opt, l = step(params, opt, sub)
    return model, params


@partial(jax.jit, static_argnames=("model", "pred_len", "batch", "seq_len"))
def eval_recurrent(params, model, ds_h, rng, pred_len, batch, seq_len, snr_db):
    from channelestimationtransformer_tpu.data.windows import WindowDataset

    ds = WindowDataset(h=ds_h, seq_len=seq_len, pred_len=pred_len, snr_db=snr_db)
    _, _, noisy, clean = sample_windows(rng, ds, batch)
    preds = model.apply({"params": params}, noisy, pred_len,
                        method=RecurrentPredictor.rollout)
    return nmse_split(preds, clean)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train-snr", type=float, default=21.0)
    p.add_argument("--snr-sweep", type=float, nargs="+",
                   default=[12, 13, 14, 15, 16, 17, 18, 19, 20, 21])
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--train-samples", type=int, default=4096)
    add_channel_args(p)
    p.add_argument("--models", nargs="+",
                   default=["rnn", "gru", "lstm", "transformer", "informer"])
    p.add_argument("--out", default="weights/comparison")
    args = p.parse_args()

    cfg = InformerConfig(seq_len=25, label_len=10, pred_len=5)
    train_ds = make_window_dataset(
        jax.random.key(0), model=cdl_from_args(args), num_samples=args.train_samples,
        num_slots=100, seq_len=cfg.seq_len, pred_len=cfg.pred_len,
        snr_db=args.train_snr,
    )
    val_ds = make_window_dataset(
        jax.random.key(1), model=cdl_from_args(args), num_samples=1024,
        num_slots=100, seq_len=cfg.seq_len, pred_len=cfg.pred_len,
        snr_db=args.train_snr,
    )

    os.makedirs(args.out, exist_ok=True)
    results = {}

    for name in args.models:
        print(f"=== {name} ===", flush=True)
        if name in ("rnn", "gru", "lstm"):
            model, params = train_recurrent(
                name, train_ds, val_ds, cfg, args.steps
            )
            sweep = {}
            for snr in args.snr_sweep:
                split = np.zeros(cfg.pred_len)
                for i in range(4):
                    split += np.asarray(eval_recurrent(
                        params, model, val_ds.h,
                        jax.random.fold_in(jax.random.key(9), i),
                        cfg.pred_len, 256, cfg.seq_len, float(snr),
                    ))
                sweep[snr] = (split / 4).tolist()
                print(f"SNR {snr}: {sweep[snr]}", flush=True)
            results[name] = sweep
        else:
            tc = TrainConfig(batch_size=256, num_epochs=args.epochs, lr=1e-3,
                             steps_per_epoch=100)
            if name == "informer":
                net = build_informer(cfg)
            else:
                net = Transformer(config=TransformerConfig(
                    seq_len=cfg.seq_len, label_len=cfg.label_len,
                    pred_len=cfg.pred_len))
            trainer = Trainer(model=net, cfg=cfg, train_cfg=tc,
                              train_data=train_ds, val_data=val_ds,
                              log=lambda s: None)
            trainer.fit()
            sweep = {}
            for snr in args.snr_sweep:
                import dataclasses as dc

                sweep_ds = dc.replace(val_ds, snr_db=float(snr))
                trainer.val_data = sweep_ds
                trainer._val_h = sweep_ds.h
                val = trainer.run_validation(jax.random.key(11))
                sweep[snr] = [float(v) for v in np.asarray(val["split"])]
                print(f"SNR {snr}: {sweep[snr]}", flush=True)
            results[name] = sweep

        with open(os.path.join(args.out, f"loss_{name}.pkl"), "wb") as f:
            pickle.dump(results[name], f)

    with open(os.path.join(args.out, "comparison.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({"sweep": "comparison", "models": list(results)}))


if __name__ == "__main__":
    main()
