"""Convergence A/B: reference torch InformerStack vs our JAX stack on the SAME
generated dataset and batch stream.

Localizes the round-1 NMSE gap (VERDICT r1 missing #1): if the torch reference
model converges like the committed A100 logs (val ~0.067 after 1 epoch at
SNR 12, FullPrecision/Figures/SNR.txt) on OUR ss14 data while our stack does
not, the gap is model/training semantics; if torch is equally slow, the gap is
in the data.

Runs on CPU (torch) with the JAX data pipeline forced to CPU so it can run
concurrently with TPU jobs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch

from channelestimationtransformer_tpu.channel.cdl import CDLModel
from channelestimationtransformer_tpu.channel.dataset import make_window_dataset
from channelestimationtransformer_tpu.data.windows import make_batch
from experiments.torch_ref import TorchInformerStack, nmse, nmse_split


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--snr", type=float, default=12.0)
    p.add_argument("--slot-symbols", type=int, default=14)
    p.add_argument("--steps", type=int, default=226)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--train-samples", type=int, default=4096)
    p.add_argument("--val-samples", type=int, default=512)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--log-every", type=int, default=22)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--threads", type=int, default=0)
    args = p.parse_args()
    if args.threads:
        torch.set_num_threads(args.threads)

    seq_len, label_len, pred_len = 90, 10, 5
    cdl = CDLModel(sampling_frequency=120e3 / args.slot_symbols)
    key = jax.random.key(args.seed + 100)
    k1, k2 = jax.random.split(key)
    t0 = time.time()
    train_ds = make_window_dataset(
        k1, model=cdl, num_samples=args.train_samples, num_slots=100,
        seq_len=seq_len, pred_len=pred_len, snr_db=args.snr,
    )
    val_ds = make_window_dataset(
        k2, model=cdl, num_samples=args.val_samples, num_slots=100,
        seq_len=seq_len, pred_len=pred_len, snr_db=args.snr,
    )
    print(f"datagen {time.time() - t0:.1f}s", flush=True)

    torch.manual_seed(args.seed)
    model = TorchInformerStack(dropout=0.05)
    opt = torch.optim.Adam(model.parameters(), lr=args.lr, eps=1e-9)
    nparams = sum(t.numel() for t in model.parameters() if t.requires_grad)
    print(f"torch params: {nparams}", flush=True)

    def to_torch(a):
        return torch.from_numpy(np.asarray(a))

    # Pre-draw validation batches once (fixed eval set).
    val_batches = []
    for i in range(4):
        xb, xd, tb = make_batch(
            jax.random.fold_in(jax.random.key(777), i), val_ds, args.batch_size, label_len
        )
        val_batches.append((to_torch(xb), to_torch(xd), to_torch(tb)))

    def validate():
        model.eval()
        tot = torch.zeros(5)
        with torch.no_grad():
            for xb, xd, tb in val_batches:
                tot += nmse_split(model(xb, xd), tb)
        model.train()
        return (tot / len(val_batches)).mean().item()

    losses = []
    t0 = time.time()
    for step in range(args.steps):
        xb, xd, tb = make_batch(
            jax.random.fold_in(jax.random.key(args.seed), step),
            train_ds, args.batch_size, label_len,
        )
        xb, xd, tb = to_torch(xb), to_torch(xd), to_torch(tb)
        opt.zero_grad(set_to_none=True)
        loss = nmse(model(xb, xd), tb)
        loss.backward()
        opt.step()
        losses.append(loss.item())
        if (step + 1) % args.log_every == 0:
            ms = (time.time() - t0) * 1000 / args.log_every
            cur = float(np.mean(losses[-args.log_every:]))
            print(f"| step {step + 1:4d} | ms/batch {ms:7.1f} | loss {cur:6.4f}", flush=True)
            t0 = time.time()

    val = validate()
    print(json.dumps({
        "steps": args.steps, "snr": args.snr, "final_train_loss": losses[-1],
        "val_split_mean": val,
    }))


if __name__ == "__main__":
    main()
