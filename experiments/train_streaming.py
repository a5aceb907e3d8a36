"""Streaming-predictor experiment: train offline, evaluate blockwise online.

Reference: ``StreamingTransformer(WIP)/`` — trains the vanilla Transformer on a
sliding-window dataset (``config.py:11``) and stubs a stateful blockwise model
(``StreamingTransformerModel/``; never finished). Here the completed streaming
path (``models/streaming.py``) reuses the offline-trained Informer weights:

1. train (or preload) the standard Informer;
2. stream validation trajectories block-by-block with the functional carry;
3. report per-block prediction NMSE once the window is warm, verifying
   streaming inference matches offline quality.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from channelestimationtransformer_tpu.core.runtime import setup as _rt_setup
_rt_setup()
import numpy as np

from channelestimationtransformer_tpu.channel.cdl import (
    add_channel_args,
    cdl_from_args,
)
from channelestimationtransformer_tpu.channel.dataset import make_window_dataset
from channelestimationtransformer_tpu.core.config import InformerConfig, TrainConfig
from channelestimationtransformer_tpu.data.windows import sample_windows
from channelestimationtransformer_tpu.models import build_informer
from channelestimationtransformer_tpu.models.streaming import streaming_rollout
from channelestimationtransformer_tpu.train.checkpoint import load_checkpoint
from channelestimationtransformer_tpu.train.trainer import create_train_state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--snr", type=float, default=21.0)
    p.add_argument("--block", type=int, default=5)
    p.add_argument("--batch", type=int, default=128)
    add_channel_args(p)
    p.add_argument("--out", default="weights/streaming_results.json")
    args = p.parse_args()

    cfg = InformerConfig()
    model = build_informer(cfg)
    state = create_train_state(
        model, rng=jax.random.key(0), cfg=cfg, train_cfg=TrainConfig()
    )
    state, _, _ = load_checkpoint(args.checkpoint, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    ds = make_window_dataset(
        jax.random.key(7), model=cdl_from_args(args), num_samples=1024, num_slots=100,
        seq_len=95, pred_len=args.block, snr_db=args.snr,
    )
    clean, noisy, _, _ = sample_windows(jax.random.key(8), ds, args.batch)
    # Stream the noisy trajectory; each ingested block predicts the next block.
    preds = streaming_rollout(model, variables, cfg, noisy, block=args.block)
    preds = np.asarray(preds)  # [n_blocks, B, pred, F]
    clean = np.asarray(clean)

    n_blocks = preds.shape[0]
    warm = cfg.seq_len // args.block  # blocks until the window is full
    per_block = []
    for i in range(n_blocks - 1):
        target = clean[:, (i + 1) * args.block : (i + 2) * args.block]
        if target.shape[1] < args.block:
            break
        err = float(np.sum((preds[i] - target) ** 2) / np.sum(target**2))
        per_block.append(err)
    warm_nmse = float(np.mean(per_block[warm - 1 :])) if len(per_block) >= warm else None

    result = {
        "block": args.block,
        "per_block_nmse": per_block,
        "warm_window_nmse": warm_nmse,
        "warm_window_nmse_db": (
            float(10 * np.log10(warm_nmse)) if warm_nmse else None
        ),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
