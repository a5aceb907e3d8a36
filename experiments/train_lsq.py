"""LSQ / LSQ-fibbinary quantization-aware training.

Reference: ``QuantizationStudy/LSQ/TrainInformerLSQ.py`` (nbits in [8, 12),
preload FP32 weights ``strict=False``, enable per-module quantize+nbits, train
200 epochs with attn="full", e_layers=[4,3]) and
``QuantizationStudy/LSQFonacci/TrainInformerLSQ.py`` (fibbinary codebook).

Here the LSQ layers live in ``ops.quant.lsq``; a quantized Informer is built
by swapping the attention/FFN projections for DenseLSQ (the reference swaps
LinearLSQ/Conv1dLSQ at the same sites, ``models/InformerLSQ/attn.py:196-199``,
``encoder.py:12-18``). FP32 weights preload via flax state-dict overlay (the
``strict=False`` equivalent); ``step_size`` params initialize from the loaded
weights.
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

from channelestimationtransformer_tpu.channel.cdl import (
    add_channel_args,
    cdl_from_args,
)
from channelestimationtransformer_tpu.channel.dataset import make_window_dataset
from channelestimationtransformer_tpu.core.config import InformerConfig, TrainConfig
from channelestimationtransformer_tpu.models.informer_lsq import build_informer_lsq
from channelestimationtransformer_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from channelestimationtransformer_tpu.train.trainer import (
    Trainer,
    create_train_state,
)
from channelestimationtransformer_tpu.models import build_informer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None, help="pretrained FP32 checkpoint")
    p.add_argument("--nbits-min", type=int, default=8)
    p.add_argument("--nbits-max", type=int, default=11)
    p.add_argument("--fibbinary", action="store_true")
    p.add_argument("--snr", type=float, default=21.0)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--steps-per-epoch", type=int, default=226)
    p.add_argument("--train-samples", type=int, default=8192)
    add_channel_args(p)
    p.add_argument("--out", default="weights")
    args = p.parse_args()

    # Merge with prior rows (weights/ copy, else the committed artifact) so
    # an extension run (e.g. sub-8-bit nbits) widens the study instead of
    # truncating it; write incrementally so a killed run keeps finished rows.
    name = "lsq_fibbinary" if args.fibbinary else "lsq"
    out_path = os.path.join(args.out, f"{name}_results.json")
    art_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "artifacts", f"{name}_results.json")
    results = {}
    for prior in (art_path, out_path):
        if os.path.exists(prior):
            with open(prior) as f:
                results.update(json.load(f))

    os.makedirs(args.out, exist_ok=True)
    for nbits in range(args.nbits_min, args.nbits_max + 1):
        cfg = InformerConfig(attn="full")
        tc = TrainConfig(lr=1e-4, num_epochs=args.epochs,
                         steps_per_epoch=args.steps_per_epoch)
        model = build_informer_lsq(cfg, nbits=nbits, fibbinary=args.fibbinary)

        train_ds = make_window_dataset(
            jax.random.key(100), model=cdl_from_args(args), num_samples=args.train_samples,
            num_slots=100, seq_len=cfg.seq_len, pred_len=cfg.pred_len, snr_db=args.snr,
        )
        val_ds = make_window_dataset(
            jax.random.key(101), model=cdl_from_args(args), num_samples=2048,
            num_slots=100, seq_len=cfg.seq_len, pred_len=cfg.pred_len, snr_db=args.snr,
        )
        trainer = Trainer(model=model, cfg=cfg, train_cfg=tc,
                          train_data=train_ds, val_data=val_ds)

        if args.checkpoint:
            # strict=False preload: overlay FP32 weights onto the LSQ params
            # (step_size keeps its weight-derived init).
            fp32_model = build_informer(cfg)
            fp32_state = create_train_state(
                fp32_model, rng=jax.random.key(0), cfg=cfg, train_cfg=tc
            )
            fp32_state, _, _ = load_checkpoint(args.checkpoint, fp32_state)

            def overlay(lsq, fp32):
                if isinstance(lsq, dict):
                    return {
                        k: overlay(lsq[k], fp32[k]) if k in fp32 else lsq[k]
                        for k in lsq
                    }
                return fp32

            trainer.state = trainer.state.replace(
                params=overlay(trainer.state.params, fp32_state.params)
            )
            print(f"Preloaded FP32 weights from {args.checkpoint}")

        history = trainer.fit()
        tag = f"lsq{'fib' if args.fibbinary else ''}_n{nbits}"
        save_checkpoint(trainer.state, args.out, f"{tag}_", args.epochs)
        results[tag] = {
            "nbits": nbits,
            "final_val_nmse": history[-1]["nmse"],
            "final_val_split": [float(v) for v in history[-1]["split"]],
            # Provenance: rows are only curve-comparable when they preload
            # the same FP32 checkpoint (the r5 sub-8 extension re-ran 8-11
            # for exactly this reason).
            "preload": os.path.basename(args.checkpoint) if args.checkpoint else None,
        }
        print(json.dumps(results[tag]))
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
