"""FullPrecision experiment driver: train the Informer channel predictor.

Reference: ``FullPrecision/QuantizationAwareTraining.py`` + its sbatch sweeps
(SNR, seq_len, label_len, d_model, d_ff, attn, distil — ``FullPrecision/*.sbatch``).
The same sweepable fields are CLI flags here; logs use the reference's parseable
format; results are written as JSON next to the checkpoints.

Usage:
    python experiments/train_informer.py --snr 21 --epochs 100
    python experiments/train_informer.py --seq-len 50 --epochs 100
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
import numpy as np

from channelestimationtransformer_tpu.channel.cdl import CDLModel
from channelestimationtransformer_tpu.channel.dataset import make_window_dataset
from channelestimationtransformer_tpu.core.config import InformerConfig, TrainConfig
from channelestimationtransformer_tpu.models import build_informer
from channelestimationtransformer_tpu.train.checkpoint import save_checkpoint
from channelestimationtransformer_tpu.train.trainer import Trainer


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--snr", type=float, default=21.0)
    p.add_argument("--seq-len", type=int, default=90)
    p.add_argument("--label-len", type=int, default=10)
    p.add_argument("--pred-len", type=int, default=5)
    p.add_argument("--d-model", type=int, default=128)
    p.add_argument("--n-heads", type=int, default=8)
    p.add_argument("--e-layers", type=int, nargs="+", default=[4, 3])
    p.add_argument("--d-layers", type=int, default=3)
    p.add_argument("--d-ff", type=int, default=64)
    p.add_argument("--dropout", type=float, default=0.05)
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32")
    p.add_argument("--prng", choices=["threefry2x32", "rbg"],
                   default="threefry2x32",
                   help="training-stream PRNG impl; 'rbg' = TPU hardware "
                        "random-bit generator (the bench's fast config)")
    p.add_argument("--attn", choices=["full", "prob"], default="full")
    p.add_argument("--no-distil", action="store_true")
    p.add_argument("--use-pallas", action="store_true",
                   help="fused Pallas attention kernels (bd_attention) in "
                        "train+eval instead of the XLA einsum path")
    p.add_argument("--pre-norm", action="store_true",
                   help="pre-LayerNorm residual blocks (from-scratch stability)")
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--tensorboard", action="store_true",
                   help="write TensorBoard event files under runs/<name>")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--steps-per-epoch", type=int, default=226)
    p.add_argument("--log-every", type=int, default=22,
                   help="train-chunk size in steps (= host fetches per "
                        "epoch: steps/log_every). On a flaky tunnel use 226 "
                        "(one fetch per epoch)")
    p.add_argument("--checkpoint-every", type=int, default=100,
                   help="checkpoint cadence in epochs (reference: 100)")
    p.add_argument("--train-samples", type=int, default=8192)
    p.add_argument("--val-samples", type=int, default=2048)
    p.add_argument("--num-slots", type=int, default=100)
    p.add_argument("--slot-symbols", type=int, default=75,
                   help="OFDM symbols per sampled slot. 75 = the committed "
                        "reference generator (1.6 kHz, GenerateChannelsFreq"
                        "PreMatlab.py:43); 14 = one 5G slot (8.57 kHz), which "
                        "matches the statistics of the reference repo's stored "
                        "channel pickle (lag-1 corr 0.88) and likely the "
                        "original datasets")
    p.add_argument("--ue-speed-kmh", type=float, default=None,
                   help="UE mobility (reference nominal: 30 km/h, Generate"
                        "ChannelsFreqPreMatlab.py). Default: 30, or the "
                        "fitted 5.5 under --calibrated. An EXPLICIT 30 with "
                        "--calibrated selects the fast parity cluster "
                        "(nominal mobility at the recovered slot geometry, "
                        "run names tagged _cal_v30 — calibrate_fast.py)")
    p.add_argument("--calibrated", action="store_true",
                   help="use CDLModel.calibrated(): the parity-calibrated "
                        "slot period (160.42 us, the stored channel.pickle's "
                        "geometry) + fitted UE speed (--ue-speed-kmh, default "
                        "5.5 in this mode). See experiments/calibrate_channel.py")
    p.add_argument("--lr-schedule", choices=["warmup_cosine", "constant"],
                   default="warmup_cosine",
                   help="'constant' replicates the reference SNR-sweep runs "
                        "(lr held at 1e-3, FullPrecision/Figures/SNR.txt)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="weights")
    p.add_argument("--tag", type=str, default="")
    p.add_argument("--preload", type=str, default=None,
                   help="checkpoint path, or 'latest' (reference preload modes,"
                        " FullPrecision/QuantizationAwareTraining.py:189-202)")
    p.add_argument("--resume", action="store_true",
                   help="auto-resume from the newest checkpoint (step-exact)")
    return p.parse_args()


def main():
    args = parse_args()
    ue_speed = (args.ue_speed_kmh if args.ue_speed_kmh is not None
                else (5.5 if args.calibrated else 30.0))
    cfg = InformerConfig(
        seq_len=args.seq_len,
        label_len=args.label_len,
        pred_len=args.pred_len,
        d_model=args.d_model,
        n_heads=args.n_heads,
        e_layers=tuple(args.e_layers),
        d_layers=args.d_layers,
        d_ff=args.d_ff,
        dropout=args.dropout,
        attn=args.attn,
        distil=not args.no_distil,
        pre_norm=args.pre_norm,
        dtype=args.dtype,
        use_pallas=args.use_pallas,
    )
    tc = TrainConfig(
        batch_size=args.batch_size,
        num_epochs=args.epochs,
        lr=args.lr,
        weight_decay=args.weight_decay,
        steps_per_epoch=args.steps_per_epoch,
        seed=args.seed,
        schedule=args.lr_schedule,
        log_every=args.log_every,
        checkpoint_every_epochs=args.checkpoint_every,
        checkpoint_dir=args.out,
        prng_impl=args.prng,
    )
    # Reference model-name line (parsed by Figures/parse.py).
    name = (
        f"ei_{cfg.enc_in}_di_{cfg.dec_in}_co_{cfg.c_out}_sl_{cfg.seq_len}"
        f"_ll_{cfg.label_len}_pl_{cfg.pred_len}_f_{cfg.factor}_dm_{cfg.d_model}"
        f"_nh_{cfg.n_heads}_el_{list(cfg.e_layers)}_dl_{cfg.d_layers}"
        f"_df_{cfg.d_ff}_do_{cfg.dropout}_at_{cfg.attn}_em_fixed_ac_gelu_{int(args.snr)}"
        + ("_cal" if args.calibrated else
           (f"_ss{args.slot_symbols}" if args.slot_symbols != 75 else ""))
        + (f"_v{ue_speed:g}"
           if (args.ue_speed_kmh is not None if args.calibrated
               else ue_speed != 30.0) else "")
        + ("_prenorm" if args.pre_norm else "")
        + ("_bf16" if args.dtype == "bfloat16" else "")
        + ("_rbg" if args.prng == "rbg" else "")
        + ("_pallas" if args.use_pallas else "")
        + ("_nodistil" if args.no_distil else "")
        + (f"_{args.tag}" if args.tag else "")
    )
    print(f"Model_name:  {name}", flush=True)
    print(f"Using device: {jax.devices()[0]}", flush=True)

    t0 = time.time()
    key = jax.random.key(args.seed + 100)
    k1, k2 = jax.random.split(key)
    if args.calibrated:
        cdl = CDLModel.calibrated(ue_speed_kmh=ue_speed)
    else:
        cdl = CDLModel(sampling_frequency=120e3 / args.slot_symbols,
                       ue_speed_ms=ue_speed / 3.6)
    train_ds = make_window_dataset(
        k1, model=cdl, num_samples=args.train_samples,
        num_slots=args.num_slots, seq_len=cfg.seq_len, pred_len=cfg.pred_len,
        snr_db=args.snr,
    )
    val_ds = make_window_dataset(
        k2, model=cdl, num_samples=args.val_samples,
        num_slots=args.num_slots, seq_len=cfg.seq_len, pred_len=cfg.pred_len,
        snr_db=args.snr,
    )
    jax.block_until_ready(train_ds.h)
    print(f"Dataset generated in {time.time() - t0:.1f}s "
          f"(train {train_ds.h.shape}, val {val_ds.h.shape})", flush=True)

    writer = None
    if args.tensorboard:
        from channelestimationtransformer_tpu.utils.tensorboard import MetricsWriter

        writer = MetricsWriter(os.path.join("runs", name))
    trainer = Trainer(
        model=build_informer(cfg), cfg=cfg, train_cfg=tc,
        train_data=train_ds, val_data=val_ds, metrics_writer=writer,
    )
    start_epoch = 0
    if args.preload or args.resume:
        from channelestimationtransformer_tpu.train.checkpoint import (
            latest_checkpoint,
            load_checkpoint,
        )

        path = (
            latest_checkpoint(args.out, f"tmodel_{name}_")
            if (args.resume or args.preload == "latest") else args.preload
        )
        if path:
            trainer.state, pre_epoch, _ = load_checkpoint(path, trainer.state)
            print(f"Preloading model {path} (epoch {pre_epoch})", flush=True)
            if args.resume and pre_epoch:
                start_epoch = int(pre_epoch)
            else:
                # Fine-tune: fresh optimizer + schedule step 0 (a restored
                # opt_state carries the OLD run's schedule count, which would
                # evaluate the new cosine past its end -> lr 0).
                trainer.state = trainer.state.replace(
                    step=0, opt_state=trainer.state.tx.init(trainer.state.params)
                )
        else:
            print("No checkpoint found to preload", flush=True)
    trainer.checkpoint_tag = f"tmodel_{name}_"
    history = trainer.fit(start_epoch=start_epoch)

    os.makedirs(args.out, exist_ok=True)
    save_checkpoint(trainer.state, args.out, f"tmodel_{name}_", args.epochs)
    result = {
        "name": name,
        "snr": args.snr,
        "epochs": args.epochs,
        "final_val_nmse": history[-1]["nmse"],
        "final_val_nmse_db": float(10 * np.log10(history[-1]["nmse"])),
        "final_val_split": [float(v) for v in history[-1]["split"]],
        "history_nmse": [h["nmse"] for h in history],
    }
    with open(os.path.join(args.out, f"result_{name}.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "history_nmse"}))


if __name__ == "__main__":
    main()
