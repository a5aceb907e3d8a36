"""Post-training quantization sweep.

Reference: ``QuantizationStudy/PostTrainingQuantization/PostTrainingQuantization.py:136-274``:
load a pretrained FP32 Informer, for each word length wl in [4, 16) with
fl = wl - 4 and rounding in {nearest, stochastic}, quantize the 66 attention/
FFN weight tensors (one ``OptimLP.step()`` whose post-hook quantizes), run
validation, save the per-horizon loss list.

Here: restore checkpoint -> ``apply_weight_quant`` (on device, no optimizer
trickery needed) -> eval -> JSON results.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
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
from channelestimationtransformer_tpu.models import build_informer
from channelestimationtransformer_tpu.ops.quant import (
    apply_weight_quant,
    fixed_point_quantize,
)
from channelestimationtransformer_tpu.ops.quant.settings import (
    build_weight_quant_settings,
)
from channelestimationtransformer_tpu.train.checkpoint import load_checkpoint
from channelestimationtransformer_tpu.train.trainer import (
    create_train_state,
    eval_step,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--snr", type=float, default=21.0)
    p.add_argument("--wl-min", type=int, default=4)
    p.add_argument("--wl-max", type=int, default=15)
    p.add_argument("--fl-offset", type=int, default=-4,
                   help="fractional length = wl + offset. The reference uses "
                        "-4 in the PTQ sweep (PostTrainingQuantization.py:146) "
                        "but -1 in its eval-only variant (Eval.py:196, SURVEY "
                        "quirk 9)")
    p.add_argument("--val-samples", type=int, default=2048)
    add_channel_args(p)
    p.add_argument("--out", default="weights/ptq_results.json")
    args = p.parse_args()

    cfg = InformerConfig()
    tc = TrainConfig()
    model = build_informer(cfg)
    state = create_train_state(model, rng=jax.random.key(0), cfg=cfg, train_cfg=tc)
    state, epoch, _ = load_checkpoint(args.checkpoint, state)
    print(f"Loaded checkpoint (epoch {epoch})")

    val_ds = make_window_dataset(
        jax.random.key(123), model=cdl_from_args(args), num_samples=args.val_samples,
        num_slots=100, seq_len=cfg.seq_len, pred_len=cfg.pred_len, snr_db=args.snr,
    )
    kw = dict(
        batch_size=tc.batch_size, label_len=cfg.label_len,
        seq_len=cfg.seq_len, pred_len=cfg.pred_len, snr_db=args.snr,
    )

    def validate(st):
        split = np.zeros(cfg.pred_len)
        nm = 0.0
        for i in range(8):
            m = eval_step(st, val_ds.h, jax.random.fold_in(jax.random.key(7), i), **kw)
            split += np.asarray(m["split"])
            nm += float(m["nmse"])
        return (split / 8).tolist(), nm / 8

    results = {"fp32": validate(state)}
    print("fp32:", results["fp32"])

    fp32_params = state.params
    for rounding in ("nearest", "stochastic"):
        for wl in range(args.wl_min, args.wl_max + 1):
            fl = wl + args.fl_offset

            def qfn(w, percentage, key, wl=wl, fl=fl, rounding=rounding):
                return fixed_point_quantize(
                    w, wl, fl, rounding=rounding, key=key
                )

            settings = build_weight_quant_settings(fp32_params, qfn)
            qparams = apply_weight_quant(
                fp32_params, settings, percentage=1.0, key=jax.random.key(wl)
            )
            split, nm = validate(state.replace(params=qparams))
            results[f"{rounding}_wl{wl}_fl{fl}"] = (split, nm)
            print(f"{rounding} wl={wl} fl={fl}: nmse={nm:.4f}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    # Reference-format per-rounding loss pickles (loss_list_<rounding>.pkl,
    # PostTrainingQuantization.py tail).
    for rounding in ("nearest", "stochastic"):
        loss_list = [
            results[k][0] for k in sorted(results)
            if k.startswith(rounding + "_")
        ]
        with open(
            os.path.join(os.path.dirname(args.out), f"loss_list_{rounding}.pkl"),
            "wb",
        ) as f:
            pickle.dump(loss_list, f)
    print(json.dumps({"sweep": "ptq", "entries": len(results)}))


if __name__ == "__main__":
    main()
