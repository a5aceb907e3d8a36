"""int8 serving evaluation: accuracy + latency of real quantized inference.

The reference's quantization study ends at simulated (fake) quantization;
this driver measures what the study is *for*: the served int8 model's NMSE
against the f32 model on the validation channel, and the inference latency
A/B (f32 MXU vs int8 MXU) at the flagship batch.

Writes one JSON artifact (default weights/int8_serving.json).

Usage (real TPU):
    python experiments/int8_serving.py --checkpoint <ckpt.msgpack> \
        --calibrated --ue-speed-kmh 5
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from channelestimationtransformer_tpu.core.runtime import setup as _rt_setup
_rt_setup()
import jax.numpy as jnp

from channelestimationtransformer_tpu.channel.cdl import CDLModel
from channelestimationtransformer_tpu.channel.dataset import make_window_dataset
from channelestimationtransformer_tpu.core.config import InformerConfig, TrainConfig
from channelestimationtransformer_tpu.core.metrics import nmse, nmse_split
from channelestimationtransformer_tpu.data.windows import make_batch
from channelestimationtransformer_tpu.models import build_informer
from channelestimationtransformer_tpu.ops.quant.serving import (
    build_int8_table,
    serving_intercept,
)
from channelestimationtransformer_tpu.train.checkpoint import load_checkpoint
from channelestimationtransformer_tpu.train.trainer import create_train_state
from channelestimationtransformer_tpu.utils.profiling import time_fn


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None,
                   help="msgpack checkpoint; default = newest flagship "
                        "weights/tmodel_*21_cal*.msgpack")
    p.add_argument("--snr", type=float, default=21.0)
    p.add_argument("--ue-speed-kmh", type=float, default=5.0)
    p.add_argument("--calibrated", action="store_true")
    p.add_argument("--val-samples", type=int, default=2048)
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--nbits", type=int, default=8)
    p.add_argument("--out", default="weights/int8_serving.json")
    args = p.parse_args()

    cfg = InformerConfig()
    tc = TrainConfig()
    model = build_informer(cfg)
    state = create_train_state(model, rng=jax.random.key(0), cfg=cfg, train_cfg=tc)

    ckpt = args.checkpoint
    if ckpt is None:
        # Only checkpoints of the exact flagship architecture load into the
        # default InformerConfig; the queue also writes d_ff/attn/distil
        # sweep checkpoints that match a looser glob but not the model tree.
        def flagship(name):
            # exact flagship architecture AND geometry (ll mismatch loads
            # fine but evaluates a model trained for a different decoder
            # window); _pallas checkpoints are architecture-identical
            # (the kernel only changes how attention is computed).
            return ("_sl_90_" in name and "_ll_10_" in name
                    and "_dm_128_" in name and "_df_64_" in name
                    and "_at_full_" in name and "21_cal_v5" in name
                    and "nodistil" not in name)

        cands = sorted(
            (c for c in glob.glob("weights/tmodel_*.msgpack")
             if flagship(os.path.basename(c))),
            key=os.path.getmtime,
        )
        ckpt = cands[-1] if cands else None
    if ckpt:
        state, epoch, _ = load_checkpoint(ckpt, state)
        print(f"loaded {ckpt} (epoch {epoch})", flush=True)
    else:
        print("WARNING: no checkpoint found — evaluating random init", flush=True)

    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    table = build_int8_table(variables, nbits=args.nbits)
    print(f"int8 layers: {len(table)}", flush=True)

    cdl = (CDLModel.calibrated(ue_speed_kmh=args.ue_speed_kmh)
           if args.calibrated else
           CDLModel(ue_speed_ms=args.ue_speed_kmh / 3.6))
    ds = make_window_dataset(
        jax.random.key(7), model=cdl, num_samples=args.val_samples,
        num_slots=100, seq_len=cfg.seq_len, pred_len=cfg.pred_len,
        snr_db=args.snr,
    )

    def fwd_f32(x_enc, x_dec):
        return model.apply(variables, x_enc, x_dec)

    def fwd_int8(x_enc, x_dec):
        with serving_intercept(table):
            return model.apply(variables, x_enc, x_dec)

    def fwd_int8_wo(x_enc, x_dec):
        # weight-only: int8 weights, bf16 MACs, epilogue dequant (r5)
        with serving_intercept(table, mode="weight_only"):
            return model.apply(variables, x_enc, x_dec)

    # --- accuracy ---
    accs = {"f32": [], "int8": [], "int8_wo": []}
    splits = {"f32": [], "int8": [], "int8_wo": []}
    jf32, jint8 = jax.jit(fwd_f32), jax.jit(fwd_int8)
    jint8wo = jax.jit(fwd_int8_wo)
    for i in range(args.batches):
        x_enc, x_dec, target = make_batch(
            jax.random.fold_in(jax.random.key(11), i), ds,
            tc.batch_size, cfg.label_len,
        )
        for name, fn in (("f32", jf32), ("int8", jint8),
                         ("int8_wo", jint8wo)):
            pred = fn(x_enc, x_dec)
            pred = pred[0] if isinstance(pred, tuple) else pred
            accs[name].append(float(nmse(pred, target)))
            splits[name].append([float(v) for v in nmse_split(pred, target)])

    res = {"nbits": args.nbits, "layers": len(table), "checkpoint": ckpt}
    for name in ("f32", "int8", "int8_wo"):
        res[f"nmse_{name}"] = sum(accs[name]) / len(accs[name])
        res[f"split_{name}"] = [
            sum(col) / len(col) for col in zip(*splits[name])
        ]
    res["nmse_delta_db"] = 10 * jnp.log10(
        jnp.asarray(res["nmse_int8"] / res["nmse_f32"])
    ).item()
    res["nmse_delta_db_wo"] = 10 * jnp.log10(
        jnp.asarray(res["nmse_int8_wo"] / res["nmse_f32"])
    ).item()

    # --- latency (scan-amortized; see perf_study._scanned rationale) ---
    x_enc, x_dec, _ = make_batch(jax.random.key(13), ds, tc.batch_size,
                                 cfg.label_len)

    def scanned(fn, n=20):
        def run(x_enc, x_dec):
            def body(c, _):
                out = fn(x_enc + 1e-12 * jnp.sum(c), x_dec)
                out = out[0] if isinstance(out, tuple) else out
                return jnp.sum(out), None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return out
        return jax.jit(run), n

    for name, fn in (("f32", fwd_f32), ("int8", fwd_int8),
                     ("int8_wo", fwd_int8_wo)):
        sfn, n = scanned(fn)
        ms, _ = time_fn(sfn, x_enc, x_dec, warmup=2, reps=10)
        res[f"latency_ms_{name}"] = round(ms / n, 4)
    res["latency_speedup"] = round(
        res["latency_ms_f32"] / res["latency_ms_int8"], 3
    )
    res["latency_speedup_wo"] = round(
        res["latency_ms_f32"] / res["latency_ms_int8_wo"], 3
    )

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
