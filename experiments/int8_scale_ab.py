"""int8-serving latency A/B at production model sizes.

`experiments/int8_serving.py` measures accuracy+latency on the trained
flagship, where inference is latency-bound and int8 buys storage, not time.
This driver quantifies the other half of that claim: at the scale-demo sizes
(d_model 256-1024) the same `ops/quant/serving.py` W8A8 path rides the MXU's
2x int8 MAC rate. Latency is weight-value independent, so models are
random-initialized (accuracy of the int8 path is covered by the flagship
artifact + `tests/test_serving.py`).

Variants per size: f32 apply, bf16 apply, W8A8 int8 serving intercept, and
weight-only int8 (int8 weights + bf16 MACs, dequant folded into the matmul
epilogue — no dynamic activation quant; VERDICT r4 item 6).
Writes weights/int8_scale_ab.json. Reference obligation: the quantization
study's efficiency motivation (SURVEY §0 item 3); the reference never
executes quantized compute (`qtorch` fake-quant only).
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
import jax.numpy as jnp
import numpy as np

from channelestimationtransformer_tpu.core.config import InformerConfig
from channelestimationtransformer_tpu.models import build_informer
from channelestimationtransformer_tpu.ops.quant.serving import (
    build_int8_table,
    serving_intercept,
)

SIZES = [
    # (name, d_model, d_ff, seq_len, batch) — scale_demo.py geometry
    ("reference", 128, 64, 90, 256),
    ("medium", 256, 1024, 128, 256),
    ("large", 512, 2048, 256, 128),
    ("xl", 1024, 4096, 256, 64),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scan", type=int, default=20,
                   help="forwards chained per program (dispatch amortization)")
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--sizes", nargs="*", default=None)
    p.add_argument("--out", default="weights/int8_scale_ab.json")
    args = p.parse_args()

    rng = np.random.default_rng(0)
    rows = []
    for name, d_model, d_ff, seq_len, batch in SIZES:
        if args.sizes is not None and name not in args.sizes:
            continue
        try:
            row = {"config": name, "d_model": d_model, "d_ff": d_ff,
                   "seq_len": seq_len, "batch": batch}
            for variant in ("float32", "bfloat16", "int8", "int8_wo"):
                # int8 (W8A8) stays on the f32 base model for r4-artifact
                # continuity; weight-only serves on the bf16 base (its
                # production config — bf16 activations are the point).
                cfg = InformerConfig(
                    d_model=d_model, d_ff=d_ff, seq_len=seq_len,
                    dtype="bfloat16" if variant in ("bfloat16", "int8_wo")
                    else "float32",
                )
                model = build_informer(cfg)
                x_enc = jnp.asarray(
                    rng.normal(size=(batch, cfg.seq_len, cfg.enc_in)),
                    jnp.float32)
                x_dec = jnp.asarray(
                    rng.normal(size=(batch, cfg.dec_len, cfg.dec_in)),
                    jnp.float32)
                variables = model.init(jax.random.key(0), x_enc, x_dec)
                table = (build_int8_table(variables)
                         if variant.startswith("int8") else None)
                mode = "weight_only" if variant == "int8_wo" else "w8a8"

                def fwd(xe, xd):
                    if table is not None:
                        with serving_intercept(table, mode=mode):
                            out = model.apply(variables, xe, xd)
                    else:
                        out = model.apply(variables, xe, xd)
                    return out[0] if isinstance(out, tuple) else out

                n = args.scan

                @jax.jit
                def run(xe, xd):
                    def body(c, _):
                        s = jnp.sum(fwd(xe + 1e-12 * c, xd))
                        return s.astype(jnp.float32), None

                    out, _ = jax.lax.scan(
                        body, jnp.float32(0), None, length=n)
                    return out

                float(run(x_enc, x_dec))  # compile + warm
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    float(run(x_enc, x_dec))  # value fetch = barrier
                ms = (time.perf_counter() - t0) * 1000 / (args.reps * n)
                row[f"ms_{variant}"] = round(ms, 4)
                row[f"samples_per_s_{variant}"] = round(batch / (ms / 1e3), 1)
            row["int8_speedup_vs_f32"] = round(
                row["ms_float32"] / row["ms_int8"], 3)
            row["int8_speedup_vs_bf16"] = round(
                row["ms_bfloat16"] / row["ms_int8"], 3)
            row["int8_wo_speedup_vs_f32"] = round(
                row["ms_float32"] / row["ms_int8_wo"], 3)
            row["int8_wo_speedup_vs_bf16"] = round(
                row["ms_bfloat16"] / row["ms_int8_wo"], 3)
        except Exception as exc:  # noqa: BLE001 — transient tunnel failures
            row = {"config": name, "error": str(exc)[:200]}
        print(json.dumps(row), flush=True)
        rows.append(row)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
