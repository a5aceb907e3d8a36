"""On-device performance study: Pallas-vs-XLA attention A/B + bf16 train step.

Closes two ROADMAP items: (1) A/B the Pallas fused attention kernel against
the XLA einsum path at the flagship shapes and a seq-len sweep; (2) benchmark
the fused train step in bfloat16 vs float32. Prints one JSON line per
measurement and a summary dict at the end.

Usage (real TPU; run from the serial queue):
    python experiments/perf_study.py
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
import jax.numpy as jnp
import numpy as np

from channelestimationtransformer_tpu.core.config import InformerConfig, TrainConfig
from channelestimationtransformer_tpu.models import build_informer
from channelestimationtransformer_tpu.models.attention import full_attention
from channelestimationtransformer_tpu.ops.pallas.attention import mha_attention
from channelestimationtransformer_tpu.train.trainer import (
    create_train_state,
    train_chunk,
)
from channelestimationtransformer_tpu.utils.profiling import time_fn


def _scanned(fn, n):
    """n back-to-back invocations in ONE jitted program (the output feeds the
    next input), so the tunnel's ~45 ms dispatch RTT is amortized away and the
    measurement reflects on-device kernel time."""

    def run(x0, *rest):
        def body(c, _):
            return fn(c, *rest), None

        out, _ = jax.lax.scan(body, x0, None, length=n)
        return out

    return jax.jit(run)


def attention_ab(reps: int):
    results = []
    rng = np.random.default_rng(0)
    h, e = 8, 16  # flagship: 8 heads x 16 head-dim (d_model 128)
    inner = 20  # kernel invocations per dispatch
    # whole-problem-in-VMEM kernel: cap L so [L, L] f32 scores fit in VMEM
    for b, l in [(256, 90), (256, 128), (64, 512), (32, 1024)]:
        # transient remote-compile failures (HTTP 500 from the tunnel's
        # compile helper) shouldn't kill the whole study
        try:
            results.extend(_attention_row(rng, b, l, h, e, inner, reps))
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"bench": "attention_ab", "batch": b, "seq": l,
                              "error": str(exc)[:200]}), flush=True)
    try:
        results.extend(_attention_grad_rows(rng, h, e, inner, reps))
    except Exception as exc:  # noqa: BLE001
        print(json.dumps({"bench": "attention_grad_ab",
                          "error": str(exc)[:200]}), flush=True)
    return results


def _attention_row(rng, b, l, h, e, inner, reps):
    from channelestimationtransformer_tpu.ops.pallas.bd_attention import (
        bd_attention,
        supported_shape,
    )

    results = []
    q = jnp.asarray(rng.normal(size=(b, l, h, e)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, h, e)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, h, e)), jnp.float32)

    xla_one = lambda q, k, v: full_attention(q, k, v, mask_flag=False)[0]
    pal_one = lambda q, k, v: mha_attention(q, k, v, causal=False)
    bd_ok = supported_shape(q, k, v)
    bd_one = lambda q, k, v: bd_attention(q, k, v)

    # numerics check first
    err = float(jnp.max(jnp.abs(
        jax.jit(xla_one)(q, k, v) - jax.jit(pal_one)(q, k, v)
    )))

    xla_fn = _scanned(xla_one, inner)
    pallas_fn = _scanned(pal_one, inner)
    ms_xla, _ = time_fn(xla_fn, q, k, v, warmup=2, reps=max(reps // 10, 3))
    ms_pal, _ = time_fn(pallas_fn, q, k, v, warmup=2, reps=max(reps // 10, 3))
    ms_xla /= inner
    ms_pal /= inner
    row = {
        "bench": "attention_ab", "batch": b, "seq": l,
        "ms_xla": round(ms_xla, 4), "ms_pallas": round(ms_pal, 4),
        "speedup": round(ms_xla / ms_pal, 3), "max_abs_err": err,
    }
    if bd_ok:
        err_bd = float(jnp.max(jnp.abs(
            jax.jit(xla_one)(q, k, v) - jax.jit(bd_one)(q, k, v)
        )))
        ms_bd, _ = time_fn(
            _scanned(bd_one, inner), q, k, v, warmup=2,
            reps=max(reps // 10, 3),
        )
        ms_bd /= inner
        row.update({
            "ms_bd": round(ms_bd, 4),
            "speedup_bd": round(ms_xla / ms_bd, 3),
            "max_abs_err_bd": err_bd,
        })
    print(json.dumps(row), flush=True)
    results.append(row)
    return results


def _attention_grad_rows(rng, h, e, inner, reps):
    from channelestimationtransformer_tpu.ops.pallas.bd_attention import (
        bd_attention,
    )

    results = []
    # Forward+backward at the flagship shape (the training regime the BD
    # kernel exists for: fused bwd kernel vs XLA autodiff).
    b, l = 256, 90
    q = jnp.asarray(rng.normal(size=(b, l, h, e)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, h, e)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, h, e)), jnp.float32)
    for name, one in (
        ("xla", lambda q, k, v: full_attention(q, k, v, mask_flag=False)[0]),
        ("bd", lambda q, k, v: bd_attention(q, k, v)),
    ):
        grad_one = jax.grad(lambda q, k, v: jnp.sum(one(q, k, v)), argnums=0)
        ms, _ = time_fn(
            _scanned(grad_one, inner), q, k, v, warmup=2,
            reps=max(reps // 10, 3),
        )
        row = {
            "bench": "attention_grad_ab", "batch": b, "seq": l, "impl": name,
            "ms": round(ms / inner, 4),
        }
        print(json.dumps(row), flush=True)
        results.append(row)
    return results


def quant_kernel_ab(reps: int):
    """Pallas fused fixed-point fake-quant vs the pure-JAX/XLA path, at the
    optimizer weight-quant scale (all Informer params ~ 1M elements)."""
    from channelestimationtransformer_tpu.ops.pallas.quant import (
        fused_fixed_point_quantize,
    )
    from channelestimationtransformer_tpu.ops.quant.functional import (
        fixed_point_quantize,
    )

    results = []
    rng = np.random.default_rng(2)
    inner = 20
    for n in (1 << 20, 1 << 24):
        x = jnp.asarray(rng.normal(size=(n,)), jnp.float32) * 0.1
        xla_one = lambda x: fixed_point_quantize(x, 8, 4)
        pal_one = lambda x: fused_fixed_point_quantize(x, 8, 4)
        err = float(jnp.max(jnp.abs(jax.jit(xla_one)(x) - jax.jit(pal_one)(x))))
        xla_fn = _scanned(xla_one, inner)
        pal_fn = _scanned(pal_one, inner)
        ms_xla, _ = time_fn(xla_fn, x, warmup=2, reps=max(reps // 10, 3))
        ms_pal, _ = time_fn(pal_fn, x, warmup=2, reps=max(reps // 10, 3))
        ms_xla /= inner
        ms_pal /= inner
        row = {
            "bench": "quant_ab", "elements": n,
            "ms_xla": round(ms_xla, 4), "ms_pallas": round(ms_pal, 4),
            "speedup": round(ms_xla / ms_pal, 3), "max_abs_err": err,
        }
        print(json.dumps(row), flush=True)
        results.append(row)
    return results


def train_step_dtype_ab(reps: int):
    results = []
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(size=(2048, 100, 16)), jnp.float32)
    # +bd = block-diagonal Pallas attention; +rbg = TPU hardware-backed RBG
    # PRNG keys (threefry is a ~20-round ALU ladder; the step draws tens of
    # millions of randoms for sampling/AWGN/dropout). The PRNG impl travels
    # with the key, so selecting it needs no global config.
    for variant in (
        "float32", "bfloat16", "float32+bd", "bfloat16+bd",
        "float32+bd+rbg", "bfloat16+bd+rbg",
    ):
      try:
        tokens = variant.split("+")
        dtype = tokens[0]
        impl = "rbg" if "rbg" in tokens else None
        cfg = InformerConfig(dtype=dtype, use_pallas="bd" in tokens)
        tc = TrainConfig()
        model = build_informer(cfg)
        state = create_train_state(
            model, rng=jax.random.key(0), cfg=cfg, train_cfg=tc
        )
        kwargs = dict(
            num_steps=10, batch_size=tc.batch_size, label_len=cfg.label_len,
            seq_len=cfg.seq_len, pred_len=cfg.pred_len, snr_db=21.0,
        )

        # train_chunk donates the state, so thread it through a manual
        # timing loop instead of time_fn's fixed-args replay.
        import time as _time

        key = jax.random.key(2, impl=impl) if impl else jax.random.key(2)
        for i in range(2):  # warmup/compile
            state, m = train_chunk(state, h, jax.random.fold_in(key, i), **kwargs)
        float(m["loss_sum"])  # value fetch: the only reliable barrier on the
        # axon tunnel runtime (block_until_ready can return pre-completion,
        # inflating throughput ~30x — same workaround as bench.py/_force).
        n_chunks = max(reps // 10, 3)
        t0 = _time.perf_counter()
        for i in range(n_chunks):
            state, m = train_chunk(state, h, jax.random.fold_in(key, 10 + i), **kwargs)
            float(m["loss_sum"])
        ms = (_time.perf_counter() - t0) * 1000 / n_chunks
        samples_s = tc.batch_size * 10 / (ms / 1000)
        row = {
            "bench": "train_step", "dtype": variant,
            "ms_per_batch": round(ms / 10, 4),
            "samples_per_s": round(samples_s, 1),
            "vs_a100_baseline": round(samples_s / 3370.0, 2),
        }
        print(json.dumps(row), flush=True)
        results.append(row)
      except Exception as exc:  # noqa: BLE001
        print(json.dumps({"bench": "train_step", "dtype": variant,
                          "error": str(exc)[:200]}), flush=True)
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=50)
    p.add_argument("--out", default="weights/perf_study.json")
    p.add_argument("--only", nargs="*", default=None,
                   help="subset of sections (attention_ab/quant_ab/train_step)")
    args = p.parse_args()
    print(f"Device: {jax.devices()[0]}", flush=True)

    sections = {
        "attention_ab": lambda: attention_ab(args.reps),
        "quant_ab": lambda: quant_kernel_ab(args.reps),
        "train_step": lambda: train_step_dtype_ab(args.reps),
    }
    # --only merges fresh sections over the existing artifact instead of
    # dropping the others.
    out = {}
    if args.only and os.path.exists(args.out):
        with open(args.out) as f:
            out = json.load(f)
    for name, fn in sections.items():
        if args.only is None or name in args.only:
            out[name] = fn()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"sweep": "perf_study", "done": True}))


if __name__ == "__main__":
    main()
