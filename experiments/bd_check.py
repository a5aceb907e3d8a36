"""Hardware numerics check for the block-diagonal fused attention kernel.

Runs on the real TPU (the CPU test suite exercises the same kernels in
interpreter mode; this validates the Mosaic-compiled path):

- forward + gradients vs the XLA einsum path at the flagship shapes,
- dropout determinism (same seed -> identical output; fwd/bwd mask agreement
  is implied by gradient self-consistency),
- dropout keep-rate statistics.

Prints one JSON line per check; exits nonzero on failure.
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

from channelestimationtransformer_tpu.models.attention import full_attention
from channelestimationtransformer_tpu.ops.pallas.bd_attention import bd_attention


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights/bd_check.json")
    args = ap.parse_args()
    rows = []
    rng = np.random.default_rng(0)
    failures = 0

    for b, l_q, l_k, h, e, causal in [
        (256, 90, 90, 8, 16, False),
        (256, 15, 15, 8, 16, True),
        (256, 15, 24, 8, 16, False),
        (64, 45, 45, 4, 32, False),
    ]:
        q = jnp.asarray(rng.normal(size=(b, l_q, h, e)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, l_k, h, e)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, l_k, h, e)), jnp.float32)

        ref = jax.jit(
            lambda q, k, v: full_attention(q, k, v, mask_flag=causal)[0]
        )(q, k, v)
        got = jax.jit(
            lambda q, k, v: bd_attention(q, k, v, causal=causal)
        )(q, k, v)
        err_f = float(jnp.max(jnp.abs(ref - got)))

        def loss_ref(q, k, v):
            return jnp.sum(jnp.sin(full_attention(q, k, v, mask_flag=causal)[0]))

        def loss_bd(q, k, v):
            return jnp.sum(jnp.sin(bd_attention(q, k, v, causal=causal)))

        g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
        g_bd = jax.jit(jax.grad(loss_bd, argnums=(0, 1, 2)))(q, k, v)
        err_g = max(
            float(jnp.max(jnp.abs(a - b_))) for a, b_ in zip(g_ref, g_bd)
        )
        ok = err_f < 5e-3 and err_g < 2e-2
        failures += not ok
        row = {
            "check": "bd_vs_xla", "shape": [b, l_q, l_k, h, e],
            "causal": causal, "max_err_fwd": err_f, "max_err_grad": err_g,
            "ok": ok,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # dropout: determinism + keep-rate + gradient self-consistency
    b, l, h, e = 64, 90, 8, 16
    q = jnp.asarray(rng.normal(size=(b, l, h, e)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, h, e)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, h, e)), jnp.float32)
    seed = jnp.asarray(42, jnp.int32)
    f = jax.jit(lambda q, s: bd_attention(q, k, v, dropout=0.3, seed=s))
    o1, o2 = f(q, seed), f(q, seed)
    o3 = f(q, jnp.asarray(43, jnp.int32))
    det = float(jnp.max(jnp.abs(o1 - o2)))
    diff = float(jnp.max(jnp.abs(o1 - o3)))
    o0 = jax.jit(lambda q: bd_attention(q, k, v))(q)
    ratio = float(jnp.mean(o1 * o0) / jnp.mean(o0 * o0))
    g1 = jax.jit(jax.grad(
        lambda q: jnp.sum(jnp.sin(bd_attention(q, k, v, dropout=0.3, seed=seed)))
    ))(q)
    g2 = jax.jit(jax.grad(
        lambda q: jnp.sum(jnp.sin(bd_attention(q, k, v, dropout=0.3, seed=seed)))
    ))(q)
    gdet = float(jnp.max(jnp.abs(g1 - g2)))
    ok = det == 0.0 and diff > 1e-3 and abs(ratio - 1.0) < 0.05 and gdet == 0.0
    failures += not ok
    row = {
        "check": "bd_dropout", "determinism_err": det, "seed_sensitivity": diff,
        "mean_keep_ratio": ratio, "grad_determinism_err": gdet, "ok": ok,
    }
    rows.append(row)
    print(json.dumps(row), flush=True)

    print(json.dumps({"check": "bd_check", "failures": failures}), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"failures": failures, "rows": rows}, f, indent=2)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
