"""Microbenchmark: where ProbSparse attention's train-step time goes.

The round-4 measurement had the prob train step at ~240 ms/batch vs ~11 ms for
the full-attention path (logs/r4f_prob3.log) without a profile. This driver
times prob_sparse_attention fwd and fwd+bwd at the exact flagship shapes
(encoder [256,90,8,16] unmasked, decoder [256,15,8,16] masked) against
full_attention, then ablates the prob op piece by piece (sampled-score einsum,
top_k, selected-row einsum, softmax-update, put_along_axis scatter) to find
the hot component. Value-fetch barrier per bench.py (block_until_ready returns
early on the tunneled axon runtime).

Output: one JSON line per row; artifact written to
experiments/artifacts/prob_profile.json.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from channelestimationtransformer_tpu.core.runtime import setup as _rt_setup
_rt_setup()
import jax.numpy as jnp
import numpy as np

from channelestimationtransformer_tpu.models.attention import (
    full_attention,
    prob_sparse_attention,
)

REPS = 10


def timeit(fn, *args):
    out = fn(*args)
    jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
        times.append((time.perf_counter() - t0) / REPS)
    return statistics.median(times) * 1000  # ms


def prob_pieces(q, k, v, *, mask_flag, factor, rng, upto):
    """Re-run prob attention but stop after stage `upto` (1..5)."""
    b, l_q, h, e = q.shape
    l_k = k.shape[1]
    q_ = jnp.swapaxes(q, 1, 2)
    k_ = jnp.swapaxes(k, 1, 2)
    v_ = jnp.swapaxes(v, 1, 2)
    sample_k = min(factor * math.ceil(math.log(l_k)), l_k)
    n_top = min(factor * math.ceil(math.log(l_q)), l_q)
    index_sample = jax.random.randint(rng, (l_q, sample_k), 0, l_k)
    qk_full = jnp.einsum("bhle,bhse->bhls", q_, k_)
    onehot = (index_sample[..., None] == jnp.arange(l_k)[None, None]).astype(q_.dtype)
    qk_sample = jnp.einsum("bhlk,lsk->bhls", qk_full, onehot)
    if upto == 1:
        return qk_sample
    m = jnp.max(qk_sample, axis=-1) - jnp.sum(qk_sample, axis=-1) / l_k
    _, m_top = jax.lax.top_k(m, n_top)
    if upto == 2:
        return m_top.astype(q.dtype) * 1e-6 + jnp.sum(qk_sample)
    sel = (m_top[..., None] == jnp.arange(l_q)[None, None, None]).astype(q_.dtype)
    scores = jnp.einsum("bhul,bhlk->bhuk", sel, qk_full) / math.sqrt(e)
    if upto == 3:
        return scores
    if mask_flag:
        cm = jnp.triu(jnp.ones((l_q, l_k), dtype=bool), k=1)
        scores = jnp.where(cm[m_top], float(jnp.finfo(jnp.float32).min), scores)
        context = jnp.cumsum(v_, axis=-2)
    else:
        context = jnp.broadcast_to(
            jnp.mean(v_, axis=-2, keepdims=True), (b, h, l_q, v_.shape[-1])
        )
    attn = jax.nn.softmax(scores, axis=-1)
    update = jnp.einsum("bhuk,bhkd->bhud", attn, v_)
    if upto == 4:
        return update + jnp.sum(context) * 0.0
    context = jnp.put_along_axis(
        context,
        jnp.broadcast_to(m_top[..., None], (*m_top.shape, v_.shape[-1])),
        update.astype(context.dtype),
        axis=2,
        inplace=False,
    )
    return jnp.swapaxes(context, 1, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "artifacts", "prob_profile.json"))
    args = ap.parse_args()
    rows = {}

    def rec(name, val):
        rows[name] = val
        print(json.dumps({name: round(val, 3)}), flush=True)
    rng = np.random.default_rng(0)
    key = jax.random.key(7)
    dtype = jnp.float32

    def mk(b, l, h, e):
        return tuple(
            jnp.asarray(rng.normal(size=(b, l, h, e)), dtype) for _ in range(3)
        )

    enc = mk(256, 90, 8, 16)   # encoder top level
    dec = mk(256, 15, 8, 16)   # decoder self-attn

    # --- forward-only comparisons ---
    full_f = jax.jit(lambda q, k, v: full_attention(q, k, v, mask_flag=False)[0])
    prob_f = jax.jit(
        lambda q, k, v: prob_sparse_attention(
            q, k, v, mask_flag=False, factor=5, sample_rng=key
        )[0]
    )
    rec("fwd_full_enc", timeit(full_f, *enc))
    rec("fwd_prob_enc", timeit(prob_f, *enc))

    prob_f_dec = jax.jit(
        lambda q, k, v: prob_sparse_attention(
            q, k, v, mask_flag=True, factor=5, sample_rng=key
        )[0]
    )
    full_f_dec = jax.jit(lambda q, k, v: full_attention(q, k, v, mask_flag=True)[0])
    rec("fwd_full_dec", timeit(full_f_dec, *dec))
    rec("fwd_prob_dec", timeit(prob_f_dec, *dec))

    # --- fwd+bwd comparisons ---
    def grad_of(fn):
        return jax.jit(jax.grad(lambda q, k, v: jnp.sum(fn(q, k, v))))

    rec("bwd_full_enc", timeit(grad_of(lambda q, k, v: full_attention(
        q, k, v, mask_flag=False)[0]), *enc))
    rec("bwd_prob_enc", timeit(grad_of(lambda q, k, v: prob_sparse_attention(
        q, k, v, mask_flag=False, factor=5, sample_rng=key)[0]), *enc))
    rec("bwd_full_dec", timeit(grad_of(lambda q, k, v: full_attention(
        q, k, v, mask_flag=True)[0]), *dec))
    rec("bwd_prob_dec", timeit(grad_of(lambda q, k, v: prob_sparse_attention(
        q, k, v, mask_flag=True, factor=5, sample_rng=key)[0]), *dec))

    # --- stage ablation (fwd+bwd), encoder shape ---
    for upto, name in [(1, "qk_sample"), (2, "topk"), (3, "sel_scores"),
                       (4, "softmax_update"), (5, "scatter_full")]:
        fn = grad_of(
            lambda q, k, v, u=upto: prob_pieces(
                q, k, v, mask_flag=False, factor=5, rng=key, upto=u
            )
        )
        rec(f"bwd_enc_upto_{upto}_{name}", timeit(fn, *enc))
        fn = grad_of(
            lambda q, k, v, u=upto: prob_pieces(
                q, k, v, mask_flag=True, factor=5, rng=key, upto=u
            )
        )
        rec(f"bwd_dec_upto_{upto}_{name}", timeit(fn, *dec))

    with open(args.out, "w") as f:
        json.dump({k_: round(v_, 4) for k_, v_ in rows.items()}, f, indent=2)


if __name__ == "__main__":
    main()
