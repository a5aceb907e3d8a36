"""Ring attention: sequence-parallel exact attention via ppermute KV rotation.

The reference has no sequence/context parallelism (sequences are <= 100 slots,
SURVEY §5.7); this is the designed-in TPU-native mechanism for the streaming /
long-window configurations: shard the sequence axis over the ``seq`` mesh
axis, keep Q local, and rotate the K/V shards around the ring with
``jax.lax.ppermute`` while accumulating a streaming (flash-style) softmax —
exact attention, O(L/P) memory per device, and the KV hop rides the ICI ring
concurrently with the local block's compute (XLA overlaps the ppermute with
the matmuls).

Causality across shards is handled with global position offsets derived from
``jax.lax.axis_index``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _block_attend(q, k, v, q_off, k_off, scale, causal):
    """Scores/partial-softmax stats for one (Q-local, K-block) pair.

    q: [B, Lq, H, E], k/v: [B, Lk, H, E/D]. Returns (numerator [B,Lq,H,D],
    running max [B,Lq,H], denom [B,Lq,H]).
    """
    scores = jnp.einsum("blhe,bshe->blhs", q, k) * scale  # [B, Lq, H, Lk]
    if causal:
        l_q, l_k = q.shape[1], k.shape[1]
        qi = q_off + jnp.arange(l_q)[:, None]
        ki = k_off + jnp.arange(l_k)[None, :]
        mask = ki > qi  # [Lq, Lk] disallowed
        scores = jnp.where(mask[None, :, None, :], NEG_INF, scores)
    m = jnp.max(scores, axis=-1)  # [B, Lq, H]
    e = jnp.exp(scores - m[..., None])
    denom = jnp.sum(e, axis=-1)
    num = jnp.einsum("blhs,bshd->blhd", e, v)
    return num, m, denom


def _ring_attention_local(q, k, v, *, axis_name: str, scale, causal: bool):
    """Per-shard body (inside shard_map). q/k/v: local shards [B, L/P, H, E]."""
    p = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    l_loc = q.shape[1]
    q_off = my * l_loc

    def step(carry, i):
        k_cur, v_cur, num, m, denom = carry
        # The shard currently held started at ring position (my - i) mod p.
        src = (my - i) % p
        k_off = src * l_loc
        n_i, m_i, d_i = _block_attend(q, k_cur, v_cur, q_off, k_off, scale, causal)
        # Streaming softmax merge.
        new_m = jnp.maximum(m, m_i)
        alpha = jnp.exp(m - new_m)
        beta = jnp.exp(m_i - new_m)
        num = num * alpha[..., None] + n_i * beta[..., None]
        denom = denom * alpha + d_i * beta
        # Rotate KV to the next device (receive from the left neighbor).
        perm = [(j, (j + 1) % p) for j in range(p)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, num, new_m, denom), None

    b, _, h, e = q.shape
    d = v.shape[-1]
    # pvary: the accumulators become device-varying over the ring axis (the
    # scan body mixes in axis_index-dependent values), so the carry must start
    # with matching varying-axis types.
    vary = lambda x: jax.lax.pcast(x, axis_name, to="varying")
    init = (
        k, v,
        vary(jnp.zeros((b, l_loc, h, d), q.dtype)),
        vary(jnp.full((b, l_loc, h), NEG_INF, q.dtype)),
        vary(jnp.zeros((b, l_loc, h), q.dtype)),
    )
    (k_f, v_f, num, m, denom), _ = jax.lax.scan(
        step, init, jnp.arange(p)
    )
    return num / jnp.maximum(denom, 1e-30)[..., None]


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    axis_name: str = "seq",
    causal: bool = False,
    scale=None,
):
    """Exact attention with the sequence axis sharded over ``axis_name``.

    Inputs ``[B, L, H, E]`` (global view); L must divide by the axis size.
    Returns the globally-sharded ``[B, L, H, D]`` output.
    """
    e = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(e)
    spec = P(None, axis_name, None, None)
    fn = jax.shard_map(
        functools.partial(
            _ring_attention_local, axis_name=axis_name, scale=scale, causal=causal
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
