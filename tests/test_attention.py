"""Attention correctness tests against NumPy oracles.

- full_attention vs a hand-written softmax attention oracle,
- causal masking semantics,
- ProbSparse: equals full attention for selected queries when sampling covers
  all keys; non-selected queries get mean(V) (unmasked) or cumsum(V) (masked),
  per the reference's context-initialization rules (attn.py:128-158).
"""

import math
import re

import jax
import jax.numpy as jnp
import numpy as np

from channelestimationtransformer_tpu.models.attention import (
    causal_mask,
    full_attention,
    prob_sparse_attention,
)


def _np_attention(q, k, v, causal=False):
    b, l, h, e = q.shape
    s = k.shape[1]
    scores = np.einsum("blhe,bshe->bhls", q, k) / math.sqrt(e)
    if causal:
        mask = np.triu(np.ones((l, s), dtype=bool), k=1)
        scores = np.where(mask[None, None], -1e30, scores)
    scores = scores - scores.max(axis=-1, keepdims=True)
    a = np.exp(scores)
    a = a / a.sum(axis=-1, keepdims=True)
    return np.einsum("bhls,bshd->blhd", a, v)


def _qkv(rng, b=2, l=12, s=12, h=2, e=8):
    q = rng.normal(size=(b, l, h, e)).astype(np.float32)
    k = rng.normal(size=(b, s, h, e)).astype(np.float32)
    v = rng.normal(size=(b, s, h, e)).astype(np.float32)
    return q, k, v


def test_full_attention_matches_oracle():
    rng = np.random.default_rng(0)
    q, k, v = _qkv(rng)
    out, _ = full_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask_flag=False)
    np.testing.assert_allclose(np.asarray(out), _np_attention(q, k, v), rtol=2e-4, atol=2e-5)


def test_full_attention_causal():
    rng = np.random.default_rng(1)
    q, k, v = _qkv(rng)
    out, _ = full_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask_flag=True)
    np.testing.assert_allclose(
        np.asarray(out), _np_attention(q, k, v, causal=True), rtol=2e-4, atol=2e-5
    )
    # First position attends only to itself -> output = v[0].
    np.testing.assert_allclose(np.asarray(out)[:, 0], v[:, 0], rtol=1e-4, atol=1e-5)


def test_causal_mask_shape_and_content():
    m = np.asarray(causal_mask(4, 6))
    assert m.shape == (4, 6)
    assert not m[0, 0] and m[0, 1] and not m[3, 3] and m[3, 4]


def test_prob_attention_unselected_queries_get_mean_v():
    rng = np.random.default_rng(2)
    # factor=1, L=12 -> n_top = ceil(ln 12) = 3 selected queries of 12.
    q, k, v = _qkv(rng, l=12, s=12)
    out, _ = prob_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        mask_flag=False, factor=1, sample_rng=jax.random.key(0),
    )
    out = np.asarray(out)
    mean_v = v.mean(axis=1)  # [B, H, E] with axis order b, s->mean, h, e
    # Count positions equal to mean(V): should be L - n_top = 9 per (b, h).
    n_top = 1 * math.ceil(math.log(12))
    for b in range(2):
        for h in range(2):
            eq = np.isclose(out[b, :, h, :], mean_v[b, h], atol=1e-5).all(axis=-1)
            assert eq.sum() == 12 - n_top, eq.sum()


def test_prob_attention_selected_match_full_when_factor_large():
    # With factor >= L / ceil(ln L), all queries are selected and every sampled
    # score row sees enough keys that top-k selection covers everything; the
    # final scores use ALL keys, so selected outputs equal dense attention.
    rng = np.random.default_rng(3)
    q, k, v = _qkv(rng, l=10, s=10)
    out, _ = prob_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        mask_flag=False, factor=100, sample_rng=jax.random.key(1),
    )
    np.testing.assert_allclose(np.asarray(out), _np_attention(q, k, v), rtol=2e-4, atol=2e-5)


def test_prob_attention_masked_cumsum_context():
    rng = np.random.default_rng(4)
    q, k, v = _qkv(rng, l=12, s=12)
    out, _ = prob_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        mask_flag=True, factor=1, sample_rng=jax.random.key(2),
    )
    out = np.asarray(out)
    # Non-selected positions hold cumsum(V); position 0 is cumsum row 0 == v[0]
    # unless selected. At least L - n_top of 12 rows must match cumsum rows.
    cum = np.cumsum(v, axis=1)  # [B, S, H, E]
    n_top = math.ceil(math.log(12))
    for b in range(2):
        for h in range(2):
            eq = np.isclose(out[b, :, h, :], cum[b, :, h, :], atol=1e-5).all(axis=-1)
            assert eq.sum() >= 12 - n_top


def test_prob_attention_masked_full_factor_matches_causal_dense():
    rng = np.random.default_rng(5)
    q, k, v = _qkv(rng, l=10, s=10)
    out, _ = prob_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        mask_flag=True, factor=100, sample_rng=jax.random.key(3),
    )
    np.testing.assert_allclose(
        np.asarray(out), _np_attention(q, k, v, causal=True), rtol=2e-4, atol=2e-5
    )


def test_prob_attention_dense_gather_matches_key_gather():
    """The short-sequence dense-QK^T gather formulation must be numerically
    equivalent to the long-sequence key-gather formulation (identical math:
    qk[l, s] = q_l . k_{idx[l, s]}); the threshold at l_k=256 only switches
    the compute layout, never the result."""

    rng = np.random.default_rng(7)
    q, k, v = _qkv(rng, b=2, l=300, s=300, h=2, e=8)
    key = jax.random.key(3)
    # Force the key-gather path (the memory-fallback layout) — the measured
    # default now keeps the dense layout well past l=300.
    long_out, _ = prob_sparse_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        mask_flag=False, factor=3, sample_rng=key, dense_layout=False,
    )
    # Dense-gather path: l_k exactly at the 256 boundary.
    q2, k2, v2 = _qkv(rng, b=2, l=256, s=256, h=2, e=8)
    dense_out, _ = prob_sparse_attention(
        jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2),
        mask_flag=False, factor=3, sample_rng=key,
    )
    # Oracle: key-gather formulation computed in NumPy with the same RNG draw.
    l_q = l_k = 256
    sample_k = min(3 * math.ceil(math.log(l_k)), l_k)
    n_top = min(3 * math.ceil(math.log(l_q)), l_q)
    idx = np.asarray(jax.random.randint(key, (l_q, sample_k), 0, l_k))
    q_ = np.swapaxes(q2, 1, 2)
    k_ = np.swapaxes(k2, 1, 2)
    v_ = np.swapaxes(v2, 1, 2)
    k_s = k_[:, :, idx]
    qk = np.einsum("bhle,bhlse->bhls", q_, k_s)
    m = qk.max(-1) - qk.sum(-1) / l_k
    m_top = np.argsort(-m, axis=-1, kind="stable")[..., :n_top]
    # (top_k ties can reorder; compare the *context output*, which is
    # permutation-invariant in the selected set.)
    scores = np.einsum(
        "bhue,bhke->bhuk", np.take_along_axis(q_, m_top[..., None], 2), k_
    ) / math.sqrt(8)
    a = np.exp(scores - scores.max(-1, keepdims=True))
    a = a / a.sum(-1, keepdims=True)
    upd = np.einsum("bhuk,bhkd->bhud", a, v_)
    ctx = np.broadcast_to(v_.mean(-2, keepdims=True), v_.shape).copy()
    np.put_along_axis(ctx, np.broadcast_to(m_top[..., None], upd.shape), upd, 2)
    np.testing.assert_allclose(
        np.asarray(dense_out), np.swapaxes(ctx, 1, 2), rtol=2e-4, atol=2e-5
    )
    assert long_out.shape == (2, 300, 2, 8)
    # Long-path numerics (ADVICE r4): the same NumPy key-gather oracle at
    # l=300 checks the l_k>256 branch's values, not just its shape.
    np.testing.assert_allclose(
        np.asarray(long_out),
        _np_prob_keygather_oracle(q, k, v, key, factor=3),
        rtol=2e-4, atol=2e-5,
    )


def test_prob_dense_layout_compiles_scatter_free():
    """Regression guard for the round-5 throughput fix (DESIGN.md §14): the
    dense-layout ProbSparse fwd+bwd must contain NO scatter ops — the
    put_along_axis write-back cost ~27 ms/call on TPU v5e and was 90% of the
    prob train step. The key-gather long path legitimately scatters."""
    key = jax.random.key(0)
    q = jnp.zeros((4, 90, 2, 16))

    def loss(q, k, v, dense):
        return jnp.sum(prob_sparse_attention(
            q, k, v, mask_flag=False, factor=5, sample_rng=key,
            dense_layout=dense,
        )[0])

    # Match scatter *instructions* (`... = f32[...] scatter(...)`), not the
    # compile-cache target-feature string ("+prefer-no-scatter") that can
    # appear in cached executables' as_text().
    scatter_op = re.compile(r"\bscatter(-add)?\(")
    dense_hlo = (jax.jit(jax.grad(lambda q, k, v: loss(q, k, v, True)))
                 .lower(q, q, q).compile().as_text())
    assert not scatter_op.search(dense_hlo)
    gather_hlo = (jax.jit(jax.grad(lambda q, k, v: loss(q, k, v, False)))
                  .lower(q, q, q).compile().as_text())
    assert scatter_op.search(gather_hlo)  # sanity: the guard detects them


def test_prob_layout_switch_is_memory_aware(monkeypatch):
    """The dense/gather decision keys on the [B,H,L_Q,L_K] scores footprint
    (DENSE_SCORES_ELEM_BUDGET), not just length: shrinking the budget must
    flip the same shape onto the scatter-bearing key-gather path."""
    import channelestimationtransformer_tpu.models.attention as A

    key = jax.random.key(0)
    q = jnp.zeros((4, 90, 2, 16))

    def hlo():
        f = jax.jit(jax.grad(lambda q, k, v: jnp.sum(prob_sparse_attention(
            q, k, v, mask_flag=False, factor=5, sample_rng=key)[0])))
        return f.lower(q, q, q).compile().as_text()

    scatter_op = re.compile(r"\bscatter(-add)?\(")
    assert not scatter_op.search(hlo())  # fits budget -> dense
    monkeypatch.setattr(A, "DENSE_SCORES_ELEM_BUDGET", 1)
    assert scatter_op.search(hlo())  # over budget -> key-gather


def _np_prob_keygather_oracle(q, k, v, key, *, factor):
    """NumPy key-gather ProbSparse (unmasked) with the same RNG draw."""
    l_q, l_k, e = q.shape[1], k.shape[1], q.shape[-1]
    sample_k = min(factor * math.ceil(math.log(l_k)), l_k)
    n_top = min(factor * math.ceil(math.log(l_q)), l_q)
    idx = np.asarray(jax.random.randint(key, (l_q, sample_k), 0, l_k))
    q_ = np.swapaxes(q, 1, 2)
    k_ = np.swapaxes(k, 1, 2)
    v_ = np.swapaxes(v, 1, 2)
    qk = np.einsum("bhle,bhlse->bhls", q_, k_[:, :, idx])
    m = qk.max(-1) - qk.sum(-1) / l_k
    m_top = np.argsort(-m, axis=-1, kind="stable")[..., :n_top]
    scores = np.einsum(
        "bhue,bhke->bhuk", np.take_along_axis(q_, m_top[..., None], 2), k_
    ) / math.sqrt(e)
    a = np.exp(scores - scores.max(-1, keepdims=True))
    a = a / a.sum(-1, keepdims=True)
    upd = np.einsum("bhuk,bhkd->bhud", a, v_)
    ctx = np.broadcast_to(v_.mean(-2, keepdims=True), v_.shape).copy()
    np.put_along_axis(ctx, np.broadcast_to(m_top[..., None], upd.shape), upd, 2)
    return np.swapaxes(ctx, 1, 2)
