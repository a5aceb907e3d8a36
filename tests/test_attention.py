"""Attention correctness tests against NumPy oracles.

- full_attention vs a hand-written softmax attention oracle,
- causal masking semantics,
- ProbSparse: equals full attention for selected queries when sampling covers
  all keys; non-selected queries get mean(V) (unmasked) or cumsum(V) (masked),
  per the reference's context-initialization rules (attn.py:128-158).
"""

import math

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
