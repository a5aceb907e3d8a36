"""Pallas kernel correctness in interpreter mode (CPU) vs reference ops.

On real TPU the same kernels compile natively; interpret=True exercises the
identical kernel logic in tests.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from channelestimationtransformer_tpu.models.attention import full_attention
from channelestimationtransformer_tpu.ops.pallas.attention import (
    _attn_kernel_small,
)
from channelestimationtransformer_tpu.ops.quant import (
    fixed_point_quantize,
    nearest_codeword,
)


def _mha_interpret(q, k, v, causal=False, group=2):
    """mha_attention with interpret=True plumbed in (CPU testing)."""
    import math

    b, l_q, h, e = q.shape
    l_k = k.shape[1]
    d = v.shape[-1]
    scale = 1.0 / math.sqrt(e)
    bh = b * h
    assert bh % group == 0
    qh = jnp.swapaxes(q, 1, 2).reshape(bh, l_q, e)
    kh = jnp.swapaxes(k, 1, 2).reshape(bh, l_k, e)
    vh = jnp.swapaxes(v, 1, 2).reshape(bh, l_k, d)
    kernel = functools.partial(
        _attn_kernel_small, scale=scale, causal=causal, l_q=l_q, l_k=l_k,
        group=group,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bh // group,),
        in_specs=[
            pl.BlockSpec((group, l_q, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, l_k, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, l_k, d), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((group, l_q, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, l_q, d), q.dtype),
        interpret=True,
    )(qh, kh, vh)
    return jnp.swapaxes(out.reshape(b, h, l_q, d), 1, 2)


@pytest.mark.parametrize("causal", [False, True])
def test_pallas_attention_matches_reference(causal):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 12, 2, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 12, 2, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 12, 2, 16)), jnp.float32)
    got = _mha_interpret(q, k, v, causal=causal)
    ref, _ = full_attention(q, k, v, mask_flag=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_pallas_codeword_kernel_logic():
    # The kernel's fori_loop scan must equal the vectorized argmin (ties to
    # lower-index codeword). Interpreted via plain jnp on the same logic.
    from channelestimationtransformer_tpu.ops.pallas.quant import _codeword_kernel

    cb = jnp.asarray([0.0, 1.0, 2.0, 4.0], jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 6, size=(4, 1024)), jnp.float32)
    out = pl.pallas_call(
        functools.partial(_codeword_kernel, cb_size=4),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=True,
    )(x, cb)
    ref = nearest_codeword(x, cb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_pallas_fixed_kernel_logic_nearest():
    from channelestimationtransformer_tpu.ops.pallas.quant import _fixed_kernel

    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 1024)) * 4, jnp.float32)
    out = pl.pallas_call(
        functools.partial(
            _fixed_kernel, scale=2.0**4, t_min=-8.0, t_max=8.0 - 2.0**-4,
            stochastic=False, clamp=True,
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=True,
    )(x, jnp.asarray([0], jnp.int32))
    ref = fixed_point_quantize(x, 8, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("causal", [False, True])
def test_pallas_attention_blhe_layout_matches_reference(causal):
    """The layout-native ([B, L, H, E], per-batch-cell) kernel path."""
    import math

    from channelestimationtransformer_tpu.ops.pallas.attention import (
        _attn_kernel_blhe,
    )

    rng = np.random.default_rng(3)
    b, l, h, e = 4, 12, 2, 16
    q = jnp.asarray(rng.normal(size=(b, l, h, e)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, h, e)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, h, e)), jnp.float32)
    kernel = functools.partial(
        _attn_kernel_blhe, scale=1 / math.sqrt(e), causal=causal, l_k=l,
        heads=h,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, l, h, e), lambda i: (i, 0, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, l, h, e), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, l, h, e), q.dtype),
        interpret=True,
    )(q, k, v)
    ref, _ = full_attention(q, k, v, mask_flag=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# Block-diagonal fused attention (ops/pallas/bd_attention.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "b,l_q,l_k,h,e,causal",
    [
        (4, 90, 90, 8, 16, False),   # flagship encoder layer
        (4, 15, 15, 8, 16, True),    # decoder self-attention
        (2, 15, 24, 8, 16, False),   # decoder cross-attention
        (4, 45, 45, 4, 32, False),   # d_model sweep shape
    ],
)
def test_bd_attention_forward_matches_reference(b, l_q, l_k, h, e, causal):
    from channelestimationtransformer_tpu.ops.pallas.bd_attention import (
        bd_attention,
        supported_shape,
    )

    rng = np.random.default_rng(10)
    q = jnp.asarray(rng.normal(size=(b, l_q, h, e)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l_k, h, e)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l_k, h, e)), jnp.float32)
    assert supported_shape(q, k, v)
    ref, _ = full_attention(q, k, v, mask_flag=causal)
    got = bd_attention(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_bd_attention_gradients_match_reference(causal):
    from channelestimationtransformer_tpu.ops.pallas.bd_attention import (
        bd_attention,
    )

    rng = np.random.default_rng(11)
    b, l, h, e = 2, 30, 4, 16
    q = jnp.asarray(rng.normal(size=(b, l, h, e)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, h, e)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, h, e)), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(full_attention(q, k, v, mask_flag=causal)[0]))

    def loss_got(q, k, v):
        return jnp.sum(jnp.sin(
            bd_attention(q, k, v, causal=causal, interpret=True)
        ))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_got, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_informer_use_pallas_matches_xla_path():
    """Full InformerStack forward with use_pallas=True equals the XLA path
    (deterministic mode; the kernels are exact to fp reassociation)."""
    from channelestimationtransformer_tpu.core.config import InformerConfig
    from channelestimationtransformer_tpu.models import build_informer

    cfg = dict(
        seq_len=24, label_len=6, pred_len=3, d_model=32, n_heads=4,
        e_layers=(2, 1), d_layers=2, d_ff=16, dropout=0.0,
    )
    m_xla = build_informer(InformerConfig(**cfg))
    m_pal = build_informer(InformerConfig(**cfg, use_pallas=True))
    rng = np.random.default_rng(12)
    x_enc = jnp.asarray(rng.normal(size=(4, 24, 16)), jnp.float32)
    x_dec = jnp.asarray(rng.normal(size=(4, 9, 16)), jnp.float32)
    variables = m_xla.init(jax.random.key(0), x_enc, x_dec)
    out_xla = m_xla.apply(variables, x_enc, x_dec)
    out_pal = m_pal.apply(variables, x_enc, x_dec)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_xla),
                               rtol=5e-4, atol=5e-5)
