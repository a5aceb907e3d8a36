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
