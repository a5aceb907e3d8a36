"""Golden tests for the quantization ops vs NumPy oracles.

Oracle semantics from the reference C++ kernels (``quant_cpu.cpp``,
``sim_helper.cpp``) and the QAT CUDA partial variants.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from channelestimationtransformer_tpu.ops.quant import (
    BlockFloatingPoint,
    FixedPoint,
    FloatingPoint,
    WeightQuantSettings,
    apply_weight_quant,
    block_quantize,
    fibbinary_codebook,
    fibbinary_ints,
    fibonacci_quantize_partial,
    fibonacci_sequence_codebook,
    fixed_point_quantize,
    fixed_point_quantize_partial,
    float_quantize,
    lsq_fibbinary_codebook,
    lsq_quantize,
    nearest_codeword,
    no_adjacent_ones_quantize,
    quantizer,
    ste,
)
from channelestimationtransformer_tpu.ops.quant.lsq import lsq_step_size_init


# --- fixed point ----------------------------------------------------------


def _np_fixed(x, wl, fl, clamp=True, symmetric=False):
    res = 2.0 ** (-fl)
    q = np.round(x / res) * res  # numpy round = half-to-even, like nearbyint
    if clamp:
        t_min = -(2.0 ** (wl - fl - 1)) + (res if symmetric else 0.0)
        t_max = 2.0 ** (wl - fl - 1) - res
        q = np.clip(q, t_min, t_max)
    return q


def test_fixed_point_nearest_matches_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64,)).astype(np.float32) * 4
    for wl, fl in [(8, 4), (4, 2), (2, -2), (6, 5)]:
        got = np.asarray(fixed_point_quantize(jnp.asarray(x), wl, fl))
        np.testing.assert_allclose(got, _np_fixed(x, wl, fl), atol=1e-6, err_msg=f"{wl},{fl}")


def test_fixed_point_symmetric_bound():
    x = jnp.asarray([-10.0, 10.0])
    got = np.asarray(fixed_point_quantize(x, 4, 2, symmetric=True))
    np.testing.assert_allclose(got, [-1.75, 1.75])
    got = np.asarray(fixed_point_quantize(x, 4, 2, symmetric=False))
    np.testing.assert_allclose(got, [-2.0, 1.75])


def test_fixed_point_stochastic_rounding_statistics():
    # Value exactly between grid points rounds up ~50% of the time.
    x = jnp.full((10000,), 0.125)  # grid 0.25 for fl=2
    out = np.asarray(
        fixed_point_quantize(x, 8, 2, rounding="stochastic", key=jax.random.key(0))
    )
    frac_up = (out == 0.25).mean()
    assert 0.45 < frac_up < 0.55
    assert set(np.unique(out)) <= {0.0, 0.25}


def test_fixed_point_stochastic_is_unbiased():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(20000,)).astype(np.float32))
    out = np.asarray(
        fixed_point_quantize(x, 8, 2, rounding="stochastic", key=jax.random.key(1))
    )
    assert abs(float(np.mean(out - np.asarray(x)))) < 2e-3


# --- partial --------------------------------------------------------------


def test_partial_proximal_quantizes_fraction():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1000,)).astype(np.float32)
    for p in (0.25, 0.5, 0.9):
        out = np.asarray(
            fixed_point_quantize_partial(jnp.asarray(x), p, 8, 4, rounding="proximal")
        )
        q = _np_fixed(x, 8, 4)
        changed_to_q = np.isclose(out, q)
        # At least p of values are on the grid; untouched values are original.
        assert changed_to_q.mean() >= p - 0.02
        untouched = ~changed_to_q
        np.testing.assert_allclose(out[untouched], x[untouched], atol=1e-6)


def test_partial_proximal_picks_closest():
    # Elements already near the grid quantize first.
    x = jnp.asarray([0.001, 0.249, 0.13, 0.12])  # grid=0.25 (fl=2)
    out = np.asarray(fixed_point_quantize_partial(x, 0.5, 8, 2, rounding="proximal"))
    np.testing.assert_allclose(out[0], 0.0, atol=1e-6)  # closest -> quantized
    np.testing.assert_allclose(out[1], 0.25, atol=1e-6)
    np.testing.assert_allclose(out[2], 0.13, atol=1e-6)  # farthest -> kept


def test_partial_distant_picks_farthest():
    x = jnp.asarray([0.001, 0.249, 0.13, 0.12])
    out = np.asarray(fixed_point_quantize_partial(x, 0.5, 8, 2, rounding="distant"))
    np.testing.assert_allclose(out[2], 0.25, atol=1e-6)  # farthest -> quantized
    np.testing.assert_allclose(out[0], 0.001, atol=1e-6)  # closest -> kept


def test_partial_extremes():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(100,)).astype(np.float32))
    out0 = np.asarray(fixed_point_quantize_partial(x, 0.0, 8, 4, clamp=False))
    np.testing.assert_allclose(out0, np.asarray(x), atol=1e-6)
    out1 = np.asarray(fixed_point_quantize_partial(x, 1.0, 8, 4))
    np.testing.assert_allclose(out1, _np_fixed(np.asarray(x), 8, 4), atol=1e-6)


# --- codebooks ------------------------------------------------------------


def test_fibbinary_ints():
    # fibbinary: 0,1,2,4,5,8,9,10,16,... (no two adjacent 1 bits)
    got = fibbinary_ints(5).tolist()
    assert got == [0, 1, 2, 4, 5, 8, 9, 10, 16, 17, 18, 20, 21]


def test_fibonacci_sequence_codebook():
    cb = fibonacci_sequence_codebook(8, 0).tolist()
    # 1,1,2,3,5,8,13,21,34,55,89 up to 2^7=128 (unique-sorted)
    assert cb == [1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144][:-1] or cb == [1, 2, 3, 5, 8, 13, 21, 34, 55, 89]


def test_lsq_fibbinary_codebook_symmetric():
    cb = lsq_fibbinary_codebook(4).tolist()
    assert cb == [-5, -4, -2, -1, 0, 1, 2, 4, 5]
    assert all(-v in cb for v in cb)


def test_nearest_codeword():
    cb = jnp.asarray([0.0, 1.0, 2.0, 4.0])
    x = jnp.asarray([0.4, 0.6, 3.1, 100.0, -5.0])
    out = np.asarray(nearest_codeword(x, cb))
    np.testing.assert_allclose(out, [0.0, 1.0, 4.0, 4.0, 0.0])


def test_no_adjacent_ones_quantize():
    # wl=4, fl=0 codewords: 0,1,2,4,5,8,9,10
    out = np.asarray(no_adjacent_ones_quantize(jnp.asarray([2.9, 6.4, 11.0]), 4, 0))
    np.testing.assert_allclose(out, [2.0, 5.0, 10.0])


def test_fibonacci_partial_stochastic_fraction():
    rng = np.random.default_rng(4)
    x = jnp.asarray(np.abs(rng.normal(size=(2000,)).astype(np.float32)) * 4)
    out = np.asarray(
        fibonacci_quantize_partial(
            x, 4, 0, 0.5, rounding="stochastic", key=jax.random.key(2), clamp=False
        )
    )
    cb = fibbinary_codebook(4, 0)
    on_grid = np.isin(np.round(out, 5), np.round(cb, 5))
    assert 0.4 < on_grid.mean()  # ~50% quantized (+ those already near grid)


# --- block float / low-bit float ------------------------------------------


def test_block_quantize_shared_exponent():
    x = jnp.asarray([1.0, 0.5, 0.25, 100.0])
    out = np.asarray(block_quantize(x, 8))
    # max=100 -> exponent 6; grid = 2^(6-6) = 1.0
    np.testing.assert_allclose(out, [1.0, 0.0, 0.0, 100.0], atol=0.5)
    # With larger wl the small values survive.
    out16 = np.asarray(block_quantize(x, 16))
    np.testing.assert_allclose(out16, np.asarray(x), rtol=0.01)


def test_float_quantize_bf16_equivalent():
    # exp=8, man=7 == bfloat16; compare against jnp bfloat16 cast.
    rng = np.random.default_rng(5)
    x = rng.normal(size=(256,)).astype(np.float32)
    got = np.asarray(float_quantize(jnp.asarray(x), 8, 7))
    ref = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=1e-6)


def test_float_quantize_range_clamp():
    # fp8 e4m3-ish: exp=4, man=3 -> max normal 240 (2^7 * 1.875)
    out = float(float_quantize(jnp.asarray([1e9]), 4, 3)[0])
    assert out <= 2.0 ** 8


# --- STE / quantizer ------------------------------------------------------


def test_ste_gradient_is_identity():
    f = lambda x: jnp.sum(ste(x, lambda v: fixed_point_quantize(v, 4, 2)))
    g = jax.grad(f)(jnp.asarray([0.3, 0.7, 1.2]))
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_quantizer_forward_and_backward_formats():
    q = quantizer(
        forward_number=FixedPoint(wl=8, fl=4),
        backward_number=FixedPoint(wl=8, fl=2),
    )
    x = jnp.asarray([0.33, 1.77])
    out = q(x)
    np.testing.assert_allclose(np.asarray(out), _np_fixed(np.asarray(x), 8, 4), atol=1e-6)
    # Backward grad is quantized on the fl=2 grid.
    g = jax.grad(lambda v: jnp.sum(q(v) * jnp.asarray([0.13, 0.88])))(x)
    np.testing.assert_allclose(np.asarray(g), _np_fixed(np.asarray([0.13, 0.88]), 8, 2), atol=1e-6)


def test_quantizer_clamping_grad_zero():
    q = quantizer(
        forward_number=FixedPoint(wl=4, fl=2),  # range [-2, 1.75]
        clamping_grad_zero=True,
    )
    x = jnp.asarray([0.5, 5.0])  # second clamps
    g = jax.grad(lambda v: jnp.sum(q(v)))(x)
    np.testing.assert_allclose(np.asarray(g), [1.0, 0.0])


# --- LSQ ------------------------------------------------------------------


def test_lsq_quantize_value_semantics():
    w = jnp.asarray([[0.3, -0.7], [0.11, 0.9]])
    s0 = lsq_step_size_init(w, nbits=4)
    np.testing.assert_allclose(
        float(s0), float(np.mean(np.abs(np.asarray(w)))) / math.sqrt(7), rtol=1e-6
    )
    wq = np.asarray(lsq_quantize(w, s0, 4))
    # Every value is an integer multiple of s0 within [-8, 7]*s0.
    ratio = wq / float(s0)
    np.testing.assert_allclose(ratio, np.round(ratio), atol=1e-4)
    assert ratio.min() >= -8 and ratio.max() <= 7


def test_lsq_gradients_flow_to_weight_and_step():
    w = jnp.asarray([[0.3, -0.7], [0.11, 0.9]])
    s = lsq_step_size_init(w, nbits=4)
    gw = jax.grad(lambda w_: jnp.sum(lsq_quantize(w_, s, 4)))(w)
    gs = jax.grad(lambda s_: jnp.sum(lsq_quantize(w, s_, 4)))(s)
    assert np.isfinite(np.asarray(gw)).all()
    assert np.isfinite(float(gs))


def test_lsq_fibbinary_values_on_codebook():
    w = jnp.asarray(np.random.default_rng(6).normal(size=(32, 32)).astype(np.float32))
    s = lsq_step_size_init(w, nbits=6)
    cb = lsq_fibbinary_codebook(6)
    wq = np.asarray(lsq_quantize(w, s, 6, cb))
    ratio = np.round(wq / float(s), 4)
    assert np.isin(ratio, np.round(cb, 4)).all()


# --- OptimLP equivalent ---------------------------------------------------


def test_weight_quant_settings_validation():
    params = {"dense": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones(2)}}
    WeightQuantSettings({"dense/kernel": lambda w, p, k: w}, params)
    with pytest.raises(ValueError):
        WeightQuantSettings({"nope/kernel": lambda w, p, k: w}, params)


def test_apply_weight_quant_only_touches_configured():
    params = {
        "a": {"kernel": jnp.asarray([0.3, 0.7])},
        "b": {"kernel": jnp.asarray([0.3, 0.7])},
    }
    settings = WeightQuantSettings(
        {"a/kernel": lambda w, p, k: fixed_point_quantize(w, 4, 1)}, params
    )
    out = apply_weight_quant(params, settings, percentage=1.0)
    np.testing.assert_allclose(np.asarray(out["a"]["kernel"]), [0.5, 0.5])
    np.testing.assert_allclose(np.asarray(out["b"]["kernel"]), [0.3, 0.7])
