"""Native C++ library vs NumPy/JAX oracle equivalence."""

import numpy as np
import pytest

from channelestimationtransformer_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built and no toolchain"
)


def test_fixed_point_nearest_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(257,)).astype(np.float32) * 4
    got = native.fixed_point_quantize(x, 8, 4)
    res = 2.0 ** -4
    exp = np.clip(np.round(x / res) * res, -(2.0 ** 3), 2.0 ** 3 - res)
    np.testing.assert_allclose(got, exp.astype(np.float32), atol=1e-6)


def test_fixed_point_stochastic_unbiased():
    x = np.full(20000, 0.125, dtype=np.float32)
    got = native.fixed_point_quantize(x, 8, 2, rounding="stochastic", seed=7)
    frac = (got == 0.25).mean()
    assert 0.45 < frac < 0.55


def test_partial_matches_jax_semantics():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(500,)).astype(np.float32)
    got = native.fixed_point_quantize_partial(x, 0.5, 8, 4, proximal=True)
    res = 2.0 ** -4
    q = np.round(x / res) * res
    onto = np.isclose(got, np.clip(q, -8, 8 - res)).mean()
    assert onto >= 0.48


def test_nearest_codeword():
    cb = np.array([0.0, 1.0, 2.0, 4.0], np.float32)
    x = np.array([0.4, 0.6, 3.1, 100.0, -5.0], np.float32)
    np.testing.assert_allclose(
        native.nearest_codeword(x, cb), [0.0, 1.0, 4.0, 4.0, 0.0]
    )


def test_fibbinary_ints_matches_python():
    got = native.fibbinary_ints(5).tolist()
    assert got == [0, 1, 2, 4, 5, 8, 9, 10, 16, 17, 18, 20, 21]


def test_pack_windows_matches_loadbatch_layout():
    rng = np.random.default_rng(2)
    h = (rng.normal(size=(3, 12, 2, 4)) + 1j * rng.normal(size=(3, 12, 2, 4))).astype(np.complex64)
    starts = np.array([0, 3, 5], dtype=np.int64)
    out = native.pack_windows(h, starts, win_len=6)
    assert out.shape == (3, 6, 16)
    for i, s in enumerate(starts):
        flat = h[i, s : s + 6].reshape(6, 8)
        exp = np.stack([flat.real, flat.imag], axis=-1).reshape(6, 16)
        np.testing.assert_allclose(out[i], exp, rtol=1e-6)
