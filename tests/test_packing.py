"""Tests for complex<->real packing, channel normalization, and AWGN.

Oracle semantics from reference ``Utils/dataset.py`` (LoadBatch, real2complex,
channelnorm, noise).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from channelestimationtransformer_tpu.data.packing import (
    awgn,
    channel_norm,
    complex_to_real,
    real_to_complex,
)


@pytest.fixture
def h():
    rng = np.random.default_rng(1)
    return (
        rng.normal(size=(3, 10, 2, 4)) + 1j * rng.normal(size=(3, 10, 2, 4))
    ).astype(np.complex64)


def test_complex_to_real_layout_matches_loadbatch(h):
    # LoadBatch: reshape to [M,T,Nr*Nt], then interleave (re, im) pairs.
    out = np.asarray(complex_to_real(jnp.asarray(h)))
    m, t, nr, nt = h.shape
    flat = h.reshape(m, t, nr * nt)
    expected = np.zeros((m, t, nr * nt, 2), dtype=np.float32)
    expected[..., 0] = flat.real
    expected[..., 1] = flat.imag
    expected = expected.reshape(m, t, nr * nt * 2)
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_real_to_complex_roundtrip(h):
    packed = complex_to_real(jnp.asarray(h))
    m, t, nr, nt = h.shape
    back = np.asarray(real_to_complex(packed))
    np.testing.assert_allclose(back, h.reshape(m, t, nr * nt), rtol=1e-6, atol=1e-6)


def test_channel_norm_unit_power(h):
    out = np.asarray(channel_norm(jnp.asarray(h[0])))
    np.testing.assert_allclose(np.mean(np.abs(out) ** 2), 1.0, rtol=1e-5)


def test_channel_norm_per_sample_axes(h):
    out = np.asarray(channel_norm(jnp.asarray(h), axis=(-3, -2, -1)))
    for i in range(h.shape[0]):
        np.testing.assert_allclose(np.mean(np.abs(out[i]) ** 2), 1.0, rtol=1e-5)


def test_awgn_snr_statistics():
    # Unit-power channel + AWGN at SNR -> measured SNR within ~0.2 dB.
    key = jax.random.key(0)
    rng = np.random.default_rng(2)
    h = (rng.normal(size=(64, 100, 2, 4)) + 1j * rng.normal(size=(64, 100, 2, 4))) / np.sqrt(2)
    h = jnp.asarray(h.astype(np.complex64))
    for snr_db in (0.0, 10.0, 21.0):
        noisy = awgn(key, h, snr_db)
        noise_power = float(jnp.mean(jnp.abs(noisy - h) ** 2))
        signal_power = float(jnp.mean(jnp.abs(h) ** 2))
        measured = 10 * np.log10(signal_power / noise_power)
        assert abs(measured - snr_db) < 0.2, (snr_db, measured)


def test_awgn_noise_scales_with_channel_rms():
    # Reference quirk: noise is scaled by channel RMS, so SNR is relative to
    # the actual signal power even for non-normalized channels.
    key = jax.random.key(3)
    rng = np.random.default_rng(4)
    base = (rng.normal(size=(32, 50, 2, 4)) + 1j * rng.normal(size=(32, 50, 2, 4)))
    h1 = jnp.asarray(base.astype(np.complex64))
    h2 = 10.0 * h1
    n1 = float(jnp.mean(jnp.abs(awgn(key, h1, 10.0) - h1) ** 2))
    n2 = float(jnp.mean(jnp.abs(awgn(key, h2, 10.0) - h2) ** 2))
    np.testing.assert_allclose(n2 / n1, 100.0, rtol=1e-3)
