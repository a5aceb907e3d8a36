"""Tests for the MIMO link simulation blocks vs analytic expectations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from channelestimationtransformer_tpu.sim import (
    LinkConfig,
    lmmse_equalize,
    qam_constellation,
    qam_demap_hard,
    qam_llr,
    qam_map,
    simulate_ber,
    spectral_efficiency,
    zf_precoder,
)
from channelestimationtransformer_tpu.sim.precoding import (
    precoded_spectral_efficiency,
)


def test_qam_constellation_energy_and_size():
    for order in (4, 16, 64):
        c = np.asarray(qam_constellation(order))
        assert c.shape == (order,)
        np.testing.assert_allclose(np.mean(np.abs(c) ** 2), 1.0, rtol=1e-6)


def test_qam_map_demap_roundtrip():
    rng = np.random.default_rng(0)
    for order in (4, 16, 64):
        bits = jnp.asarray(rng.integers(0, 2, size=(3, 8 * int(np.log2(order)))), jnp.float32)
        syms = qam_map(bits, order)
        back = qam_demap_hard(syms, order)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(bits))


def test_qam_gray_labeling_neighbors_differ_one_bit():
    # Adjacent PAM levels along I differ in exactly one bit of the I half.
    c = np.asarray(qam_constellation(16))
    # Find pairs at minimum I-distance with equal Q, check Hamming distance.
    labels = np.arange(16)
    for a in range(16):
        for b in range(16):
            pa, pb = c[a], c[b]
            if abs(pa.imag - pb.imag) < 1e-6 and abs(abs(pa.real - pb.real) - np.sqrt(4/10)) < 1e-3:
                ham = bin(a ^ b).count("1")
                assert ham == 1, (a, b, ham)


def test_qam_llr_sign_matches_hard_decision():
    rng = np.random.default_rng(1)
    bits = jnp.asarray(rng.integers(0, 2, size=(64,)), jnp.float32)
    syms = qam_map(bits, 16)
    llr = qam_llr(syms, 16, noise_var=0.1)
    # Positive LLR = bit 0; hard bits from LLR sign must equal original bits.
    hard = (np.asarray(llr) < 0).astype(np.float32)
    np.testing.assert_array_equal(hard, np.asarray(bits))


def test_zf_precoder_diagonalizes():
    rng = np.random.default_rng(2)
    h = jnp.asarray(
        (rng.normal(size=(5, 2, 8)) + 1j * rng.normal(size=(5, 2, 8))).astype(np.complex64)
    )
    p = zf_precoder(h)
    eff = np.asarray(h @ p)
    for i in range(5):
        off = eff[i] - np.diag(np.diag(eff[i]))
        assert np.abs(off).max() < 1e-3 * np.abs(np.diag(eff[i])).max()


def test_spectral_efficiency_monotone_in_snr():
    rng = np.random.default_rng(3)
    h = jnp.asarray(
        (rng.normal(size=(4, 2, 8)) + 1j * rng.normal(size=(4, 2, 8))).astype(np.complex64)
    )
    se1 = np.asarray(spectral_efficiency(h, 1.0))
    se2 = np.asarray(spectral_efficiency(h, 100.0))
    assert (se2 > se1).all()
    # Perfect-CSI precoding not worse than mismatched precoding.
    h2 = h + 0.5 * jnp.asarray(
        (rng.normal(size=h.shape) + 1j * rng.normal(size=h.shape)).astype(np.complex64)
    )
    se_perfect = np.asarray(precoded_spectral_efficiency(h, h, 100.0)).mean()
    se_mismatch = np.asarray(precoded_spectral_efficiency(h, h2, 100.0)).mean()
    assert se_perfect >= se_mismatch


def test_ber_decreases_with_snr_and_perfect_csi_beats_noisy():
    rng = np.random.default_rng(4)
    h = jnp.asarray(
        (rng.normal(size=(32, 2, 8)) + 1j * rng.normal(size=(32, 2, 8))).astype(np.complex64)
        / np.sqrt(2)
    )
    key = jax.random.key(0)
    ber_lo, _ = simulate_ber(key, h, h, 0.0, LinkConfig(), 64)
    ber_hi, _ = simulate_ber(key, h, h, 15.0, LinkConfig(), 64)
    assert float(ber_hi) < float(ber_lo)
    assert float(ber_hi) < 0.02

    # Precoder-mismatch sensitivity at a 16-QAM operating point with nonzero
    # baseline BER: precoding on a noisy channel estimate must cost BER.
    cfg16 = LinkConfig(qam_order=16)
    ber_perfect, _ = simulate_ber(key, h, h, 6.0, cfg16, 256)
    h_noisy = h + 0.7 * jnp.asarray(
        (rng.normal(size=h.shape) + 1j * rng.normal(size=h.shape)).astype(np.complex64)
    )
    ber_mismatch, _ = simulate_ber(key, h, h_noisy, 6.0, cfg16, 256)
    assert float(ber_mismatch) > float(ber_perfect), (
        float(ber_perfect), float(ber_mismatch))


def test_time_domain_branch_matches_freq_statistics():
    """domain='time' (OFDM modulate -> tapped channel -> demodulate,
    reference KerasFullSimulation.py:253-276) is statistically equivalent to
    the flat frequency-domain model when the CP covers the delay spread."""
    rng = np.random.default_rng(7)
    h = jnp.asarray(
        (rng.normal(size=(64, 2, 8)) + 1j * rng.normal(size=(64, 2, 8))).astype(np.complex64)
        / np.sqrt(2)
    )
    key = jax.random.key(1)
    ber_f, _ = simulate_ber(key, h, h, 4.0, LinkConfig(), 128, domain="freq")
    ber_t, _ = simulate_ber(key, h, h, 4.0, LinkConfig(), 128, domain="time")
    # Same channel/bits, independent noise draws: BERs agree statistically.
    assert abs(float(ber_f) - float(ber_t)) < 0.01, (float(ber_f), float(ber_t))

    # Both must show the SNR trend.
    ber_t_hi, _ = simulate_ber(key, h, h, 15.0, LinkConfig(), 128, domain="time")
    assert float(ber_t_hi) < float(ber_t)


def test_ls_estimation_degrades_gracefully():
    """csi='ls' (pilot-based least squares, reference perfect_csi switch,
    KerasFullSimulation.py:200-231): worse than genie CSI at low SNR, and
    converging toward it as pilots get cleaner."""
    rng = np.random.default_rng(8)
    h = jnp.asarray(
        (rng.normal(size=(64, 2, 8)) + 1j * rng.normal(size=(64, 2, 8))).astype(np.complex64)
        / np.sqrt(2)
    )
    key = jax.random.key(2)
    cfg16 = LinkConfig(qam_order=16)
    ber_genie, _ = simulate_ber(key, h, h, 6.0, cfg16, 256, csi="perfect")
    ber_ls, _ = simulate_ber(key, h, h, 6.0, cfg16, 256, csi="ls")
    assert float(ber_ls) > float(ber_genie), (float(ber_ls), float(ber_genie))
    # At high SNR the LS estimate is nearly exact: both near zero.
    ber_ls_hi, _ = simulate_ber(key, h, h, 18.0, cfg16, 256, csi="ls")
    assert float(ber_ls_hi) < 0.01
    # LS composes with the time-domain branch.
    ber_ls_t, _ = simulate_ber(key, h, h, 6.0, cfg16, 256, csi="ls",
                               domain="time")
    assert abs(float(ber_ls_t) - float(ber_ls)) < 0.02
