"""Tests for sim/coding.py (conv FEC + Viterbi) and sim/ofdm.py (time-domain
OFDM channel path). Reference capabilities: the LDPC-coded link and the
``domain=='time'`` branch of ``MimoSimulation/KerasFullSimulation.py``."""

import jax
import jax.numpy as jnp
import numpy as np

from channelestimationtransformer_tpu.sim.coding import (
    conv_encode,
    viterbi_decode,
)
from channelestimationtransformer_tpu.sim.ofdm import (
    apply_time_channel,
    ofdm_demodulate,
    ofdm_modulate,
    taps_to_frequency_response,
)


def _ref_conv_encode(bits):
    """Bit-by-bit NumPy shift-register encoder (golden reference)."""
    g = (0o133, 0o171)
    reg = 0
    out = []
    for b in list(bits) + [0] * 6:
        full = ((reg << 1) | int(b)) & 0x7F
        for gi in g:
            out.append(bin(full & gi).count("1") & 1)
        reg = full & 0x3F
    return np.array(out)


def test_conv_encode_matches_shift_register():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 40)
    got = np.asarray(conv_encode(jnp.asarray(bits)))
    np.testing.assert_array_equal(got, _ref_conv_encode(bits))


def test_viterbi_noiseless_roundtrip():
    rng = np.random.default_rng(1)
    bits = jnp.asarray(rng.integers(0, 2, (3, 64)))
    coded = conv_encode(bits)
    llr = (1.0 - 2.0 * coded).astype(jnp.float32) * 4.0  # perfect LLRs
    decoded = viterbi_decode(llr, num_bits=64)
    np.testing.assert_array_equal(np.asarray(decoded), np.asarray(bits))


def test_viterbi_corrects_noise():
    """At Eb/N0 where uncoded BPSK has ~2e-2 BER, the K=7 code must decode
    (nearly) error-free — the standard ~5 dB coding gain."""
    rng = np.random.default_rng(2)
    n, batch = 256, 16
    bits = jnp.asarray(rng.integers(0, 2, (batch, n)))
    coded = conv_encode(bits)
    x = 1.0 - 2.0 * coded.astype(np.float32)  # BPSK
    ebno_db = 4.0
    # rate-1/2: Es/N0 = Eb/N0 * R
    sigma2 = 1.0 / (2 * 0.5 * 10 ** (ebno_db / 10))
    y = x + jnp.asarray(rng.normal(size=x.shape) * np.sqrt(sigma2), jnp.float32)
    llr = 2.0 * y / sigma2
    decoded = viterbi_decode(llr, num_bits=n)
    ber_coded = float(jnp.mean(decoded != bits))
    # uncoded hard-decision BER at the same Eb/N0 (Q(sqrt(2*EbN0)) ~ 1.2e-2)
    assert ber_coded < 1e-3, ber_coded


def test_viterbi_is_jittable_static():
    bits = jnp.zeros((2, 32), jnp.int32)
    coded = conv_encode(bits)
    llr = (1.0 - 2.0 * coded).astype(jnp.float32)
    fn = jax.jit(lambda l: viterbi_decode(l, num_bits=32))
    out = fn(llr)
    assert out.shape == (2, 32)


def test_time_domain_equals_frequency_domain():
    """CP >= delay spread => demod(time-channel(mod(x))) == H .* x exactly
    (the invariant linking the reference's two simulation branches)."""
    rng = np.random.default_rng(3)
    fft_size, cp_len, num_taps, num_sym = 64, 16, 9, 5
    x = jnp.asarray(
        rng.normal(size=(2, num_sym, fft_size)) + 1j * rng.normal(size=(2, num_sym, fft_size)),
        jnp.complex64,
    )
    taps = jnp.asarray(
        (rng.normal(size=(2, num_taps)) + 1j * rng.normal(size=(2, num_taps)))
        * (0.5 ** np.arange(num_taps)),
        jnp.complex64,
    )
    tx = ofdm_modulate(x, cp_len)
    rx = apply_time_channel(tx, taps)
    y = ofdm_demodulate(rx, fft_size, cp_len)
    h = taps_to_frequency_response(taps, fft_size)[:, None, :]
    np.testing.assert_allclose(np.asarray(y), np.asarray(h * x), rtol=1e-4, atol=1e-4)


def test_cp_too_short_breaks_equality():
    """With CP shorter than the delay spread, ISI leaks — the equality must
    NOT hold (sanity check that the test above is non-trivial)."""
    rng = np.random.default_rng(4)
    fft_size, cp_len, num_taps = 64, 2, 9
    x = jnp.asarray(
        rng.normal(size=(1, 3, fft_size)) + 1j * rng.normal(size=(1, 3, fft_size)),
        jnp.complex64,
    )
    taps = jnp.asarray(
        rng.normal(size=(1, num_taps)) + 1j * rng.normal(size=(1, num_taps)),
        jnp.complex64,
    )
    tx = ofdm_modulate(x, cp_len)
    rx = apply_time_channel(tx, taps)
    y = ofdm_demodulate(rx, fft_size, cp_len)
    h = taps_to_frequency_response(taps, fft_size)[:, None, :]
    assert not np.allclose(np.asarray(y), np.asarray(h * x), rtol=1e-4, atol=1e-4)


def test_coded_link_beats_uncoded():
    """simulate_coded_ber: at moderate Eb/N0 the coded link must deliver a
    materially lower BER than the uncoded one over the same channels."""
    from channelestimationtransformer_tpu.sim.link import (
        LinkConfig,
        simulate_ber,
        simulate_coded_ber,
    )

    # Well-conditioned channels (scaled identity + small perturbation): with a
    # single flat-fading realization per codeword, deep fades dominate BER for
    # coded and uncoded alike (no diversity to exploit), so the decoder's
    # coding gain is asserted where it must appear — effectively-AWGN blocks.
    rng = np.random.default_rng(5)
    b, n = 64, 2
    eye = np.eye(n)[None].repeat(b, 0)
    h = jnp.asarray(
        eye + 0.05 * (rng.normal(size=(b, n, n)) + 1j * rng.normal(size=(b, n, n))),
        jnp.complex64,
    )
    cfg = LinkConfig(qam_order=4, n_streams=2)
    key = jax.random.key(0)
    ber_u, _ = simulate_ber(key, h, h, 6.0, cfg, num_symbols=128)
    ber_c, bler, total = simulate_coded_ber(key, h, h, 6.0, cfg, num_symbols=128)
    assert total == b * (128 * 2 * 2 // 2 - 6)
    assert float(ber_c) < float(ber_u) * 0.2, (float(ber_c), float(ber_u))
    assert 0.0 <= float(bler) <= 1.0
