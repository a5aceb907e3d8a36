"""QC-LDPC encoder/decoder tests (sim/ldpc.py; reference capability: Sionna
5G LDPC in ``MimoSimulation/KerasFullSimulation.py:139-151``)."""

import jax
import jax.numpy as jnp
import numpy as np

from channelestimationtransformer_tpu.sim.ldpc import (
    ldpc_decode,
    ldpc_encode,
    ldpc_syndrome,
    make_qc_ldpc,
)

CODE = make_qc_ldpc(z=27, kb=12, mb=12, seed=0)


def test_code_geometry():
    assert CODE.n == 24 * 27
    assert CODE.k == 12 * 27


def test_encode_produces_valid_codewords():
    rng = np.random.default_rng(0)
    info = jnp.asarray(rng.integers(0, 2, (8, CODE.k)), jnp.int32)
    cw = ldpc_encode(CODE, info)
    assert cw.shape == (8, CODE.n)
    # systematic prefix
    np.testing.assert_array_equal(np.asarray(cw[:, : CODE.k]), np.asarray(info))
    syn = ldpc_syndrome(CODE, cw)
    assert int(jnp.sum(syn)) == 0


def test_decode_noiseless():
    rng = np.random.default_rng(1)
    info = jnp.asarray(rng.integers(0, 2, (4, CODE.k)), jnp.int32)
    cw = ldpc_encode(CODE, info)
    llr = (1.0 - 2.0 * cw).astype(jnp.float32) * 6.0
    dec = ldpc_decode(CODE, llr, num_iters=10)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(info))


def test_decode_corrects_awgn_errors():
    """Rate-1/2 LDPC at Eb/N0 = 3 dB (BPSK): uncoded BER ~2.3e-2; the decoder
    must get at least an order of magnitude below that."""
    rng = np.random.default_rng(2)
    batch = 24
    info = jnp.asarray(rng.integers(0, 2, (batch, CODE.k)), jnp.int32)
    cw = ldpc_encode(CODE, info)
    x = 1.0 - 2.0 * np.asarray(cw, np.float32)
    ebno_db = 3.0
    rate = CODE.k / CODE.n
    sigma2 = 1.0 / (2 * rate * 10 ** (ebno_db / 10))
    y = x + rng.normal(size=x.shape) * np.sqrt(sigma2)
    llr = jnp.asarray(2.0 * y / sigma2, jnp.float32)

    # sanity: the channel actually flips bits
    hard_in = (np.asarray(llr[:, : CODE.k]) < 0).astype(np.int32)
    ber_in = float(np.mean(hard_in != np.asarray(info)))
    assert ber_in > 5e-3, ber_in

    dec = ldpc_decode(CODE, llr, num_iters=30)
    ber_out = float(jnp.mean(dec != info))
    assert ber_out < ber_in / 10, (ber_in, ber_out)


def test_decode_jittable_static():
    info = jnp.zeros((2, CODE.k), jnp.int32)
    cw = ldpc_encode(CODE, info)
    llr = (1.0 - 2.0 * cw).astype(jnp.float32)
    fn = jax.jit(lambda l: ldpc_decode(CODE, l, num_iters=5))
    out = fn(llr)
    assert out.shape == (2, CODE.k)


def test_coded_link_ldpc_fec():
    """simulate_coded_ber(fec='ldpc') runs end to end and beats uncoded on
    well-conditioned channels (same setup as the conv-FEC link test)."""
    from channelestimationtransformer_tpu.sim.link import (
        LinkConfig,
        simulate_ber,
        simulate_coded_ber,
    )

    rng = np.random.default_rng(5)
    b, n = 32, 2
    eye = np.eye(n)[None].repeat(b, 0)
    h = jnp.asarray(
        eye + 0.05 * (rng.normal(size=(b, n, n)) + 1j * rng.normal(size=(b, n, n))),
        jnp.complex64,
    )
    cfg = LinkConfig(qam_order=4, n_streams=2)
    key = jax.random.key(0)
    # 162 symbols x 2 streams x 2 bps = 648 coded bits = one LDPC frame
    ber_u, _ = simulate_ber(key, h, h, 6.0, cfg, num_symbols=162)
    ber_c, bler, total = simulate_coded_ber(
        key, h, h, 6.0, cfg, num_symbols=162, fec="ldpc"
    )
    assert total == b * 324
    assert float(ber_c) < float(ber_u) * 0.2, (float(ber_c), float(ber_u))


def test_coded_link_ldpc_rejects_bad_payload():
    from channelestimationtransformer_tpu.sim.link import (
        LinkConfig,
        simulate_coded_ber,
    )

    h = jnp.eye(2, dtype=jnp.complex64)[None]
    try:
        simulate_coded_ber(
            jax.random.key(0), h, h, 6.0, LinkConfig(), num_symbols=100,
            fec="ldpc",
        )
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "multiple of" in str(e)
