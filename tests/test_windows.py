"""Tests for the device-resident window sampler (SeqData successor)."""

import jax
import jax.numpy as jnp
import numpy as np

from channelestimationtransformer_tpu.data.packing import to_ri
from channelestimationtransformer_tpu.data.windows import pack_features
from channelestimationtransformer_tpu.data.windows import (
    WindowDataset,
    make_batch,
    sample_windows,
)


def _dataset(n=16, slots=40, nr=2, nt=4, seq_len=25, pred_len=5, snr_db=20.0):
    rng = np.random.default_rng(0)
    h = (rng.normal(size=(n, slots, nr, nt)) + 1j * rng.normal(size=(n, slots, nr, nt)))
    return WindowDataset(
        h=pack_features(to_ri(jnp.asarray(h.astype(np.complex64)))),
        seq_len=seq_len,
        pred_len=pred_len,
        snr_db=snr_db,
    )


def test_shapes_and_split():
    ds = _dataset()
    h, h_noise, h_seq, h_pred = sample_windows(jax.random.key(0), ds, batch_size=8)
    assert h.shape == (8, 30, 16)
    assert h_noise.shape == (8, 30, 16)
    assert h_seq.shape == (8, 25, 16)
    assert h_pred.shape == (8, 5, 16)
    # H_pred is from the clean channel, H_seq from the noisy one.
    np.testing.assert_allclose(np.asarray(h_pred), np.asarray(h[:, 25:]))
    np.testing.assert_allclose(np.asarray(h_seq), np.asarray(h_noise[:, :25]))
    assert not np.allclose(np.asarray(h_seq), np.asarray(h[:, :25]))


def test_windows_are_normalized_before_noise():
    ds = _dataset()
    h, _, _, _ = sample_windows(jax.random.key(1), ds, batch_size=64)
    # Each full window comes from a per-sample RMS-normalized channel; over
    # many windows the mean complex power (2 * mean real square) should be ~1.
    power = 2 * np.asarray(h) ** 2
    assert abs(power.mean() - 1.0) < 0.1


def test_sampler_is_jittable_and_keyed():
    ds = _dataset()
    f = jax.jit(lambda k: sample_windows(k, ds, 4))
    a = f(jax.random.key(0))
    b = f(jax.random.key(0))
    c = f(jax.random.key(1))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))
    assert not np.allclose(np.asarray(a[0]), np.asarray(c[0]))


def test_make_batch_decoder_input_layout():
    ds = _dataset()
    enc_in, dec_in, target = make_batch(jax.random.key(2), ds, 8, label_len=10)
    assert enc_in.shape == (8, 25, 16)
    assert dec_in.shape == (8, 15, 16)
    assert target.shape == (8, 5, 16)
    # dec_in = last label_len slots of enc_in, then zeros.
    np.testing.assert_allclose(np.asarray(dec_in[:, :10]), np.asarray(enc_in[:, -10:]))
    np.testing.assert_allclose(np.asarray(dec_in[:, 10:]), 0.0)


def test_ri_pack_matches_loadbatch_layout():
    # The ri reshape must equal the complex LoadBatch packing.
    from channelestimationtransformer_tpu.data.packing import complex_to_real

    rng = np.random.default_rng(3)
    h = (rng.normal(size=(3, 7, 2, 4)) + 1j * rng.normal(size=(3, 7, 2, 4))).astype(
        np.complex64
    )
    via_complex = np.asarray(complex_to_real(jnp.asarray(h)))
    via_packed = np.asarray(pack_features(to_ri(jnp.asarray(h))))
    np.testing.assert_allclose(via_packed, via_complex, rtol=1e-6)
