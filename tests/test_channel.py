"""Statistical validation of the JAX CDL channel + beam training chain.

Per SURVEY §7.2 step 2, the channel model is validated on statistics (power
normalization, temporal correlation vs. Doppler, beam-selection behavior), not
bit-exactness vs. Sionna. All arrays use the ri (re/im-pair) representation —
see ``data/packing.py``; tests recombine to complex in NumPy where convenient.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from channelestimationtransformer_tpu.channel.beamforming import (
    beam_sweep_project,
    dft_codebook,
    dft_codebook_ri,
    standardize_time_series,
)
from channelestimationtransformer_tpu.channel.cdl import (
    CDL_B,
    CDLModel,
    generate_cdl_channel,
)
from channelestimationtransformer_tpu.channel.dataset import (
    generate_beamformed_dataset,
    train_val_split,
)

SMALL = CDLModel(num_bs_ant=16, num_ut_ant=2)


def _to_c(x):
    x = np.asarray(x)
    return x[..., 0] + 1j * x[..., 1]


def test_cdl_shapes_and_normalization():
    h = generate_cdl_channel(jax.random.key(0), SMALL, 4, 30)
    assert h.shape == (4, 30, 2, 16, 2)
    assert h.dtype == jnp.float32
    hc = _to_c(h)
    # normalize=True semantics: unit mean energy per (slot, rx, tx) element.
    for b in range(4):
        np.testing.assert_allclose(np.mean(np.abs(hc[b]) ** 2), 1.0, rtol=1e-4)


def test_cdl_temporal_correlation_tracks_doppler():
    # Slower UE -> higher slot-to-slot correlation. 28 GHz @ SRS 1.6 kHz.
    def corr(speed_ms):
        m = CDLModel(num_bs_ant=8, num_ut_ant=1, ue_speed_ms=speed_ms)
        h = generate_cdl_channel(jax.random.key(1), m, 32, 50)
        x = _to_c(h).reshape(32, 50, -1)
        num = np.abs(np.mean(np.sum(x[:, 1:] * np.conj(x[:, :-1]), axis=-1)))
        den = np.mean(np.sum(np.abs(x) ** 2, axis=-1))
        return num / den

    # At 1 m/s, 28 GHz, 0.625 ms slots: fD*T ~= 0.058 -> Jakes rho ~= 0.97.
    c_slow = corr(1.0)
    c_fast = corr(30.0)
    assert c_slow > 0.95, c_slow
    assert c_fast < c_slow - 0.3, (c_slow, c_fast)


def test_cdl_is_deterministic_per_key():
    a = generate_cdl_channel(jax.random.key(2), SMALL, 2, 10)
    b = generate_cdl_channel(jax.random.key(2), SMALL, 2, 10)
    c = generate_cdl_channel(jax.random.key(3), SMALL, 2, 10)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_dft_codebook_properties():
    cb = dft_codebook(16)
    assert cb.shape == (16, 16)
    # Unit-norm beams.
    np.testing.assert_allclose(np.linalg.norm(cb, axis=0), 1.0, rtol=1e-6)
    # Orthogonal (DFT) beams.
    gram = cb.conj().T @ cb
    np.testing.assert_allclose(np.abs(gram), np.eye(16), atol=1e-5)
    # ri form matches.
    ri = np.asarray(dft_codebook_ri(16))
    np.testing.assert_allclose(ri[..., 0] + 1j * ri[..., 1], cb, atol=1e-6)


def test_beam_sweep_selects_steering_direction():
    # Synthetic single-path channel exactly on beam k's steering vector ->
    # beam k must be selected and carry (almost) all the power.
    cb = dft_codebook(16)
    k_true = 5
    steer = np.conj(cb[:, k_true])  # [S]
    t = np.arange(20)
    h = np.exp(1j * 0.01 * t)[None, :, None, None] * steer[None, None, None, :]
    h = np.broadcast_to(h, (2, 20, 2, 16)).astype(np.complex64)
    h_ri = jnp.asarray(np.stack([h.real, h.imag], axis=-1), jnp.float32)
    h_eff, selected = beam_sweep_project(h_ri, dft_codebook_ri(16), num_selected=4)
    assert h_eff.shape == (2, 20, 4, 2, 2)
    assert (np.asarray(selected)[:, 0] == k_true).all()
    # Selected-beam power dominates.
    p = np.abs(_to_c(h_eff)) ** 2
    assert p[:, :, 0].sum() > 100 * p[:, :, 1:].sum()


def test_standardize_time_series():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 40, 4, 2, 2)).astype(np.float32)
    z = np.asarray(standardize_time_series(jnp.asarray(x)))
    np.testing.assert_allclose(z.mean(axis=1), 0.0, atol=1e-5)
    # MATLAB std normalization (N-1) over the complex magnitude.
    var = (z[..., 0] ** 2 + z[..., 1] ** 2).sum(axis=1) / (40 - 1)
    np.testing.assert_allclose(var, 1.0, rtol=1e-5)


def test_generate_beamformed_dataset_end_to_end():
    h = generate_beamformed_dataset(
        jax.random.key(4),
        model=SMALL,
        num_samples=6,
        num_slots=30,
        batch_size=4,
    )
    assert h.shape == (6, 30, 2, 4, 2)
    train, val = train_val_split(h)
    assert train.shape[0] == 5 and val.shape[0] == 1
    # Standardized series: zero mean over slots.
    np.testing.assert_allclose(np.asarray(h).mean(axis=1), 0.0, atol=1e-4)


def test_interpolate_slots_knots_and_accuracy():
    """Cubic slot interpolation (reference MimoSimulation/utils.py:68-90):
    knots reproduced exactly; smooth signals reconstructed accurately."""
    import numpy as np

    from channelestimationtransformer_tpu.channel.interpolate import (
        interpolate_slots,
    )

    t = np.arange(16)
    x = np.stack([np.sin(2 * np.pi * 0.05 * t), np.cos(2 * np.pi * 0.07 * t)], -1)
    up = interpolate_slots(jnp.asarray(x, jnp.float32), factor=4, axis=0)
    assert up.shape == (61, 2)
    # knots exact
    np.testing.assert_allclose(np.asarray(up[::4]), x, atol=1e-6)
    # dense truth within interior segments
    tf = np.arange(61) / 4
    truth = np.stack(
        [np.sin(2 * np.pi * 0.05 * tf), np.cos(2 * np.pi * 0.07 * tf)], -1
    )
    err = np.abs(np.asarray(up[4:-4]) - truth[4:-4]).max()
    assert err < 5e-3, err


def test_interpolate_slots_axis_and_identity():
    import numpy as np

    from channelestimationtransformer_tpu.channel.interpolate import (
        interpolate_slots,
    )

    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 10, 4)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(interpolate_slots(x, 1, axis=1)), np.asarray(x)
    )
    up = interpolate_slots(x, 3, axis=1)
    assert up.shape == (3, 28, 4)
    np.testing.assert_allclose(np.asarray(up[:, ::3]), np.asarray(x), atol=1e-6)


def test_beam_sweep_project_sharded_matches_dense():
    """Antenna-sharded beam sweep (psum partial projections) == single-device
    result (SURVEY §2.7 antenna-sharding row)."""
    import numpy as np

    from channelestimationtransformer_tpu.channel.beamforming import (
        beam_sweep_project,
        beam_sweep_project_sharded,
        dft_codebook_ri,
    )
    from channelestimationtransformer_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    mesh = make_mesh(data=1, model=n)
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(2, 12, 4, 64, 2)), jnp.float32)
    cb = dft_codebook_ri(64)

    h_eff, sel = beam_sweep_project(h, cb, 4)
    h_eff_s, sel_s = beam_sweep_project_sharded(h, cb, 4, mesh)
    np.testing.assert_array_equal(np.asarray(sel), np.asarray(sel_s))
    np.testing.assert_allclose(
        np.asarray(h_eff), np.asarray(h_eff_s), rtol=1e-5, atol=1e-5
    )


def test_generate_beamformed_dataset_sharded():
    """Data-sharded generation: correct shape/sharding, deterministic in key,
    shards differ (per-device RNG fold)."""
    import numpy as np

    from channelestimationtransformer_tpu.channel.dataset import (
        generate_beamformed_dataset_sharded,
    )
    from channelestimationtransformer_tpu.channel.cdl import CDLModel
    from channelestimationtransformer_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    mesh = make_mesh(data=n, model=1)
    model = CDLModel()
    h = generate_beamformed_dataset_sharded(
        jax.random.key(3), mesh, model=model, num_samples=2 * n, num_slots=12,
    )
    assert h.shape == (2 * n, 12, 2, 4, 2)
    arr = np.asarray(h)
    assert np.isfinite(arr).all()
    # per-shard content differs (distinct RNG folds)
    assert not np.allclose(arr[:2], arr[2:4])
    # deterministic in key
    h2 = generate_beamformed_dataset_sharded(
        jax.random.key(3), mesh, model=model, num_samples=2 * n, num_slots=12,
    )
    np.testing.assert_array_equal(arr, np.asarray(h2))
    # divisibility guard
    import pytest as _pytest

    with _pytest.raises(ValueError):
        generate_beamformed_dataset_sharded(
            jax.random.key(3), mesh, model=model, num_samples=2 * n + 1,
            num_slots=12,
        )
