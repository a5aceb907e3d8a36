"""Multi-device tests on the virtual 8-device CPU mesh: mesh construction,
data-parallel equivalence, TP sharding rules, ring attention vs dense."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from channelestimationtransformer_tpu.models.attention import full_attention
from channelestimationtransformer_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_sharding,
)
from channelestimationtransformer_tpu.parallel.ring import ring_attention
from channelestimationtransformer_tpu.parallel.sharding import (
    infer_param_spec,
    param_shardings,
)


def test_make_mesh_shapes():
    n = len(jax.devices())
    mesh = make_mesh()
    assert mesh.shape == {"data": n, "model": 1, "seq": 1}
    mesh2 = make_mesh(data=n // 2, model=2)
    assert mesh2.shape["model"] == 2
    with pytest.raises(ValueError):
        make_mesh(data=3, model=5)


def test_param_sharding_rules():
    mesh = make_mesh(data=len(jax.devices()) // 2, model=2)
    params = {
        "dense": {"kernel": jnp.ones((16, 64)), "bias": jnp.ones((64,))},
        "scalar": jnp.ones(()),
    }
    shardings = param_shardings(params, mesh)
    assert shardings["dense"]["kernel"].spec == P(None, "model")
    assert shardings["dense"]["bias"].spec == P()
    assert shardings["scalar"].spec == P()


def test_data_parallel_matches_single_device():
    # The same jitted computation on sharded vs replicated input must agree.
    mesh = make_mesh()
    x = jnp.arange(len(jax.devices()) * 4 * 8, dtype=jnp.float32).reshape(-1, 8)
    f = jax.jit(lambda v: jnp.sin(v).sum(axis=-1) * 2)
    expected = np.asarray(f(x))
    xs = jax.device_put(x, batch_sharding(mesh))
    got = np.asarray(f(xs))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_dense(causal):
    n = len(jax.devices())
    mesh = make_mesh(data=1, model=1, seq=n)
    rng = np.random.default_rng(0)
    b, l, h, e = 2, 8 * n, 2, 16
    q = jnp.asarray(rng.normal(size=(b, l, h, e)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, h, e)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, h, e)), jnp.float32)

    out = ring_attention(q, k, v, mesh, causal=causal)
    ref, _ = full_attention(q, k, v, mask_flag=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_ring_informer_matches_full():
    """attn='ring' (sequence-parallel encoder) is exact attention: with shared
    params it must reproduce the attn='full' model's output."""
    import dataclasses

    from channelestimationtransformer_tpu.core.config import InformerConfig
    from channelestimationtransformer_tpu.models import build_informer

    n = len(jax.devices())
    mesh = make_mesh(data=1, model=1, seq=n)
    cfg_full = InformerConfig(
        seq_len=32, label_len=8, pred_len=5, d_model=32, n_heads=4,
        e_layers=(2,), d_layers=1, d_ff=16, distil=False, dropout=0.0,
    )
    cfg_ring = dataclasses.replace(cfg_full, attn="ring")
    m_full = build_informer(cfg_full)
    m_ring = build_informer(cfg_ring, mesh=mesh)

    x_enc = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 16)), jnp.float32)
    x_dec = jnp.asarray(np.random.default_rng(1).normal(size=(2, 13, 16)), jnp.float32)
    variables = m_full.init(jax.random.key(0), x_enc, x_dec)

    out_full = m_full.apply(variables, x_enc, x_dec)
    out_ring = jax.jit(lambda v, a, b: m_ring.apply(v, a, b))(variables, x_enc, x_dec)
    np.testing.assert_allclose(
        np.asarray(out_full), np.asarray(out_ring), rtol=2e-4, atol=2e-5
    )


def test_train_chunk_dp_per_shard_sampling():
    """train_chunk_dp: dataset sharded on `data`, per-device local-shard
    window sampling (no dataset all-gather), grads psum'd by XLA. Loss must
    be finite and decrease over chunks; params stay replicated."""
    from channelestimationtransformer_tpu.core.config import (
        InformerConfig,
        TrainConfig,
    )
    from channelestimationtransformer_tpu.models import build_informer
    from channelestimationtransformer_tpu.train.trainer import (
        create_train_state,
        train_chunk_dp,
    )

    n = len(jax.devices())
    mesh = make_mesh(data=n)
    cfg = InformerConfig(
        seq_len=16, label_len=4, pred_len=2, d_model=16, n_heads=2,
        e_layers=(1,), d_layers=1, d_ff=16, distil=False,
    )
    tc = TrainConfig(batch_size=4, num_epochs=1, steps_per_epoch=8)
    model = build_informer(cfg)
    state = create_train_state(model, rng=jax.random.key(0), cfg=cfg, train_cfg=tc)
    state = jax.device_put(state, replicate_sharding(mesh))

    rng = np.random.default_rng(0)
    t = np.linspace(0, 1, (16 + 2 + 4) * 4 * n).reshape(4 * n, 16 + 2 + 4, 1)
    h = jnp.asarray(
        (np.sin(4 * t) + 0.01 * rng.normal(size=t.shape)) * np.ones((1, 1, 16)),
        jnp.float32,
    )
    h = jax.device_put(h, NamedSharding(mesh, P("data")))

    kwargs = dict(
        mesh=mesh, num_steps=8, per_device_batch=4,
        label_len=cfg.label_len, seq_len=cfg.seq_len, pred_len=cfg.pred_len,
        snr_db=30.0,
    )
    state, m0 = train_chunk_dp(state, h, jax.random.key(1), **kwargs)
    first = float(m0["loss_sum"])
    assert np.isfinite(first)
    for i in range(8):
        state, m = train_chunk_dp(state, h, jax.random.key(2 + i), **kwargs)
    last = float(m["loss_sum"])
    assert np.isfinite(last) and last < first

    # Params remained replicated (no accidental sharding drift).
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_train_chunk_dp_with_pallas_attention():
    """The BD fused-attention kernel (use_pallas=True) composes with the
    data-parallel shard_map pipeline: same sharded train chunk, loss finite,
    params replicated. (On CPU the kernel runs via the Pallas interpreter;
    on TPU the identical code path compiles natively.)"""
    from channelestimationtransformer_tpu.core.config import (
        InformerConfig,
        TrainConfig,
    )
    from channelestimationtransformer_tpu.models import build_informer
    from channelestimationtransformer_tpu.train.trainer import (
        create_train_state,
        train_chunk_dp,
    )

    n = len(jax.devices())
    mesh = make_mesh(data=n)
    cfg = InformerConfig(
        seq_len=16, label_len=4, pred_len=2, d_model=16, n_heads=2,
        e_layers=(1,), d_layers=1, d_ff=16, distil=False, dropout=0.0,
        use_pallas=True,
    )
    tc = TrainConfig(batch_size=2 * n, num_epochs=1, steps_per_epoch=2)
    model = build_informer(cfg)
    state = create_train_state(model, rng=jax.random.key(0), cfg=cfg, train_cfg=tc)
    state = jax.device_put(state, replicate_sharding(mesh))

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(4 * n, 22, 16)), jnp.float32)
    h = jax.device_put(h, NamedSharding(mesh, P("data")))

    state, m = train_chunk_dp(
        state, h, jax.random.key(1), mesh=mesh, num_steps=2,
        per_device_batch=2, label_len=cfg.label_len, seq_len=cfg.seq_len,
        pred_len=cfg.pred_len, snr_db=30.0,
    )
    assert np.isfinite(float(m["loss_sum"]))
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated
