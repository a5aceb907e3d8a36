"""Tests for the streaming blockwise predictor (completed WIP successor)."""

import jax
import jax.numpy as jnp
import numpy as np

from channelestimationtransformer_tpu.core.config import InformerConfig
from channelestimationtransformer_tpu.models import build_informer
from channelestimationtransformer_tpu.models.streaming import (
    init_stream,
    push_block,
    streaming_rollout,
    streaming_step,
)


def _cfg():
    return InformerConfig(
        seq_len=20, label_len=5, pred_len=5, d_model=32, n_heads=4,
        e_layers=(2,), d_layers=1, d_ff=16, dropout=0.0,
    )


def test_push_block_rolls_window():
    cfg = _cfg()
    state = init_stream(2, cfg)
    blk = jnp.ones((2, 5, 16))
    state = push_block(state, blk)
    assert int(state.position) == 5
    assert int(state.filled) == 5
    np.testing.assert_allclose(np.asarray(state.window[:, -5:]), 1.0)
    np.testing.assert_allclose(np.asarray(state.window[:, :-5]), 0.0)
    blk2 = 2 * jnp.ones((2, 5, 16))
    state = push_block(state, blk2)
    np.testing.assert_allclose(np.asarray(state.window[:, -5:]), 2.0)
    np.testing.assert_allclose(np.asarray(state.window[:, -10:-5]), 1.0)


def test_streaming_step_matches_offline_forward_when_window_full():
    cfg = _cfg()
    model = build_informer(cfg)
    rng = np.random.default_rng(0)
    stream = jnp.asarray(rng.normal(size=(2, 20, 16)), jnp.float32)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((2, cfg.seq_len, 16)),
        jnp.zeros((2, cfg.dec_len, 16)),
    )

    # Feed the stream in 5-slot blocks; after 4 blocks the window equals the
    # full stream, so the prediction must equal the offline forward pass.
    state = init_stream(2, cfg)
    for i in range(4):
        state, pred = streaming_step(
            model, variables, state, stream[:, i * 5 : (i + 1) * 5], cfg
        )

    x_enc = stream
    label = x_enc[:, -cfg.label_len :]
    x_dec = jnp.concatenate([label, jnp.zeros((2, cfg.pred_len, 16))], axis=1)
    offline = model.apply(variables, x_enc, x_dec)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(offline), rtol=2e-5, atol=2e-5)


def test_streaming_rollout_scan():
    cfg = _cfg()
    model = build_informer(cfg)
    rng = np.random.default_rng(1)
    stream = jnp.asarray(rng.normal(size=(3, 40, 16)), jnp.float32)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((3, cfg.seq_len, 16)),
        jnp.zeros((3, cfg.dec_len, 16)),
    )
    preds = streaming_rollout(model, variables, cfg, stream, block=5)
    assert preds.shape == (8, 3, 5, 16)
    assert np.isfinite(np.asarray(preds)).all()
