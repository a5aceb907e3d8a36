"""Tests for the Transformer and RNN/GRU/LSTM baseline models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from channelestimationtransformer_tpu.core.config import (
    RecurrentConfig,
    TransformerConfig,
)
from channelestimationtransformer_tpu.models.recurrent import RecurrentPredictor
from channelestimationtransformer_tpu.models.transformer import Transformer


def test_transformer_shapes():
    cfg = TransformerConfig(
        seq_len=32, label_len=8, pred_len=5, d_model=32, n_heads=4,
        num_encoder_layers=2, num_decoder_layers=2, d_ff=32,
    )
    model = Transformer(config=cfg)
    x_enc = jnp.ones((2, 32, 16))
    x_dec = jnp.ones((2, 13, 16))
    variables = model.init(jax.random.key(0), x_enc, x_dec)
    out = model.apply(variables, x_enc, x_dec)
    assert out.shape == (2, 5, 16)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("cell", ["rnn", "gru", "lstm"])
def test_recurrent_teacher_forced_shapes(cell):
    cfg = RecurrentConfig(features=16, input_size=32, hidden_size=32, num_layers=2, cell=cell)
    model = RecurrentPredictor(config=cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 20, 16)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (4, 20, 16)
    # output[0] == x[0] (reference seeds outputs with the first input slot).
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(x[:, 0]))


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_recurrent_rollout(cell):
    cfg = RecurrentConfig(features=16, input_size=32, hidden_size=32, num_layers=2, cell=cell)
    model = RecurrentPredictor(config=cfg)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 20, 16)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x, 5, method=RecurrentPredictor.rollout)
    assert out.shape == (4, 5, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_recurrent_scan_equals_python_loop():
    """The lax.scan forward must equal a hand-rolled per-step loop (the
    reference's per-timestep structure, models/LSTM/model.py:65-72)."""
    cfg = RecurrentConfig(features=8, input_size=16, hidden_size=16, num_layers=2, cell="lstm")
    model = RecurrentPredictor(config=cfg)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 10, 8)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    out_scan = model.apply(variables, x)

    # Python loop using one-step applications.
    def one_step(carry, xt):
        return model.apply(
            variables, carry, xt, method=lambda mdl, c, v: mdl._step(c, v)
        )

    carry = model.apply(variables, 2, method=lambda mdl, b: mdl._init_carry(b))
    ys = [np.asarray(x[:, 0])]
    for t in range(9):
        carry, y = one_step(carry, x[:, t])
        ys.append(np.asarray(y))
    loop_out = np.stack(ys, axis=1)
    np.testing.assert_allclose(np.asarray(out_scan), loop_out, rtol=2e-5, atol=2e-5)


def test_recurrent_learns_identity_ish():
    # One-step-ahead on a slowly varying series: teacher-forced training should
    # quickly beat the zero predictor.
    import optax

    cfg = RecurrentConfig(features=4, input_size=16, hidden_size=32, num_layers=1, cell="gru")
    model = RecurrentPredictor(config=cfg)
    rng = np.random.default_rng(3)
    t = np.linspace(0, 4 * np.pi, 50)
    # [B, T, F] slow sinusoids with random phases
    phases = rng.uniform(0, 2 * np.pi, size=(64, 1, 4))
    x = np.sin(t[None, :, None] + phases).astype(np.float32)
    x = jnp.asarray(x)
    variables = model.init(jax.random.key(0), x)
    params = variables["params"]
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply({"params": p}, x[:, :-1])
            return jnp.mean((out[:, 1:] - x[:, 1:-1]) ** 2)
        l, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, l

    for _ in range(150):
        params, opt, l = step(params, opt)
    assert float(l) < 0.05, float(l)
