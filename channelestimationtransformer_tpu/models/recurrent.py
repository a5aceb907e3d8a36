"""RNN / GRU / LSTM channel predictors via ``lax.scan``.

Reference: ``models/{RNN,GRU,LSTM}/model.py`` — Linear encoder -> stacked
recurrent core -> Linear decoder; ``train_data`` runs teacher-forced one-step-
ahead prediction over the sequence, ``test_data`` runs the history then free-
runs closed-loop for ``pred_len`` steps (``models/LSTM/model.py:57-108``).

TPU-first: the reference's per-timestep Python loop (one ``nn.LSTM`` call per
slot, ``model.py:65-72``) becomes a single ``lax.scan`` over time — one
compiled program, no per-step dispatch. The closed-loop rollout is a second
scan whose carry includes the previous output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core.config import RecurrentConfig


def _make_cell(kind: str, hidden: int):
    if kind == "lstm":
        return nn.OptimizedLSTMCell(hidden)
    if kind == "gru":
        return nn.GRUCell(hidden)
    if kind == "rnn":
        return nn.SimpleCell(hidden)
    raise ValueError(f"unknown cell {kind!r}")


class RecurrentPredictor(nn.Module):
    """Stacked recurrent core with encoder/decoder projections.

    ``__call__`` = teacher-forced ``train_data``; :meth:`rollout` = closed-loop
    ``test_data``.
    """

    config: RecurrentConfig

    def setup(self):
        cfg = self.config
        self.encoder = nn.Dense(cfg.input_size, name="encoder")
        self.cells = [
            _make_cell(cfg.cell, cfg.hidden_size) for _ in range(cfg.num_layers)
        ]
        self.decoder = nn.Dense(cfg.features, name="decoder")

    def _init_carry(self, batch: int):
        cfg = self.config
        rng = jax.random.key(0)  # zero-init cells; rng unused by initialize_carry
        carries = []
        size = cfg.input_size
        for cell in self.cells:
            carries.append(cell.initialize_carry(rng, (batch, size)))
            size = cfg.hidden_size
        return tuple(carries)

    def _step(self, carry, x_t):
        """One slot through encoder -> stacked cells -> decoder."""
        h = self.encoder(x_t)
        new_carry = []
        for cell, c in zip(self.cells, carry):
            c2, h = cell(c, h)
            new_carry.append(c2)
        y = self.decoder(h)
        return tuple(new_carry), y

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Teacher-forced one-step-ahead prediction (reference ``train_data``,
        ``models/LSTM/model.py:55-74``): output[t] predicts x[t+1]; output[0]
        is x[0] itself (the reference seeds the output list with the first
        input slot)."""
        b, t, f = x.shape
        carry = self._init_carry(b)
        scan = nn.scan(
            lambda mdl, c, xt: mdl._step(c, xt),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        _, ys = scan(self, carry, x[:, :-1, :])
        return jnp.concatenate([x[:, :1, :], ys], axis=1)

    def rollout(self, x: jnp.ndarray, pred_len: int) -> jnp.ndarray:
        """Closed-loop evaluation (reference ``test_data``,
        ``models/LSTM/model.py:76-108``): consume the noisy history, then feed
        predictions back for ``pred_len`` steps. Returns ``[B, pred_len, F]``
        (the reference returns ``pred_len+1`` outputs starting at the last
        history step's prediction; we return the horizon predictions)."""
        b, t, f = x.shape
        carry = self._init_carry(b)

        warm = nn.scan(
            lambda mdl, c, xt: mdl._step(c, xt),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        carry, ys = warm(self, carry, x)
        last = ys[:, -1, :]  # prediction for the first horizon slot

        def free_step(mdl, cy, _):
            c, y = cy
            c2, y2 = mdl._step(c, y)
            return (c2, y2), y2

        free = nn.scan(
            free_step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=1,
        )
        (_, _), preds = free(self, (carry, last), jnp.zeros((pred_len - 1, 1)))
        return jnp.concatenate([last[:, None, :], preds], axis=1)
