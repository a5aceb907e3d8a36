"""Input embeddings: circular-conv token embedding + sinusoidal positions.

Reference: ``models/Informer/embed.py``. Design deltas (all TPU-first):

- ``DataEmbedding`` drops the ``x_mark`` temporal-embedding argument entirely —
  the reference constructs temporal embeddings but never uses them
  (``DataEmbedding.forward`` ignores ``x_mark``, reference ``embed.py:106-108``;
  SURVEY §7.4 quirk 3).
- The circular Conv1d is expressed as wrap-pad + ``lax.conv_general_dilated`` in
  NLC layout so XLA lowers it straight onto the MXU.
- The sinusoid table is computed at trace time for the static sequence length —
  it constant-folds into the compiled program (no buffer, no H2D).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn
from jax import lax


def sinusoid_position_encoding(length: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """Classic interleaved sin/cos table ``[length, d_model]``
    (reference ``models/Informer/embed.py:7-24`` PositionalEmbedding)."""
    position = np.arange(length, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * -(np.log(10000.0) / d_model)
    )
    pe = np.zeros((length, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe, dtype=dtype)


def circular_conv1d(x: jnp.ndarray, kernel: jnp.ndarray, bias=None) -> jnp.ndarray:
    """Depth-in/feature-out 1D conv with circular padding, NLC layout.

    ``x``: [B, L, C_in]; ``kernel``: [K, C_in, C_out] — matches torch's
    ``Conv1d(padding=K//2, padding_mode='circular')`` used throughout the
    reference (``embed.py:26-37``, ``encoder.py:5-25``).
    """
    k = kernel.shape[0]
    pad = k // 2
    xp = jnp.concatenate([x[:, -pad:, :], x, x[:, :pad, :]], axis=1)
    out = lax.conv_general_dilated(
        xp,
        kernel,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if bias is not None:
        out = out + bias
    return out


class TokenEmbedding(nn.Module):
    """Circular Conv1d ``c_in -> d_model`` (k=3), kaiming-normal init
    (reference ``models/Informer/embed.py:26-37``)."""

    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.kaiming_normal(),
            (3, c_in, self.d_model),
            jnp.float32,
        )
        return circular_conv1d(x.astype(self.dtype), kernel.astype(self.dtype))


class DataEmbedding(nn.Module):
    """Token conv embedding + positional sinusoid + dropout
    (reference ``models/Informer/embed.py:96-108``, minus the unused x_mark path).

    ``position_offset`` supports the streaming encoder: positions start at a
    (possibly traced) slot counter rather than 0.
    """

    d_model: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True, position_offset=None):
        tok = TokenEmbedding(self.d_model, dtype=self.dtype, name="token")(x)
        length = x.shape[-2]
        if position_offset is None:
            pe = sinusoid_position_encoding(length, self.d_model, dtype=self.dtype)
        else:
            # Compute a window of the table starting at the traced offset.
            table = sinusoid_position_encoding(
                length + 8192, self.d_model, dtype=self.dtype
            )
            pe = lax.dynamic_slice(
                table, (position_offset, 0), (length, self.d_model)
            )
        out = tok + pe
        return nn.Dropout(rate=self.dropout, deterministic=deterministic)(out)
