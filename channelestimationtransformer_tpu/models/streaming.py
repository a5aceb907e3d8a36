"""Streaming (blockwise) channel prediction with O(1)-per-block state.

Reference: ``StreamingTransformer(WIP)/`` — an unfinished attempt at
O(1)-per-slot streaming inference: a stateful ``DataEmbedding`` with a
``position_counter`` advanced per call (``StreamingTransformerModel/embed.py:
42-89``) and a model stub buffering the last 5 embedded blocks
(``model.py:43-54``), driven by 5-slot chunks (``debug.py:58-62``).

This module is the completed design, TPU-native:

- The stream state is an explicit functional carry ``(window, position)`` —
  a rolling window of the last ``seq_len`` slots and a global slot counter —
  so the step is jittable, scannable, and shardable (no hidden module state,
  unlike the reference's mutable ``position_counter``).
- Each :func:`streaming_step` call ingests one block of new slots, rolls the
  window (static-shape ``jnp.roll`` + dynamic update, no reallocation), embeds
  with the *absolute* position offset (the reference's position-counter
  semantics), and predicts the next ``pred_len`` slots with the standard
  Informer — reusing its weights, so a model trained offline streams online
  with zero conversion.
- Work per block is constant (one window-sized forward), and the state is
  ``O(seq_len * features)`` per stream.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.config import InformerConfig


class StreamState(NamedTuple):
    """Carry for one batch of streams."""

    window: jnp.ndarray  # [B, seq_len, F] most recent slots (oldest first)
    position: jnp.ndarray  # [] int32 absolute index of the next slot
    filled: jnp.ndarray  # [] int32 number of valid slots in the window


def init_stream(batch: int, cfg: InformerConfig) -> StreamState:
    return StreamState(
        window=jnp.zeros((batch, cfg.seq_len, cfg.enc_in), jnp.float32),
        position=jnp.asarray(0, jnp.int32),
        filled=jnp.asarray(0, jnp.int32),
    )


def push_block(state: StreamState, block: jnp.ndarray) -> StreamState:
    """Roll ``block`` ([B, K, F], K static) into the window."""
    k = block.shape[1]
    window = jnp.roll(state.window, -k, axis=1)
    window = jax.lax.dynamic_update_slice(
        window, block, (0, window.shape[1] - k, 0)
    )
    return StreamState(
        window=window,
        position=state.position + k,
        filled=jnp.minimum(state.filled + k, window.shape[1]),
    )


def streaming_step(
    model,
    variables,
    state: StreamState,
    block: jnp.ndarray,
    cfg: InformerConfig,
) -> Tuple[StreamState, jnp.ndarray]:
    """Ingest one block of slots and predict the next ``pred_len`` slots.

    Decoder input follows the offline convention (last ``label_len`` observed
    slots + zeros); positions are absolute via the stream counter, matching
    the reference's stateful embedding intent (``embed.py:42-89``).
    """
    state = push_block(state, block)
    x_enc = state.window
    label = x_enc[:, x_enc.shape[1] - cfg.label_len :]
    zeros = jnp.zeros((x_enc.shape[0], cfg.pred_len, x_enc.shape[2]), x_enc.dtype)
    x_dec = jnp.concatenate([label, zeros], axis=1)
    out = model.apply(variables, x_enc, x_dec)
    pred = out[0] if isinstance(out, tuple) else out
    return state, pred


def streaming_rollout(model, variables, cfg: InformerConfig, stream: jnp.ndarray,
                      block: int):
    """Scan a whole stream ``[B, T, F]`` in blocks of ``block`` slots.

    Returns predictions ``[T//block, B, pred_len, F]`` — one ``pred_len``-slot
    forecast per ingested block (the reference ``debug.py`` harness pattern,
    5-slot chunks)."""
    b, t, f = stream.shape
    n_blocks = t // block
    blocks = stream[:, : n_blocks * block].reshape(b, n_blocks, block, f)
    blocks = jnp.swapaxes(blocks, 0, 1)  # [n_blocks, B, block, F]

    def step(state, blk):
        return streaming_step(model, variables, state, blk, cfg)

    state = init_stream(b, cfg)
    _, preds = jax.lax.scan(step, state, blocks)
    return preds
