"""Structured magnitude pruning — the Pruning(WIP) experiment, completed.

Reference: ``Pruning(WIP)/prune.py:132-314`` weaves Intel neural_compressor's
``snip_momentum`` pruner (4x1 block pattern, 90% target sparsity, gradual
schedule) into the torch train loop via callbacks.

Here pruning is a pure function of the params (plus optional gradient salience)
so it drops into any jitted train loop:

- :func:`block_magnitude_mask` — 4x1-pattern structured mask by block L1 score
  (the reference's pattern: blocks of 4 along the input dim x 1 output),
- :func:`snip_scores` — SNIP-style |w * grad| salience for score-based pruning,
- :func:`cubic_sparsity_schedule` — neural_compressor's gradual ramp,
- :func:`apply_pruning` — mask every matched parameter (same path-matching
  machinery as weight quantization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quant.optim import flatten_path
from .quant.settings import QUANT_KERNEL_MARKERS


def block_scores(w: jnp.ndarray, block: int = 4) -> jnp.ndarray:
    """L1 score per (block-of-``block`` input rows x 1 output col) for a 2D
    kernel ``[in, out]``; pads the input dim to a multiple of ``block``."""
    if w.ndim == 1:
        return jnp.abs(w)
    mat = w.reshape(-1, w.shape[-1])  # [in*, out]
    pad = (-mat.shape[0]) % block
    mat = jnp.pad(jnp.abs(mat), ((0, pad), (0, 0)))
    return mat.reshape(-1, block, mat.shape[-1]).sum(axis=1)  # [in/b, out]


def block_magnitude_mask(w: jnp.ndarray, sparsity: float, block: int = 4) -> jnp.ndarray:
    """Boolean keep-mask with the 4x1 structured pattern at ``sparsity``."""
    if w.ndim < 2:
        return jnp.ones_like(w, dtype=bool)
    scores = block_scores(w, block)  # [nb, out]
    flat = scores.reshape(-1)
    k = jnp.asarray(sparsity * (flat.size - 1), jnp.int32)
    thr = jnp.sort(flat)[k]
    # sparsity may be a traced scalar (the prune driver runs the cubic ramp
    # through one compiled program); the <=0 edge is a select, not a branch.
    keep_blocks = (scores > thr) | (jnp.asarray(sparsity) <= 0.0)  # [nb, out]
    mat_shape = (w.size // w.shape[-1], w.shape[-1])
    keep = jnp.repeat(keep_blocks, block, axis=0)[: mat_shape[0]]
    return keep.reshape(w.shape)


def snip_scores(w: jnp.ndarray, grad: jnp.ndarray) -> jnp.ndarray:
    """SNIP salience |w * grad| (the 'snip_momentum' criterion's base score)."""
    return jnp.abs(w * grad)


def cubic_sparsity_schedule(
    step: int, *, target: float = 0.9, start_step: int = 0, end_step: int = 1000,
    initial: float = 0.0,
) -> float:
    """neural_compressor-style gradual ramp: cubic interpolation from
    ``initial`` to ``target`` between start and end steps."""
    if step <= start_step:
        return initial
    if step >= end_step:
        return target
    t = (step - start_step) / (end_step - start_step)
    return target + (initial - target) * (1.0 - t) ** 3


def apply_pruning(
    params,
    sparsity: float,
    *,
    block: int = 4,
    markers=QUANT_KERNEL_MARKERS,
):
    """Zero the lowest-scoring 4x1 blocks of every matched kernel."""

    def leaf(path, w):
        name = flatten_path(path)
        if any(name.endswith(m) for m in markers) and w.ndim >= 2:
            return jnp.where(block_magnitude_mask(w, sparsity, block), w, 0.0)
        return w

    return jax.tree_util.tree_map_with_path(leaf, params)


def measured_sparsity(params, markers=QUANT_KERNEL_MARKERS) -> float:
    """Fraction of exactly-zero entries across the matched kernels."""
    zeros = total = 0

    def leaf(path, w):
        nonlocal zeros, total
        name = flatten_path(path)
        if any(name.endswith(m) for m in markers) and w.ndim >= 2:
            zeros += int(jnp.sum(w == 0.0))
            total += w.size

    jax.tree_util.tree_map_with_path(leaf, params)
    return zeros / max(total, 1)
