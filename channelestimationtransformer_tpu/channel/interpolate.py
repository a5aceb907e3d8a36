"""Temporal interpolation of channel snapshots between SRS slots.

Reference: ``MimoSimulation/utils.py:68-90`` — cubic interpolation of the
per-SRS-slot channel to per-OFDM-symbol resolution before applying it in the
link simulation (SRS period 0.625 ms vs ~71 us symbols).

TPU-native design: Catmull-Rom cubic convolution with a *static* upsampling
factor — the fractional-phase basis is a trace-time constant ``[R, 4]`` matrix
and the whole interpolation is one gather + one small matmul (MXU-friendly,
no per-point host loop like the reference's scipy call).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _catmull_rom_basis(factor: int) -> np.ndarray:
    """[factor, 4] weights over (p_{i-1}, p_i, p_{i+1}, p_{i+2}) for the
    fractional phases r/factor, r = 0..factor-1."""
    f = np.arange(factor) / factor
    f2, f3 = f * f, f * f * f
    w0 = -0.5 * f3 + f2 - 0.5 * f
    w1 = 1.5 * f3 - 2.5 * f2 + 1.0
    w2 = -1.5 * f3 + 2.0 * f2 + 0.5 * f
    w3 = 0.5 * f3 - 0.5 * f2
    return np.stack([w0, w1, w2, w3], axis=-1)


@partial(jax.jit, static_argnames=("factor", "axis"))
def interpolate_slots(h: jnp.ndarray, factor: int, axis: int = -2) -> jnp.ndarray:
    """Cubic (Catmull-Rom) upsampling along ``axis`` by integer ``factor``.

    For ``T`` input slots returns ``(T - 1) * factor + 1`` samples: the knots
    are reproduced exactly and each inter-slot gap gets ``factor - 1``
    interpolated points (matching the reference's slot->symbol upsampling).
    Edge segments replicate the boundary sample (clamped Catmull-Rom).
    """
    if factor == 1:
        return h
    h = jnp.moveaxis(h, axis, 0)
    t = h.shape[0]
    # clamped neighbors: p[-1] = p[0], p[T] = p[T-1]
    pad = jnp.concatenate([h[:1], h, h[-1:], h[-1:]], axis=0)  # [T+3, ...]
    # segment windows: for i in 0..T-2 -> (p[i-1], p[i], p[i+1], p[i+2])
    win = jnp.stack(
        [pad[k : k + t - 1] for k in range(4)], axis=1
    )  # [T-1, 4, ...]
    basis = jnp.asarray(_catmull_rom_basis(factor), h.dtype)  # [R, 4]
    seg = jnp.einsum("rk,sk...->sr...", basis, win)  # [T-1, R, ...]
    out = seg.reshape((t - 1) * factor, *h.shape[1:])
    out = jnp.concatenate([out, h[-1:]], axis=0)  # trailing knot
    return jnp.moveaxis(out, 0, axis)
