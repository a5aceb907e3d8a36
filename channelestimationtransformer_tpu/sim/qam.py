"""Gray-coded QAM mapping / demapping in pure JAX.

Reference: the Sionna ``Mapper``/``Demapper`` blocks used by
``MimoSimulation/KerasFullSimulation.py:117-241``. Implemented natively
(square QAM, Gray labeling per axis, unit average energy; max-log LLRs) so the
end-to-end link runs as one XLA program with no TF dependency.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _gray_pam_levels(bits_per_axis: int) -> np.ndarray:
    """PAM levels in Gray-code order: level[i] is the amplitude whose label is
    the Gray code of i."""
    m = 1 << bits_per_axis
    # Natural-order amplitudes -m+1, ..., -1, 1, ..., m-1 (step 2).
    amps = np.arange(-(m - 1), m, 2, dtype=np.float64)
    levels = np.empty(m)
    for label in range(m):
        # position of this label in Gray sequence = inverse gray code
        g = label
        mask = g >> 1
        while mask:
            g ^= mask
            mask >>= 1
        levels[label] = amps[g]
    return levels


def qam_constellation(order: int) -> jnp.ndarray:
    """Unit-energy constellation indexed by the integer symbol label
    (I bits = MSBs, Q bits = LSBs)."""
    bits = int(np.log2(order))
    assert 2 ** bits == order and bits % 2 == 0, "square QAM only"
    ba = bits // 2
    pam = _gray_pam_levels(ba)
    points = pam[:, None] + 1j * pam[None, :]
    points = points.reshape(-1)
    energy = np.mean(np.abs(points) ** 2)
    return jnp.asarray(points / np.sqrt(energy), dtype=jnp.complex64)


def qam_map(bits: jnp.ndarray, order: int) -> jnp.ndarray:
    """``[..., n*bits_per_symbol]`` bits -> ``[..., n]`` symbols."""
    bps = int(np.log2(order))
    const = qam_constellation(order)
    b = bits.reshape(*bits.shape[:-1], -1, bps)
    weights = jnp.asarray([1 << (bps - 1 - i) for i in range(bps)], b.dtype)
    labels = jnp.sum(b * weights, axis=-1).astype(jnp.int32)
    return const[labels]


def qam_demap_hard(y: jnp.ndarray, order: int) -> jnp.ndarray:
    """Nearest-symbol hard decision -> bits ``[..., n*bps]``."""
    bps = int(np.log2(order))
    const = qam_constellation(order)
    d = jnp.abs(y[..., None] - const) ** 2
    labels = jnp.argmin(d, axis=-1)
    shifts = jnp.asarray([bps - 1 - i for i in range(bps)], jnp.int32)
    bits = (labels[..., None] >> shifts) & 1
    return bits.reshape(*y.shape[:-1], -1)


def qam_llr(y: jnp.ndarray, order: int, noise_var) -> jnp.ndarray:
    """Max-log LLRs per bit (positive = bit 0 more likely, Sionna convention)."""
    bps = int(np.log2(order))
    const = qam_constellation(order)
    d = -jnp.abs(y[..., None] - const) ** 2 / noise_var  # log-metric [.., M]
    labels = np.arange(order)
    llrs = []
    for i in range(bps):
        bit = (labels >> (bps - 1 - i)) & 1
        m0 = jnp.max(jnp.where(jnp.asarray(bit == 0), d, -jnp.inf), axis=-1)
        m1 = jnp.max(jnp.where(jnp.asarray(bit == 1), d, -jnp.inf), axis=-1)
        llrs.append(m0 - m1)
    return jnp.stack(llrs, axis=-1).reshape(*y.shape[:-1], -1)
