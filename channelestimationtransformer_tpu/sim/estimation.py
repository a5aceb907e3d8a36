"""LS channel estimation and LMMSE equalization.

Reference: Sionna's ``LSChannelEstimator`` + ``LMMSEEqualizer`` as configured
in ``MimoSimulation/KerasFullSimulation.py:200-241``.
"""

from __future__ import annotations

import jax.numpy as jnp


def ls_estimate(y_pilot: jnp.ndarray, x_pilot: jnp.ndarray) -> jnp.ndarray:
    """Least-squares estimate from known pilots: ``h_hat = y / x`` per
    pilot-carrying resource element. Shapes broadcast; ``x_pilot`` nonzero."""
    return y_pilot / x_pilot


def lmmse_equalize(
    y: jnp.ndarray, h: jnp.ndarray, noise_var
) -> jnp.ndarray:
    """LMMSE equalizer for ``y [..., n_rx]`` received over ``h [..., n_rx,
    n_streams]``: ``x_hat = (H^H H + sigma^2 I)^-1 H^H y``."""
    hh = jnp.conj(jnp.swapaxes(h, -1, -2))
    n_s = h.shape[-1]
    gram = hh @ h + noise_var * jnp.eye(n_s, dtype=h.dtype)
    rhs = (hh @ y[..., None])[..., 0]
    return jnp.linalg.solve(gram, rhs[..., None])[..., 0]
