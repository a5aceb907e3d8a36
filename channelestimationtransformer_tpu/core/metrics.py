"""NMSE metrics, matching the reference's exact semantics.

Reference: ``Utils/metrics.py``.

Two deliberate quirks are preserved for metric parity (SURVEY.md §7.4 quirk 4):

- ``nmse`` normalizes by the power of the *target* ``x``
  (reference ``Utils/metrics.py:5-10``).
- ``nmse_split`` (the per-horizon variant) normalizes by the power of the
  *prediction* ``x_hat`` (reference ``Utils/metrics.py:26-30``), not the target.
"""

from __future__ import annotations

import jax.numpy as jnp


def nmse(x_hat: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Scalar NMSE = sum((x - x_hat)^2) / sum(x^2).

    Matches ``NMSE_cuda`` (reference ``Utils/metrics.py:5-10``). This is the
    training loss of every reference trainer.
    """
    power = jnp.sum(jnp.square(x))
    mse = jnp.sum(jnp.square(x - x_hat))
    return mse / power


def nmse_split(x_hat: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Per-horizon NMSE: reduce over (batch, feature) dims, keep the time dim.

    For ``[B, L, D]`` inputs returns a length-``L`` vector. NOTE: normalized by
    prediction power ``sum(x_hat^2)``, replicating the reference's quirk
    (``NMSE_Split_cuda``, reference ``Utils/metrics.py:26-30``).
    """
    power = jnp.sum(jnp.square(x_hat), axis=(0, 2))
    mse = jnp.sum(jnp.square(x - x_hat), axis=(0, 2))
    return mse / power


def nmse_db(nmse_linear) -> jnp.ndarray:
    """Linear NMSE -> dB (10*log10)."""
    return 10.0 * jnp.log10(nmse_linear)
