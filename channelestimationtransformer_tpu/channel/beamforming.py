"""DFT codebook + beam training, vectorized — replaces the MATLAB stage.

Reference: ``GenerateDatasets/getDFTCodebook.m:1-30`` (codebook) and
``GenerateDatasets/Beamforming.m:52-119`` (per-slot 64-beam power sweep,
top-4-per-slot histogram over all slots, projection onto the 4 winners).

The MATLAB triple loop (batch x slot x beam) becomes two einsums and a
scatter-add histogram; the whole beam-training stage for a [128, 150] batch is
one fused XLA program on the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def dft_codebook(num_elements: int) -> jnp.ndarray:
    """DFT beam codebook ``[num_elements, num_beams=num_elements]``.

    Matches ``getDFTCodebook.m`` for a horizontal ULA (Ntv=1): beam k has
    weights ``w_s = exp(j*2*pi*(s - N/2) * k/N) / sqrt(N)``.
    """
    n = num_elements
    s = np.arange(n) - n / 2.0
    k = np.arange(n) / n
    beams = np.exp(2j * np.pi * np.outer(s, k)) / np.sqrt(n)
    return jnp.asarray(beams, dtype=jnp.complex64)


@partial(jax.jit, static_argnames=("num_selected",))
def beam_sweep_project(
    h: jnp.ndarray,
    codebook: jnp.ndarray,
    num_selected: int = 4,
):
    """Beam training + projection for a batch of channel trajectories.

    Args:
      h: complex ``[B, T, U, S]`` (rx antennas U, tx antennas S).
      codebook: ``[S, num_beams]``.
      num_selected: beams kept (reference: 4).

    Returns:
      ``(h_eff, selected)`` where ``h_eff`` is complex ``[B, T, num_selected, U]``
      (beam-projected effective channel, the ``H_channel`` layout of
      ``Beamforming.m:106-118``) and ``selected`` is ``[B, num_selected]`` beam
      indices.

    Selection mirrors the MATLAB exactly: per slot, rank beams by received
    power ``sum_u |(H f)_u|^2``; take the top ``num_selected`` per slot; count
    how often each beam appears across slots; keep the ``num_selected`` most
    frequent (``Beamforming.m:68-104``).
    """
    num_beams = codebook.shape[1]

    # Projection of every beam at every slot: [B, T, U, beams].
    proj = jnp.einsum("btus,sk->btuk", h, codebook)
    power = jnp.sum(jnp.abs(proj) ** 2, axis=2)  # [B, T, beams]

    _, top_per_slot = jax.lax.top_k(power, num_selected)  # [B, T, num_selected]

    # Histogram of per-slot winners over (slots x rank).
    flat = top_per_slot.reshape(h.shape[0], -1)  # [B, T*num_selected]
    counts = jax.vmap(
        lambda idx: jnp.zeros(num_beams, jnp.int32).at[idx].add(1)
    )(flat)
    _, selected = jax.lax.top_k(counts, num_selected)  # [B, num_selected]

    # Gather the winners' projections: proj is [B, T, U, beams].
    h_eff = jnp.take_along_axis(
        proj, selected[:, None, None, :], axis=3
    )  # [B, T, U, num_selected]
    h_eff = jnp.swapaxes(h_eff, 2, 3)  # [B, T, num_selected, U]
    return h_eff, selected


def standardize_time_series(h_eff: jnp.ndarray) -> jnp.ndarray:
    """Per-(beam, rx) complex z-score over the slot axis.

    Matches MATLAB ``normalize(H_channel_batch)`` (``Beamforming.m:119``),
    which standardizes each time series along the first non-singleton (slot)
    dimension before saving.
    """
    mean = jnp.mean(h_eff, axis=1, keepdims=True)
    centered = h_eff - mean
    # MATLAB std of complex data: sqrt(E|x - mean|^2) with N-1 normalization.
    var = jnp.sum(jnp.abs(centered) ** 2, axis=1, keepdims=True) / (
        h_eff.shape[1] - 1
    )
    return centered / jnp.sqrt(var)
