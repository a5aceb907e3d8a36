"""DFT codebook + beam training, vectorized — replaces the MATLAB stage.

Reference: ``GenerateDatasets/getDFTCodebook.m:1-30`` (codebook) and
``GenerateDatasets/Beamforming.m:52-119`` (per-slot 64-beam power sweep,
top-4-per-slot histogram over all slots, projection onto the 4 winners).

The MATLAB triple loop (batch x slot x beam) becomes two einsums and a
scatter-add histogram; the whole beam-training stage for a [128, 150] batch is
one fused XLA program on the MXU. All program boundaries use the ri
(re/im-pair float32) representation — see ``data/packing.py``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def dft_codebook(num_elements: int) -> np.ndarray:
    """DFT beam codebook ``[num_elements, num_beams=num_elements]`` (complex
    NumPy, host-side constant).

    Matches ``getDFTCodebook.m`` for a horizontal ULA (Ntv=1): beam k has
    weights ``w_s = exp(j*2*pi*(s - N/2) * k/N) / sqrt(N)``.
    """
    n = num_elements
    s = np.arange(n) - n / 2.0
    k = np.arange(n) / n
    return (np.exp(2j * np.pi * np.outer(s, k)) / np.sqrt(n)).astype(np.complex64)


def dft_codebook_ri(num_elements: int) -> jnp.ndarray:
    """ri representation ``[S, K, 2]`` of :func:`dft_codebook` for jit args."""
    cb = dft_codebook(num_elements)
    return jnp.asarray(np.stack([cb.real, cb.imag], axis=-1), jnp.float32)


@partial(jax.jit, static_argnames=("num_selected",))
def beam_sweep_project(
    h: jnp.ndarray,
    codebook: jnp.ndarray,
    num_selected: int = 4,
):
    """Beam training + projection for a batch of channel trajectories.

    Args:
      h: float32 ri ``[B, T, U, S, 2]`` (rx antennas U, tx antennas S).
      codebook: float32 ri ``[S, num_beams, 2]``.
      num_selected: beams kept (reference: 4).

    Returns:
      ``(h_eff, selected)``: ``h_eff`` float32 ri ``[B, T, num_selected, U, 2]``
      (beam-projected effective channel, the ``H_channel`` layout of
      ``Beamforming.m:106-118``) and ``selected`` ``[B, num_selected]`` beam
      indices.

    Selection mirrors the MATLAB exactly: per slot, rank beams by received
    power ``sum_u |(H f)_u|^2``; take the top ``num_selected`` per slot; count
    how often each beam appears across slots; keep the ``num_selected`` most
    frequent (``Beamforming.m:68-104``).
    """
    num_beams = codebook.shape[1]

    # Complex projection expressed on real pairs:
    # (hr + j hi)(cr + j ci) = (hr cr - hi ci) + j (hr ci + hi cr).
    hr, hi = h[..., 0], h[..., 1]
    cr, ci = codebook[..., 0], codebook[..., 1]
    pr = jnp.einsum("btus,sk->btuk", hr, cr) - jnp.einsum("btus,sk->btuk", hi, ci)
    pi = jnp.einsum("btus,sk->btuk", hr, ci) + jnp.einsum("btus,sk->btuk", hi, cr)

    power = jnp.sum(pr**2 + pi**2, axis=2)  # [B, T, beams]
    _, top_per_slot = jax.lax.top_k(power, num_selected)  # [B, T, num_selected]

    # Histogram of per-slot winners over (slots x rank).
    flat = top_per_slot.reshape(h.shape[0], -1)  # [B, T*num_selected]
    counts = jax.vmap(
        lambda idx: jnp.zeros(num_beams, jnp.int32).at[idx].add(1)
    )(flat)
    _, selected = jax.lax.top_k(counts, num_selected)  # [B, num_selected]

    # Gather the winners' projections: [B, T, U, beams] -> [B, T, U, sel].
    take = lambda p: jnp.take_along_axis(p, selected[:, None, None, :], axis=3)
    h_eff = jnp.stack([take(pr), take(pi)], axis=-1)  # [B, T, U, sel, 2]
    h_eff = jnp.swapaxes(h_eff, 2, 3)  # [B, T, sel, U, 2]
    return h_eff, selected


def standardize_time_series(h_eff: jnp.ndarray) -> jnp.ndarray:
    """Per-(beam, rx) complex z-score over the slot axis (axis 1), on the ri
    representation.

    Matches MATLAB ``normalize(H_channel_batch)`` (``Beamforming.m:119``):
    subtract the complex mean, divide by the N-1-normalized complex std.
    """
    mean = jnp.mean(h_eff, axis=1, keepdims=True)  # complex mean == per-channel
    centered = h_eff - mean
    var = jnp.sum(
        centered[..., 0] ** 2 + centered[..., 1] ** 2, axis=1, keepdims=True
    ) / (h_eff.shape[1] - 1)
    return centered / jnp.sqrt(var)[..., None]


def beam_sweep_project_sharded(
    h: jnp.ndarray,
    codebook: jnp.ndarray,
    num_selected: int,
    mesh,
    *,
    axis_name: str = "model",
):
    """Antenna-sharded beam sweep (SURVEY §2.7: shard the 64-antenna dim of
    the beamforming preprocessing across the mesh).

    The TX-antenna axis ``S`` of both the channel and the codebook is sharded
    over ``axis_name``; each device computes its partial complex projection
    ``sum_{s in shard} h_s f_{s,k}`` and one ``psum`` over the axis completes
    the beam projections — the ranking/histogram/gather then runs replicated
    (it is tiny). Numerically identical to :func:`beam_sweep_project`.
    """
    from jax.sharding import PartitionSpec as P

    def local(h_loc, cb_loc):
        hr, hi = h_loc[..., 0], h_loc[..., 1]
        cr, ci = cb_loc[..., 0], cb_loc[..., 1]
        pr = jnp.einsum("btus,sk->btuk", hr, cr) - jnp.einsum("btus,sk->btuk", hi, ci)
        pi = jnp.einsum("btus,sk->btuk", hr, ci) + jnp.einsum("btus,sk->btuk", hi, cr)
        pr = jax.lax.psum(pr, axis_name)
        pi = jax.lax.psum(pi, axis_name)

        num_beams = cb_loc.shape[1]
        power = jnp.sum(pr**2 + pi**2, axis=2)
        _, top_per_slot = jax.lax.top_k(power, num_selected)
        flat = top_per_slot.reshape(h_loc.shape[0], -1)
        counts = jax.vmap(
            lambda idx: jnp.zeros(num_beams, jnp.int32).at[idx].add(1)
        )(flat)
        _, selected = jax.lax.top_k(counts, num_selected)
        take = lambda p: jnp.take_along_axis(p, selected[:, None, None, :], axis=3)
        h_eff = jnp.stack([take(pr), take(pi)], axis=-1)
        return jnp.swapaxes(h_eff, 2, 3), selected

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, None, None, axis_name, None),  # h: shard S
            P(axis_name, None, None),  # codebook: shard S
        ),
        out_specs=(P(), P()),
    )
    return fn(h, codebook)
