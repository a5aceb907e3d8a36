"""End-to-end dataset generation: CDL sample -> beam sweep -> WindowDataset.

Replaces the reference's three-stage host pipeline
(``GenerateChannelsFreqPreMatlab.py`` -> ``Beamforming.m`` ->
``GenerateChannelsFreqPostMatlab.py``, orchestrated by
``generateDataset.sbatch:12-51``) with one jitted JAX program; the result can
stay resident in device HBM or be pickled in the reference's exact format
(complex ``[N, slots, Nr, Nt]``) for interchange.
"""

from __future__ import annotations

import pickle
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.windows import WindowDataset, pack_features
from .beamforming import beam_sweep_project, dft_codebook_ri, standardize_time_series
from .cdl import CDLModel, generate_cdl_channel


def generate_beamformed_dataset(
    key: jax.Array,
    *,
    model: CDLModel = CDLModel(),
    num_samples: int = 512,
    num_slots: int = 150,
    num_beams_selected: int = 4,
    batch_size: int = 128,
    standardize: bool = True,
) -> jnp.ndarray:
    """Generate ``[num_samples, num_slots, Nr, Nt=beams]`` effective channels.

    Output layout matches the repacked reference pickles
    (``GenerateChannelsFreqPostMatlab.py:23-48``: ``[B*Sc, Slot, Nr, Nt]``) in
    the ri representation ``[N, slots, Nr, Nt, 2]``. Generation is chunked by
    ``batch_size`` to bound peak memory (the 64-antenna pre-beamforming
    channel is the big intermediate).
    """
    codebook = dft_codebook_ri(model.num_bs_ant)
    chunks = []
    remaining = num_samples
    while remaining > 0:
        b = min(batch_size, remaining)
        key, sub = jax.random.split(key)
        h = generate_cdl_channel(sub, model, b, num_slots)  # [b, T, U, S, 2]
        h_eff, _ = beam_sweep_project(h, codebook, num_beams_selected)
        if standardize:
            h_eff = standardize_time_series(h_eff)
        # [b, T, beams, U, 2] -> [b, T, U, beams, 2]: the reference repack
        # transposes to [Nr=Rx, Nt=beam] (GenerateChannelsFreqPostMatlab.py:9).
        chunks.append(jnp.swapaxes(h_eff, 2, 3))
        remaining -= b
    return jnp.concatenate(chunks, axis=0)


def make_window_dataset(
    key: jax.Array,
    *,
    model: CDLModel = CDLModel(),
    num_samples: int = 512,
    num_slots: int = 150,
    seq_len: int = 90,
    pred_len: int = 5,
    snr_db: float = 21.0,
) -> WindowDataset:
    """Convenience: generate and wrap in a :class:`WindowDataset`."""
    h = generate_beamformed_dataset(
        key, model=model, num_samples=num_samples, num_slots=num_slots
    )
    return WindowDataset(
        h=pack_features(h), seq_len=seq_len, pred_len=pred_len, snr_db=snr_db
    )


def save_reference_format(path: str, h: jnp.ndarray) -> None:
    """Pickle in the reference's dataset format (complex ndarray
    ``[N, slots, Nr, Nt]``), interoperable with ``SeqData``. Accepts the ri
    representation and recombines to complex on host."""
    arr = np.asarray(h)
    if arr.shape[-1] == 2 and not np.iscomplexobj(arr):
        arr = arr[..., 0] + 1j * arr[..., 1]
    with open(path, "wb") as f:
        pickle.dump(arr.astype(np.complex64), f)


def train_val_split(
    h: jnp.ndarray, val_fraction: float = 0.2
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """80/20 split like ``GenerateChannelsFreqPostMatlab.py:49-57``."""
    n = h.shape[0]
    n_val = int(n * val_fraction)
    return h[: n - n_val], h[n - n_val :]


def generate_beamformed_dataset_sharded(
    key: jax.Array,
    mesh,
    *,
    model: CDLModel = CDLModel(),
    num_samples: int = 512,
    num_slots: int = 150,
    num_beams_selected: int = 4,
    standardize: bool = True,
    axis_name: str = "data",
) -> jnp.ndarray:
    """Sample-sharded dataset generation over a mesh ``data`` axis.

    Each device draws its own shard with a device-invariant RNG fold
    (``fold_in(key, axis_index)``, SURVEY §7.3 multi-host input pipeline),
    so the global dataset is deterministic w.r.t. ``key`` regardless of the
    mesh size, and the output stays sharded on ``data`` — ready to feed the
    data-parallel Trainer without a resharding collective.
    """
    from jax.sharding import PartitionSpec as P

    n_shards = mesh.shape[axis_name]
    if num_samples % n_shards:
        raise ValueError(f"num_samples {num_samples} not divisible by "
                         f"{axis_name} axis size {n_shards}")
    per = num_samples // n_shards
    codebook = dft_codebook_ri(model.num_bs_ant)

    def local(key):
        k = jax.random.fold_in(key[0], jax.lax.axis_index(axis_name))
        h = generate_cdl_channel(k, model, per, num_slots)
        h_eff, _ = beam_sweep_project(h, codebook, num_beams_selected)
        if standardize:
            h_eff = standardize_time_series(h_eff)
        return jnp.swapaxes(h_eff, 2, 3)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis_name),), out_specs=P(axis_name),
    )
    # one key per shard slot (content comes from the fold, not the split)
    keys = jnp.broadcast_to(key, (n_shards,) + key.shape)
    return fn(keys)
