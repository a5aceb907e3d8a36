"""Device-resident windowed dataset — the TPU-native successor of ``SeqData``.

Reference: ``Utils/dataset.py:91-153``. The reference keeps the pickled dataset
on host and a torch DataLoader draws one random window per ``__getitem__`` with
per-sample normalization + AWGN, then ships batches H2D every step.

Here the whole dataset lives in device HBM in the **ri representation**
(float32 ``[N, slots, Nr, Nt, 2]`` — see ``data/packing.py``: complex is kept
off program boundaries on TPU) and an entire batch of windows is drawn *inside
jit*: random sample indices + random window starts -> ``vmap(dynamic_slice)``,
then normalization, AWGN, and feature packing (a pure reshape), all fused by
XLA. No host in the loop, no per-step H2D copies.
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .packing import ri_awgn, ri_channel_norm, ri_pack


@dataclasses.dataclass(frozen=True)
class WindowDataset:
    """A channel dataset of shape ``[N, slots, Nr, Nt, 2]`` (ri) in device HBM."""

    h: jnp.ndarray  # float32 [N, slots, nr, nt, 2]
    seq_len: int
    pred_len: int
    snr_db: float

    @property
    def length(self) -> int:
        return self.seq_len + self.pred_len

    @property
    def num_samples(self) -> int:
        return self.h.shape[0]

    @property
    def features(self) -> int:
        return self.h.shape[2] * self.h.shape[3] * 2

    @classmethod
    def from_pickle(cls, path: str, *, seq_len: int, pred_len: int, snr_db: float):
        """Load a reference-format pickled dataset (complex ``[N, slots, Nr,
        Nt]``, as produced by ``GenerateChannelsFreqPostMatlab.py``); converts
        to the ri representation on host before the (real) H2D transfer."""
        with open(path, "rb") as f:
            arr = pickle.load(f)
        arr = np.asarray(arr)
        ri = np.stack([arr.real, arr.imag], axis=-1).astype(np.float32)
        return cls(h=jnp.asarray(ri), seq_len=seq_len, pred_len=pred_len, snr_db=snr_db)


def sample_windows(
    key: jax.Array,
    dataset: WindowDataset,
    batch_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Draw one batch of random windows. Returns ``(H, H_noise, H_seq, H_pred)``
    exactly like ``SeqData.__getitem__`` (reference ``Utils/dataset.py:124-153``),
    in the ri representation ``[B, ., Nr, Nt, 2]``:

    - ``H``       clean window (L = seq+pred slots)
    - ``H_noise`` noisy window (AWGN applied to the whole normalized sample
      before slicing, per-sample RMS-relative SNR)
    - ``H_seq``   noisy history, first ``seq_len`` slots
    - ``H_pred``  clean future, last ``pred_len`` slots
    """
    h = dataset.h
    n, slots, nr, nt, _ = h.shape
    length = dataset.length

    k_idx, k_start, k_noise = jax.random.split(key, 3)
    idx = jax.random.randint(k_idx, (batch_size,), 0, n)
    starts = jax.random.randint(k_start, (batch_size,), 0, slots - length + 1)
    noise_keys = jax.random.split(k_noise, batch_size)

    samples = h[idx]  # [B, slots, nr, nt, 2]
    samples = ri_channel_norm(samples, axis=(-3, -2, -1))
    noisy = jax.vmap(lambda k, s: ri_awgn(k, s, dataset.snr_db))(noise_keys, samples)

    def window(x, start):
        return jax.lax.dynamic_slice(x, (start, 0, 0, 0), (length, nr, nt, 2))

    h_clean = jax.vmap(window)(samples, starts)
    h_noisy = jax.vmap(window)(noisy, starts)
    h_seq = h_noisy[:, : dataset.seq_len]
    h_pred = h_clean[:, dataset.seq_len :]
    return h_clean, h_noisy, h_seq, h_pred


def make_batch(
    key: jax.Array,
    dataset: WindowDataset,
    batch_size: int,
    label_len: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One jit-safe training batch in the Informer's real-feature layout.

    Returns ``(enc_in, dec_in, target)``:

    - ``enc_in``  ``[B, seq_len, F]`` noisy history features,
    - ``dec_in``  ``[B, label_len+pred_len, F]`` = last ``label_len`` noisy slots
      followed by zeros for the ``pred_len`` slots to predict (reference decoder
      input construction, ``FullPrecision/QuantizationAwareTraining.py:224-240``),
    - ``target``  ``[B, pred_len, F]`` clean future features.
    """
    _, _, h_seq, h_pred = sample_windows(key, dataset, batch_size)
    enc_in = ri_pack(h_seq)
    target = ri_pack(h_pred)
    label = enc_in[:, enc_in.shape[1] - label_len :]
    zeros = jnp.zeros((enc_in.shape[0], target.shape[1], enc_in.shape[2]), enc_in.dtype)
    dec_in = jnp.concatenate([label, zeros], axis=1)
    return enc_in, dec_in, target
