"""Device-resident windowed dataset — the TPU-native successor of ``SeqData``.

Reference: ``Utils/dataset.py:91-153``. The reference keeps the pickled dataset
on host and a torch DataLoader draws one random window per ``__getitem__`` with
per-sample normalization + AWGN, then ships batches H2D every step.

Here the whole dataset lives in device HBM (it is small: ~50 MB complex64 for
6400x100x2x4) and an entire batch of windows is drawn *inside jit*:
random sample indices + random window starts -> ``vmap(dynamic_slice)``, then
normalization, AWGN, and complex->real packing, all fused by XLA. No host in
the loop, no H2D copies per step.
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .packing import awgn, channel_norm, complex_to_real


@dataclasses.dataclass(frozen=True)
class WindowDataset:
    """A complex channel dataset of shape ``[N, slots, Nr, Nt]`` in device memory."""

    h: jnp.ndarray  # complex64 [N, slots, nr, nt]
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
        """Load a reference-format pickled dataset (``[N, slots, Nr, Nt]`` complex),
        as produced by ``GenerateChannelsFreqPostMatlab.py`` in the reference."""
        with open(path, "rb") as f:
            arr = pickle.load(f)
        return cls(
            h=jnp.asarray(np.asarray(arr), dtype=jnp.complex64),
            seq_len=seq_len,
            pred_len=pred_len,
            snr_db=snr_db,
        )


def sample_windows(
    key: jax.Array,
    dataset: WindowDataset,
    batch_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Draw one batch of random windows. Returns ``(H, H_noise, H_seq, H_pred)``
    exactly like ``SeqData.__getitem__`` (reference ``Utils/dataset.py:124-153``):

    - ``H``       clean window, complex ``[B, L, Nr, Nt]`` (L = seq+pred)
    - ``H_noise`` noisy window (AWGN applied to the *whole* sample before slicing,
      per-sample RMS-relative SNR), complex ``[B, L, Nr, Nt]``
    - ``H_seq``   noisy history, first ``seq_len`` slots
    - ``H_pred``  clean future, last ``pred_len`` slots

    All jit-safe: static shapes, per-call RNG key.
    """
    h = dataset.h
    n, slots, nr, nt = h.shape
    length = dataset.length

    k_idx, k_start, k_noise = jax.random.split(key, 3)
    idx = jax.random.randint(k_idx, (batch_size,), 0, n)
    starts = jax.random.randint(k_start, (batch_size,), 0, slots - length + 1)
    noise_keys = jax.random.split(k_noise, batch_size)

    samples = h[idx]  # [B, slots, nr, nt]
    samples = channel_norm(samples, axis=(-3, -2, -1))
    noisy = jax.vmap(lambda k, s: awgn(k, s, dataset.snr_db))(noise_keys, samples)

    def window(x, start):
        return jax.lax.dynamic_slice(x, (start, 0, 0), (length, nr, nt))

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
    enc_in = complex_to_real(h_seq)
    target = complex_to_real(h_pred)
    label = enc_in[:, enc_in.shape[1] - label_len :]
    zeros = jnp.zeros((enc_in.shape[0], target.shape[1], enc_in.shape[2]), enc_in.dtype)
    dec_in = jnp.concatenate([label, zeros], axis=1)
    return enc_in, dec_in, target
