"""Device-resident windowed dataset — the TPU-native successor of ``SeqData``.

Reference: ``Utils/dataset.py:91-153``. The reference keeps the pickled dataset
on host and a torch DataLoader draws one random window per ``__getitem__`` with
per-sample normalization + AWGN, then ships batches H2D every step.

Here the whole dataset lives in device HBM in the **packed-feature layout**:
float32 ``[N, slots, F]`` where ``F = Nr*Nt*2`` is exactly the LoadBatch
feature interleaving (re/im pairs, ``Utils/dataset.py:20-44``). Rationale:

- complex dtype never crosses a program boundary (TPUs have no native complex;
  the runtime rejects complex executables' interfaces — see ``data/packing.py``),
- the last dim is the model's feature dim (16+), not a 2-wide ri axis that
  wastes 126/128 lanes of the VPU tile,
- feature packing for the model becomes a no-op.

A whole batch of windows is drawn *inside jit*: random sample indices + random
window starts -> ``vmap(dynamic_slice)``, then normalization and AWGN, all
fused by XLA. No host in the loop, no per-step H2D copies.
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack_features(h_ri: jnp.ndarray) -> jnp.ndarray:
    """ri channel ``[..., T, Nr, Nt, 2]`` -> packed ``[..., T, Nr*Nt*2]``
    (pure reshape; equals the reference LoadBatch layout)."""
    *lead, t, nr, nt, two = h_ri.shape
    return h_ri.reshape(*lead, t, nr * nt * two)


@dataclasses.dataclass(frozen=True)
class WindowDataset:
    """A channel dataset of shape ``[N, slots, F]`` (packed ri) in device HBM.

    ``F`` holds ``F/2`` complex coefficients as (re, im) pairs; per-sample
    complex power is ``2 * mean(x^2)`` over the packed features.
    """

    h: jnp.ndarray  # float32 [N, slots, features]
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
        return self.h.shape[-1]

    @classmethod
    def from_pickle(cls, path: str, *, seq_len: int, pred_len: int, snr_db: float):
        """Load a reference-format pickled dataset (complex ``[N, slots, Nr,
        Nt]``, as produced by ``GenerateChannelsFreqPostMatlab.py``); packs to
        the feature layout on host before the (real) H2D transfer."""
        with open(path, "rb") as f:
            arr = pickle.load(f)
        arr = np.asarray(arr)
        n, slots, nr, nt = arr.shape
        ri = np.stack([arr.real, arr.imag], axis=-1).astype(np.float32)
        return cls(
            h=jnp.asarray(ri.reshape(n, slots, nr * nt * 2)),
            seq_len=seq_len,
            pred_len=pred_len,
            snr_db=snr_db,
        )


def _complex_rms(x: jnp.ndarray, axis) -> jnp.ndarray:
    """sqrt(mean |h|^2) over packed features: mean|h|^2 == 2*mean(x^2)."""
    return jnp.sqrt(2.0 * jnp.mean(jnp.square(x), axis=axis, keepdims=True))


def sample_windows(
    key: jax.Array,
    dataset: WindowDataset,
    batch_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Draw one batch of random windows. Returns ``(H, H_noise, H_seq, H_pred)``
    exactly like ``SeqData.__getitem__`` (reference ``Utils/dataset.py:124-153``),
    in the packed layout ``[B, ., F]``:

    - ``H``       clean window (L = seq+pred slots)
    - ``H_noise`` noisy window (AWGN applied to the whole normalized sample
      before slicing; SNR relative to per-sample RMS signal power, matching
      the reference ``noise()`` convention)
    - ``H_seq``   noisy history, first ``seq_len`` slots
    - ``H_pred``  clean future, last ``pred_len`` slots
    """
    h = dataset.h
    n, slots, feat = h.shape
    length = dataset.length

    k_idx, k_start, k_noise = jax.random.split(key, 3)
    idx = jax.random.randint(k_idx, (batch_size,), 0, n)
    starts = jax.random.randint(k_start, (batch_size,), 0, slots - length + 1)

    samples = h[idx]  # [B, slots, F]
    # Per-sample channelnorm (Utils/dataset.py:77-88): unit complex RMS.
    rms = _complex_rms(samples, axis=(1, 2))
    samples = samples / rms

    # AWGN at snr_db relative to (now unit) signal power; each of re/im gets
    # N(0, sigma/2) like the reference's complex noise (Utils/dataset.py:54-74).
    sigma = 10.0 ** (-dataset.snr_db / 10.0)
    noise = jnp.sqrt(sigma / 2.0) * jax.random.normal(k_noise, samples.shape)
    noisy = samples + noise * _complex_rms(samples, axis=(1, 2))

    def window(x, start):
        return jax.lax.dynamic_slice(x, (start, 0), (length, feat))

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
    _, _, enc_in, target = sample_windows(key, dataset, batch_size)
    label = enc_in[:, enc_in.shape[1] - label_len :]
    zeros = jnp.zeros((enc_in.shape[0], target.shape[1], enc_in.shape[2]), enc_in.dtype)
    dec_in = jnp.concatenate([label, zeros], axis=1)
    return enc_in, dec_in, target
