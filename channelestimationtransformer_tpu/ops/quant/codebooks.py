"""Quantization codebooks: Fibonacci, fibbinary (no-adjacent-ones).

Reference:
- Fibonacci sequence codebook: ``quant_cpu.cpp:214-231`` ``generateFibonacci``
  (scaled Fibonacci numbers ``2^-fl * fib`` up to ``2^(wl-fl-1)``, positive only).
- No-adjacent-ones / fibbinary codewords: ``quant_cpu.cpp:287-310``
  ``generateNonAdjacentOnesSequences`` (all wl-bit strings with no two adjacent
  1 bits, interpreted as non-negative ints, scaled by ``2^-fl``); the QAT
  Fibonacci study uses exactly these
  (``…Fibonacci/qtorch/quant/quant_cuda/quant.cu:241-247``).
- LSQ-fibbinary codebook: ``models/InformerLSQFibbinary/LSQ.py:48-54`` — the
  fibbinary generator filtered to ``bit_length() <= nbits-1`` and mirrored to
  negative values (weights are signed in LSQ space).

All are tiny (<= ~2^(wl-1) entries) and built in NumPy at trace time; the
nearest-codeword search is a vectorized argmin on device, replacing the
reference's CUDA linear-scan kernel (``fibbinary_cpu/cpp_fibbinary_functions.cu``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def fibonacci_sequence_codebook(wl: int, fl: int) -> np.ndarray:
    """Scaled Fibonacci numbers (reference ``generateFibonacci``): starts with
    two ``2^-fl`` entries; grows while ``fib[-1]+fib[-2] <= 2^(wl-fl-1)``."""
    res = 2.0 ** (-fl)
    limit = 2.0 ** (wl - fl - 1)
    seq = [res, res]
    while seq[-1] + seq[-2] <= limit:
        seq.append(seq[-1] + seq[-2])
    return np.unique(np.asarray(seq, dtype=np.float64))


def fibbinary_ints(max_bits: int) -> np.ndarray:
    """All non-negative integers representable in ``max_bits`` bits with no two
    adjacent 1 bits (the 'fibbinary' numbers), ascending.

    Equivalent to the reference's backtracking generator
    (``quant_cpu.cpp:287-310``) and the bit-trick generator
    (``models/InformerLSQFibbinary/LSQ.py:48-54``: ``y = ~(x >> 1);
    x = (x - y) & y``).
    """
    out = []
    x = 0
    while x < (1 << max_bits):
        out.append(x)
        y = ~(x >> 1)
        x = (x - y) & y
    return np.asarray(out, dtype=np.int64)


def fibbinary_codebook(wl: int, fl: int) -> np.ndarray:
    """Non-negative fibbinary codewords of ``wl`` bits scaled by ``2^-fl``
    (reference ``noAdjecentOnes`` / QAT-Fibonacci codebook)."""
    return fibbinary_ints(wl).astype(np.float64) / (1 << fl) if fl >= 0 else (
        fibbinary_ints(wl).astype(np.float64) * (1 << -fl)
    )


def lsq_fibbinary_codebook(nbits: int) -> np.ndarray:
    """Signed LSQ codebook: fibbinary ints with ``bit_length() <= nbits - 1``,
    mirrored to negative (reference ``models/InformerLSQFibbinary/LSQ.py:93-105``)."""
    pos = [int(v) for v in fibbinary_ints(max(nbits - 1, 1)) if int(v).bit_length() <= nbits - 1]
    vals = sorted(set([-v for v in pos] + pos))
    return np.asarray(vals, dtype=np.float64)


def nearest_codeword(x: jnp.ndarray, codebook) -> jnp.ndarray:
    """Snap each element of ``x`` to its nearest codebook entry.

    Vectorized ``argmin |x[..., None] - cb|`` — the TPU replacement for the
    reference's one-thread-per-element CUDA scan
    (``fibbinary_cpu/cpp_fibbinary_functions.cu:7-43``). Ties resolve to the
    lower-index (smaller) codeword, like the reference's strict-< scan.
    """
    cb = jnp.asarray(codebook, dtype=x.dtype)
    idx = jnp.argmin(jnp.abs(x[..., None] - cb), axis=-1)
    return cb[idx]
