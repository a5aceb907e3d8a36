"""Complex<->real packing, channel normalization, AWGN — pure JAX, jit-safe.

Reference: ``Utils/dataset.py`` (``LoadBatch:20-44``, ``real2complex:47-51``,
``noise:54-74``, ``channelnorm:77-88``). Same numeric semantics, but:

- fully functional (RNG threaded via ``jax.random`` keys instead of global torch RNG),
- batched and device-resident (no per-sample host loops),
- float32 throughout; the train step may downcast activations to bfloat16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Real/imag-pair ("ri") representation.
#
# TPUs have no native complex arithmetic — XLA decomposes complex HLO into
# real ops — and the experimental runtime rejects complex arrays at program
# boundaries (transfers and some fused executables). The framework therefore
# keeps channels as float32 ``[..., 2]`` re/im pairs at ALL jit boundaries;
# complex dtype is only materialized transiently inside a program (or on CPU
# for interchange with reference-format pickles).
# ---------------------------------------------------------------------------


def to_ri(h: jnp.ndarray) -> jnp.ndarray:
    """complex ``[...]`` -> float32 ``[..., 2]`` (re, im)."""
    return jnp.stack([h.real, h.imag], axis=-1).astype(jnp.float32)


def from_ri(x: jnp.ndarray) -> jnp.ndarray:
    """float32 ``[..., 2]`` -> complex64 ``[...]`` (use only inside programs
    or on CPU)."""
    return (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)


def ri_abs2(x: jnp.ndarray) -> jnp.ndarray:
    """|h|^2 for the ri representation: re^2 + im^2, shape ``[...]``."""
    return x[..., 0] ** 2 + x[..., 1] ** 2


def ri_channel_norm(x: jnp.ndarray, axis=None) -> jnp.ndarray:
    """:func:`channel_norm` on the ri representation. ``axis`` indexes the
    *complex* dims (negative, excluding the trailing ri axis)."""
    if axis is None:
        power = jnp.mean(ri_abs2(x))
        return x / jnp.sqrt(power)
    axes = tuple(a - 1 if a < 0 else a for a in axis)
    power = jnp.mean(ri_abs2(x), axis=axes, keepdims=True)
    return x / jnp.sqrt(power)[..., None]


def ri_awgn(key: jax.Array, x: jnp.ndarray, snr_db: float, axis=None) -> jnp.ndarray:
    """:func:`awgn` on the ri representation (same SNR convention)."""
    sigma = 10.0 ** (-snr_db / 10.0)
    noise = jnp.sqrt(sigma / 2.0) * jax.random.normal(key, x.shape, dtype=x.dtype)
    if axis is None:
        rms = jnp.sqrt(jnp.mean(ri_abs2(x)))
    else:
        axes = tuple(a - 1 if a < 0 else a for a in axis)
        rms = jnp.sqrt(jnp.mean(ri_abs2(x), axis=axes, keepdims=True))[..., None]
    return x + noise * rms


def ri_pack(x: jnp.ndarray) -> jnp.ndarray:
    """ri channel ``[..., T, Nr, Nt, 2]`` -> features ``[..., T, Nr*Nt*2]``.

    A pure reshape: the ``[Nr, Nt, (re, im)]`` minor dims flatten exactly into
    the LoadBatch interleaved layout (``Utils/dataset.py:20-44``).
    """
    *lead, t, nr, nt, two = x.shape
    return x.reshape(*lead, t, nr * nt * two)


def complex_to_real(h: jnp.ndarray) -> jnp.ndarray:
    """Flatten a complex channel ``[..., T, Nr, Nt]`` to real features
    ``[..., T, Nr*Nt*2]`` with real/imag interleaved as last-dim pairs.

    Matches ``LoadBatch`` (reference ``Utils/dataset.py:20-44``): the complex
    matrix is flattened to ``Nr*Nt`` then each entry expands to ``(re, im)``.
    """
    *lead, t, nr, nt = h.shape
    hf = h.reshape(*lead, t, nr * nt)
    packed = jnp.stack([hf.real, hf.imag], axis=-1)
    return packed.reshape(*lead, t, nr * nt * 2).astype(jnp.float32)


def real_to_complex(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`complex_to_real` on the flattened feature dim.

    ``[..., P, N]`` real with N even -> ``[..., P, N//2]`` complex
    (reference ``Utils/dataset.py:47-51``).
    """
    *lead, p, n = x.shape
    x2 = x.reshape(*lead, p, n // 2, 2)
    return x2[..., 0] + 1j * x2[..., 1]


def channel_norm(h: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Normalize by RMS magnitude: ``h / sqrt(mean(|h|^2))``
    (reference ``Utils/dataset.py:77-88``).

    ``axis=None`` reduces over the whole array (the reference normalizes each
    dataset sample independently — pass the per-sample axes when batching,
    e.g. ``axis=(-3, -2, -1)`` for ``[B, T, Nr, Nt]``).
    """
    power = jnp.mean(jnp.square(jnp.abs(h)), axis=axis, keepdims=axis is not None)
    return h / jnp.sqrt(power)


def awgn(key: jax.Array, h: jnp.ndarray, snr_db: float, axis=None) -> jnp.ndarray:
    """Add complex white Gaussian noise at ``snr_db`` relative to signal power.

    Matches the reference convention (``Utils/dataset.py:54-74``):
    ``sigma = 10^(-SNR/10)``; noise ~ sqrt(sigma/2)*(N(0,1)+jN(0,1)), then scaled
    by the channel RMS magnitude so the SNR is relative to actual signal power.

    ``axis`` selects the dims over which signal power is measured (None = all,
    matching the reference's per-sample call; pass per-sample axes when batched).
    """
    sigma = 10.0 ** (-snr_db / 10.0)
    kr, ki = jax.random.split(key)
    noise = jnp.sqrt(sigma / 2.0) * (
        jax.random.normal(kr, h.shape) + 1j * jax.random.normal(ki, h.shape)
    )
    rms = jnp.sqrt(
        jnp.mean(jnp.square(jnp.abs(h)), axis=axis, keepdims=axis is not None)
    )
    return h + noise * rms
