"""OFDM modulation and the time-domain channel path.

Reference: ``MimoSimulation/KerasFullSimulation.py`` simulates the link either
in the frequency domain (per-subcarrier multiplication) or the time domain
(OFDMModulator -> CIR convolution -> OFDMDemodulator, the ``domain == "time"``
branch around ``KerasFullSimulation.py:243-317``). This module supplies the
time-domain branch TPU-natively: IFFT/FFT ride XLA's batched FFT, the
tapped-delay-line channel is one causal convolution expressed as a matmul over
a [fft+cp, taps] window stack (MXU-friendly for batched symbols), and with a
cyclic prefix at least as long as the delay spread the round trip equals the
frequency-domain model exactly — which is the invariant the tests pin down.

Complex tensors live as native complex64 *inside* the jitted sim (XLA lowers
complex arithmetic to real pairs internally); program boundaries stay real
(core.packing), per the framework-wide convention.
"""

from __future__ import annotations

import jax.numpy as jnp


def ofdm_modulate(x_freq: jnp.ndarray, cp_len: int) -> jnp.ndarray:
    """Frequency-domain symbols -> CP-prefixed time-domain signal.

    ``x_freq``: complex [..., num_symbols, fft_size]. Returns complex
    [..., num_symbols, cp_len + fft_size]. Unitary normalization (norm="ortho")
    keeps symbol energy identical in both domains.
    """
    x_time = jnp.fft.ifft(x_freq, axis=-1, norm="ortho")
    cp = x_time[..., -cp_len:] if cp_len else x_time[..., :0]
    return jnp.concatenate([cp, x_time], axis=-1)


def ofdm_demodulate(y_time: jnp.ndarray, fft_size: int, cp_len: int) -> jnp.ndarray:
    """Strip the cyclic prefix and return per-subcarrier symbols."""
    y = y_time[..., cp_len : cp_len + fft_size]
    return jnp.fft.fft(y, axis=-1, norm="ortho")


def apply_time_channel(x_time: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Causal tapped-delay-line channel, per OFDM symbol.

    ``x_time``: complex [..., num_symbols, sym_len]; ``taps``: complex
    [..., num_taps] (broadcast over symbols). Returns the same shape as
    ``x_time`` (the inter-symbol tail is truncated; with ``cp_len >=
    num_taps - 1`` the CP absorbs all intra-symbol memory, so the truncation
    only drops energy that the demodulator would discard anyway).

    Implemented as a window-stack matmul rather than an explicit conv: for the
    short delay spreads here (tens of taps) XLA maps the [sym_len, taps] x
    [taps] contraction straight onto the MXU for batched symbols.
    """
    num_taps = taps.shape[-1]
    sym_len = x_time.shape[-1]
    pad = jnp.zeros((*x_time.shape[:-1], num_taps - 1), x_time.dtype)
    xp = jnp.concatenate([pad, x_time], axis=-1)
    # windows[..., t, k] = x[t - k] (k-th delayed copy)
    windows = jnp.stack(
        [xp[..., num_taps - 1 - k : num_taps - 1 - k + sym_len] for k in range(num_taps)],
        axis=-1,
    )
    # windows: [..., num_symbols, sym_len, taps]; taps broadcast over symbols.
    return jnp.einsum("...stk,...k->...st", windows, taps)


def taps_to_frequency_response(taps: jnp.ndarray, fft_size: int) -> jnp.ndarray:
    """CIR taps -> per-subcarrier frequency response H[f] = FFT(taps)."""
    num_taps = taps.shape[-1]
    pad = jnp.zeros((*taps.shape[:-1], fft_size - num_taps), taps.dtype)
    return jnp.fft.fft(jnp.concatenate([taps, pad], axis=-1), axis=-1)
