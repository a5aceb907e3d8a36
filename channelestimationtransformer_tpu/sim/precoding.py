"""ZF precoding and spectral efficiency.

Reference: ``MimoSimulation/utils.py`` ZF precoder helpers and
``SpectralEfficiency(WIP)/NMSEvsSpectralEfficiency.py:30-67``
(``log2 det(I + SNR * H H^H)`` with ZF on estimated vs actual channels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _as_complex(h: jnp.ndarray) -> jnp.ndarray:
    """Accept complex ``[..., nr, nt]`` or real-pair ``[..., nr, nt, 2]``
    (real pairs at program boundaries; complex inside — framework convention)."""
    if jnp.iscomplexobj(h):
        return h
    if h.shape[-1] == 2:
        return jax.lax.complex(h[..., 0], h[..., 1])
    raise ValueError(f"expected complex or trailing real-pair, got {h.shape}")


def zf_precoder(h: jnp.ndarray) -> jnp.ndarray:
    """Zero-forcing precoder for ``h [..., n_rx, n_tx]``: the right pseudo-
    inverse, normalized to unit total transmit power per stream set."""
    h = _as_complex(h)
    hh = jnp.conj(jnp.swapaxes(h, -1, -2))
    inv = jnp.linalg.inv(h @ hh)
    p = hh @ inv  # [..., n_tx, n_rx]
    norm = jnp.sqrt(
        jnp.sum(jnp.abs(p) ** 2, axis=(-2, -1), keepdims=True)
    )
    return p / jnp.maximum(norm, 1e-12)


def spectral_efficiency(h: jnp.ndarray, snr_linear) -> jnp.ndarray:
    """``log2 det(I + SNR/Nrx * H H^H)`` bits/s/Hz for ``h [..., n_rx, n_tx]``
    (reference ``NMSEvsSpectralEfficiency.py:30-67``)."""
    h = _as_complex(h)
    n_rx = h.shape[-2]
    hh = jnp.conj(jnp.swapaxes(h, -1, -2))
    gram = h @ hh
    eye = jnp.eye(n_rx, dtype=gram.dtype)
    m = eye + (snr_linear / n_rx) * gram
    sign, logdet = jnp.linalg.slogdet(m)
    return (logdet / jnp.log(2.0)).real


def precoded_spectral_efficiency(
    h_true: jnp.ndarray, h_est: jnp.ndarray, snr_linear
) -> jnp.ndarray:
    """Spectral efficiency when precoding with an *estimated/predicted* channel
    but transmitting over the true one — the NMSE->SE degradation curve the
    reference's WIP study targets."""
    p = zf_precoder(h_est)  # [..., n_tx, n_rx]
    h_eff = _as_complex(h_true) @ p  # [..., n_rx, n_rx]
    return spectral_efficiency(h_eff, snr_linear)
