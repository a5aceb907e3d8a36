"""LSQ (learned step size quantization) layers + fibbinary-codebook variant.

Reference: ``models/InformerLSQ/LSQ.py`` (LinearLSQ/Conv1dLSQ) and
``models/InformerLSQFibbinary/LSQ.py`` (codebook round_pass backed by a CUDA
nearest-codeword extension — here a vectorized on-device argmin).

Semantics preserved exactly:
- ``step_size`` initialized to ``mean(|w|)/sqrt(Qp)`` (reference ``LSQ.py:57``),
- gradient scale ``g = 1/sqrt(numel * Qp)`` (``LSQ.py:58``),
- STE detach tricks ``grad_scale``/``round_pass`` (``LSQ.py:11-20``),
- quantized weight ``w_q = round(clamp(w/s, Qn, Qp)) * s`` (``LSQ.py:65-74``),
- fibbinary variant snaps ``clamp(w/s, Qn, Qp)`` to the signed fibbinary
  codebook with ``bit_length <= nbits-1`` (``LSQFibbinary/LSQ.py:23-54``).

Known reference drift intentionally NOT replicated: the Conv1dLSQ copy computes
``g`` from a stale shape expression (reference ``LSQ.py:218``); here both layer
types use the canonical ``1/sqrt(numel*Qp)``.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .codebooks import lsq_fibbinary_codebook, nearest_codeword


def grad_scale(x, scale):
    """Value ``x``, gradient scaled by ``scale`` (reference ``LSQ.py:11-14``)."""
    return jax.lax.stop_gradient(x - x * scale) + x * scale


def round_pass(x):
    """Value ``round(x)``, gradient identity (reference ``LSQ.py:17-20``)."""
    return jax.lax.stop_gradient(jnp.round(x) - x) + x


def codebook_pass(x, codebook):
    """Value = nearest codeword, gradient identity (reference
    ``LSQFibbinary/LSQ.py:23-45`` round_pass with the CUDA extension)."""
    return jax.lax.stop_gradient(nearest_codeword(x, codebook) - x) + x


def lsq_quantize(w: jnp.ndarray, step_size: jnp.ndarray, nbits: int, codebook=None):
    """The LSQ fake-quantization of a weight tensor."""
    qn = -(2 ** (nbits - 1))
    qp = 2 ** (nbits - 1) - 1
    g = 1.0 / math.sqrt(w.size * qp)
    s = grad_scale(step_size, g)
    scaled = jnp.clip(w / s, qn, qp)
    if codebook is None:
        return round_pass(scaled) * s
    return codebook_pass(scaled, codebook) * s


def lsq_step_size_init(kernel: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """``mean(|w|)/sqrt(Qp)`` (reference ``LSQ.py:57``)."""
    qp = 2 ** (nbits - 1) - 1
    return jnp.mean(jnp.abs(kernel)) / math.sqrt(qp)


class DenseLSQ(nn.Module):
    """Dense layer with optional LSQ weight quantization (reference
    ``LinearLSQ``, ``models/InformerLSQ/LSQ.py:23-74``).

    ``quantize=False`` (or ``nbits=None``) behaves exactly like ``nn.Dense``
    — matching the reference pattern of training FP32 first and enabling
    quantization afterwards (``QuantizationStudy/LSQ/TrainInformerLSQ.py:190-201``).
    ``fibbinary=True`` selects the signed fibbinary codebook.
    """

    features: int
    use_bias: bool = True
    nbits: Optional[int] = None
    quantize: bool = False
    fibbinary: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias else None
        )
        if self.quantize and self.nbits is not None:
            step_size = self.param(
                "step_size", lambda _: lsq_step_size_init(kernel, self.nbits)
            )
            cb = lsq_fibbinary_codebook(self.nbits) if self.fibbinary else None
            w = lsq_quantize(kernel, step_size, self.nbits, cb)
        else:
            w = kernel
        y = x @ w.astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class ConvLSQ(nn.Module):
    """1D conv (circular padding) with optional LSQ weight quantization
    (reference ``Conv1dLSQ``, ``models/InformerLSQ/LSQ.py:77-314``).

    Covers both reference uses: k=1 FFN convs and the k=3 distil conv.
    """

    features: int
    kernel_size: int = 1
    nbits: Optional[int] = None
    quantize: bool = False
    fibbinary: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ...models.embed import circular_conv1d

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if self.quantize and self.nbits is not None:
            step_size = self.param(
                "step_size", lambda _: lsq_step_size_init(kernel, self.nbits)
            )
            cb = lsq_fibbinary_codebook(self.nbits) if self.fibbinary else None
            w = lsq_quantize(kernel, step_size, self.nbits, cb)
        else:
            w = kernel
        if self.kernel_size == 1:
            return x @ w[0].astype(self.dtype) + bias.astype(self.dtype)
        return circular_conv1d(x, w.astype(self.dtype), bias.astype(self.dtype))
