"""Functional fake-quantization ops — pure JAX, RNG-keyed, STE-differentiable.

Reference: the vendored qtorch fork's functional layer
(``FullPrecision/qtorch/quant/quant_function.py:269-448``) backed by the
``quant_cpu``/``quant_cuda`` native kernels. Semantics are replicated exactly
(rounding rule, clamp bounds, partial-quantization threshold selection) with
TPU-first changes:

- stochastic rounding draws from an explicit ``jax.random`` key (the reference
  uses a global host RNG, ``quant_cpu.cpp:31-33``);
- the partial-quantization threshold (p-fraction of weights closest/farthest
  from their quantized value) is computed **on device** with ``jnp.sort``,
  removing the reference's device->host copy + std::sort per optimizer step
  (``quant_cuda/quant.cu:191-246``; SURVEY §7.4 quirk 7);
- everything is shape-polymorphic and fuses into the surrounding XLA program;
  a Pallas fused kernel covers the hot per-step path (``ops.pallas.quant``).

All ops are elementwise in value with gradient = identity (straight-through);
use :func:`ste` to attach that VJP, mirroring qtorch's autograd.Function
wrappers (``quant_function.py:61-266``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .codebooks import (
    fibbinary_codebook,
    fibonacci_sequence_codebook,
    nearest_codeword,
)
from .formats import BlockFloatingPoint, FixedPoint, FloatingPoint


def _fixed_bounds(wl: int, fl: int, symmetric: bool):
    """Representable range (reference ``sim_helper.cpp:5-13``)."""
    res = 2.0 ** (-fl)
    t_min = -(2.0 ** (wl - fl - 1))
    t_max = -t_min - res
    if symmetric:
        t_min = t_min + res
    return t_min, t_max


def _round_to_grid(x, fl: int, rounding: str, key):
    """``round(a, r, sigma)`` (reference ``sim_helper.cpp:15-21``): scale by
    ``2^fl``, round (half-to-even for nearest, uniform-dither for stochastic),
    scale back."""
    scale = 2.0 ** fl
    scaled = x * scale
    if rounding == "nearest":
        q = jnp.round(scaled)  # round-half-even == C nearbyint
    elif rounding == "stochastic":
        assert key is not None, "stochastic rounding needs a PRNG key"
        u = jax.random.uniform(key, x.shape, dtype=x.dtype)
        q = jnp.floor(scaled + u)
    else:
        raise ValueError(f"unknown rounding {rounding!r}")
    return q / scale


def fixed_point_quantize(
    x: jnp.ndarray,
    wl: int,
    fl: int,
    *,
    clamp: bool = True,
    symmetric: bool = False,
    rounding: str = "nearest",
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Fixed-point fake quantization (reference ``quant_function.py:269-298``,
    kernels ``quant_cpu.cpp:117-164``)."""
    q = _round_to_grid(x, fl, rounding, key)
    if clamp:
        t_min, t_max = _fixed_bounds(wl, fl, symmetric)
        q = jnp.clip(q, t_min, t_max)
    return q


def fixed_point_quantize_with_mask(
    x, wl, fl, *, symmetric=False, rounding="nearest", key=None
):
    """Quantize + boolean mask of clamped elements (reference
    ``fixed_point_quantize_*_mask``, ``quant_cpu.cpp:80-115``) — used by the
    clamping-grad-zero quantizer variant."""
    q = _round_to_grid(x, fl, rounding, key)
    t_min, t_max = _fixed_bounds(wl, fl, symmetric)
    clipped = jnp.clip(q, t_min, t_max)
    mask = (q > t_max) | (q < t_min)
    return clipped, mask


def _partial_threshold(diffs: jnp.ndarray, percentage: float, descending: bool):
    """The reference's threshold rule: sort |x - q(x)| and index at
    ``size * percentage`` (``quant_cpu.cpp:185-191``; distant variant uses the
    reverse sort, ``…QAT/qtorch/quant/quant_cuda/quant.cu:258-304``)."""
    flat = jnp.sort(diffs.reshape(-1), descending=descending)
    k = jnp.asarray(percentage * (flat.size - 1), jnp.int32)
    return flat[k]


def fixed_point_quantize_partial(
    x: jnp.ndarray,
    percentage: float,
    wl: int,
    fl: int,
    *,
    clamp: bool = True,
    symmetric: bool = False,
    rounding: str = "proximal",
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Progressive (incremental-QAT) quantization: quantize only a fraction of
    the weights, chosen by distance to their quantized value.

    ``rounding``: ``proximal`` = the p-fraction **closest** to their quantized
    value, ``distant`` = the **farthest** p-fraction, ``stochastic`` = a random
    p-subset (reference ``…QuantizationAwareTraining/qtorch/quant/
    quant_function.py:301-340`` — the aligned-signature copy, SURVEY §7.4
    quirk 6).
    """
    q = fixed_point_quantize(
        x, wl, fl, clamp=clamp, symmetric=symmetric, rounding="nearest"
    )
    diffs = jnp.abs(x - q)
    if rounding == "proximal":
        thr = _partial_threshold(diffs, percentage, descending=False)
        take = diffs <= thr
    elif rounding == "distant":
        thr = _partial_threshold(diffs, percentage, descending=True)
        take = diffs >= thr
    elif rounding == "stochastic":
        assert key is not None
        take = jax.random.uniform(key, x.shape) < percentage
    else:
        raise ValueError(f"unknown partial rounding {rounding!r}")
    # Edge guards as lax selects so ``percentage`` may be a traced scalar
    # (the QAT driver runs the whole fraction schedule through ONE compiled
    # program; Python branches here would force a recompile per fraction).
    pct = jnp.asarray(percentage)
    take = jnp.where(pct >= 1.0, jnp.ones_like(take),
                     jnp.where(pct <= 0.0, jnp.zeros_like(take), take))
    out = jnp.where(take, q, x)
    if clamp:
        t_min, t_max = _fixed_bounds(wl, fl, symmetric)
        out = jnp.clip(out, t_min, t_max)
    return out


def fibonacci_quantize(
    x: jnp.ndarray, wl: int, fl: int, *, clamp: bool = True
) -> jnp.ndarray:
    """Snap to the scaled-Fibonacci codebook (reference
    ``fibonacci_quantize_nearest``, ``quant_cpu.cpp:243-273``; positive
    codewords only, clamp to codebook range)."""
    cb = fibonacci_sequence_codebook(wl, fl)
    q = nearest_codeword(x, cb)
    if clamp:
        q = jnp.clip(q, float(cb.min()), float(cb.max()))
    return q


def no_adjacent_ones_quantize(
    x: jnp.ndarray, wl: int, fl: int, *, clamp: bool = True
) -> jnp.ndarray:
    """Snap to the fibbinary (no-adjacent-ones) codebook (reference
    ``noAdjecentOnes_quantize_nearest``, ``quant_cpu.cpp:313-352``)."""
    cb = fibbinary_codebook(wl, fl)
    q = nearest_codeword(x, cb)
    if clamp:
        q = jnp.clip(q, float(cb.min()), float(cb.max()))
    return q


def fibonacci_quantize_partial(
    x: jnp.ndarray,
    wl: int,
    fl: int,
    percentage: float,
    *,
    clamp: bool = True,
    rounding: str = "proximal",
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Progressive quantization onto **fibbinary** codewords (reference
    ``…QATFibonacci/qtorch/quant/quant_function.py:298-336`` +
    ``quant.cu:249-430``; despite the name, the codebook is fibbinary)."""
    cb = fibbinary_codebook(wl, fl)
    q = nearest_codeword(x, cb)
    diffs = jnp.abs(x - q)
    if rounding == "proximal":
        thr = _partial_threshold(diffs, percentage, descending=False)
        take = diffs <= thr
    elif rounding == "distant":
        thr = _partial_threshold(diffs, percentage, descending=True)
        take = diffs >= thr
    elif rounding == "stochastic":
        assert key is not None
        take = jax.random.uniform(key, x.shape) < percentage
    else:
        raise ValueError(f"unknown partial rounding {rounding!r}")
    # Edge guards as lax selects so ``percentage`` may be a traced scalar
    # (the QAT driver runs the whole fraction schedule through ONE compiled
    # program; Python branches here would force a recompile per fraction).
    pct = jnp.asarray(percentage)
    take = jnp.where(pct >= 1.0, jnp.ones_like(take),
                     jnp.where(pct <= 0.0, jnp.zeros_like(take), take))
    out = jnp.where(take, q, x)
    if clamp:
        out = jnp.clip(out, float(cb.min()), float(cb.max()))
    return out


def block_quantize(
    x: jnp.ndarray,
    wl: int,
    *,
    dim: int = -1,
    rounding: str = "nearest",
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Block floating point: shared exponent from the block max, ``wl``-bit
    signed mantissa (reference ``block_quantize_nearest``,
    ``quant_cpu.cpp:410-455``: exponent from max |x|, offset ``wl-2``)."""
    if dim == -1:
        max_entry = jnp.max(jnp.abs(x))
    else:
        axes = tuple(i for i in range(x.ndim) if i != dim % x.ndim)
        max_entry = jnp.max(jnp.abs(x), axis=axes, keepdims=True)
    # floor-of-log2 exponent via frexp-style trick; 0 -> exponent of 2^-149 n/a,
    # guard with tiny epsilon.
    exponent = jnp.floor(jnp.log2(jnp.maximum(max_entry, 1e-38)))
    i = x * (2.0 ** (-exponent + (wl - 2)))
    if rounding == "nearest":
        i = jnp.round(i)
    else:
        assert key is not None
        i = jnp.floor(i + jax.random.uniform(key, x.shape, dtype=x.dtype))
    # Saturate the mantissa like the reference's clip_max_exponent path.
    lim = 2.0 ** (wl - 1) - 1.0
    i = jnp.clip(i, -lim, lim)
    return i * (2.0 ** (exponent - (wl - 2)))


def float_quantize(
    x: jnp.ndarray,
    exp: int,
    man: int,
    *,
    rounding: str = "nearest",
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Low-bit float (exp/man bits) with subnormal handling (reference
    ``float_quantize_nearest``, ``quant_cpu.cpp:493-536``).

    Bit-level emulation on int32 views (``lax.bitcast_convert_type`` — the
    TPU analogue of the reference's float-bit tricks in ``bit_helper.cpp``).
    """
    x32 = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x32, jnp.int32)
    sign = bits & jnp.int32(np.int32(np.uint32(0x80000000)))
    mag = bits ^ sign  # |x| bits

    max_exp_unbiased = 2 ** (exp - 1) - 1
    min_exp_unbiased = -(2 ** (exp - 1)) + 2  # smallest normal
    exp_field = (mag >> 23) - 127  # unbiased exponent of |x|

    # Subnormal threshold: values below 2^min_exp get quantized on the fixed
    # subnormal grid.
    subnormal = exp_field < min_exp_unbiased

    # Normal path: round mantissa to `man` bits.
    shift = 23 - man
    if rounding == "nearest":
        # round-half-away in bit space like the reference's add-half trick
        add = jnp.int32(1 << (shift - 1)) if shift > 0 else jnp.int32(0)
    else:
        assert key is not None
        rnd = jax.random.randint(
            key, x.shape, 0, 1 << shift, dtype=jnp.int32
        ) if shift > 0 else jnp.int32(0)
        add = rnd
    q_mag = ((mag + add) >> shift) << shift if shift > 0 else mag

    # Clamp overflow to the max representable value.
    max_val_bits = ((max_exp_unbiased + 127) << 23) | (((1 << man) - 1) << shift)
    q_mag = jnp.minimum(q_mag, max_val_bits)

    normal = jax.lax.bitcast_convert_type(q_mag | sign, jnp.float32)

    # Subnormal grid: spacing 2^(min_exp - man).
    sub_scale = 2.0 ** (min_exp_unbiased - man)
    if rounding == "nearest":
        sub = jnp.round(x32 / sub_scale) * sub_scale
    else:
        sub_key = jax.random.fold_in(key, 1) if key is not None else None
        u = jax.random.uniform(sub_key, x.shape, dtype=jnp.float32)
        sub = jnp.floor(x32 / sub_scale + u) * sub_scale

    return jnp.where(subnormal, sub, normal).astype(x.dtype)


# ---------------------------------------------------------------------------
# Straight-through estimator wrapper (the qtorch autograd.Function equivalent).
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def ste(x, quant_fn):
    """``quant_fn(x)`` in the forward pass, identity gradient in the backward
    pass — the STE semantics every qtorch fake-quant op uses
    (reference ``quant_function.py:61-266``)."""
    return quant_fn(x)


def _ste_fwd(x, quant_fn):
    return quant_fn(x), None


def _ste_bwd(quant_fn, _, g):
    return (g,)


ste.defvjp(_ste_fwd, _ste_bwd)


def quantizer(
    *,
    forward_number=None,
    backward_number=None,
    forward_rounding: str = "nearest",
    backward_rounding: str = "nearest",
    clamping_grad_zero: bool = False,
):
    """Build a differentiable fake-quantizer, mirroring qtorch ``quantizer()``
    (reference ``quant_function.py:61-266``): quantizes activations in the
    forward pass per ``forward_number`` and gradients in the backward pass per
    ``backward_number``; with ``clamping_grad_zero`` the gradient is zeroed
    where the forward pass clamped (fixed point only, reference ``:233-264``).

    Returns ``fn(x, key=None)``; the key (split internally) drives stochastic
    rounding on either side.
    """

    def apply_format(v, number, rounding, key):
        if number is None:
            return v
        if isinstance(number, FixedPoint):
            return fixed_point_quantize(
                v, number.wl, number.fl,
                clamp=number.clamp, symmetric=number.symmetric,
                rounding=rounding, key=key,
            )
        if isinstance(number, BlockFloatingPoint):
            return block_quantize(v, number.wl, dim=number.dim, rounding=rounding, key=key)
        if isinstance(number, FloatingPoint):
            return float_quantize(v, number.exp, number.man, rounding=rounding, key=key)
        raise TypeError(f"unsupported number format {number!r}")

    @jax.custom_vjp
    def fn(x, key):
        kf, _ = jax.random.split(key)
        return apply_format(x, forward_number, forward_rounding, kf)

    def fwd(x, key):
        kf, kb = jax.random.split(key)
        if clamping_grad_zero and isinstance(forward_number, FixedPoint):
            out, mask = fixed_point_quantize_with_mask(
                x, forward_number.wl, forward_number.fl,
                symmetric=forward_number.symmetric,
                rounding=forward_rounding, key=kf,
            )
            return out, (mask, kb)
        return apply_format(x, forward_number, forward_rounding, kf), (None, kb)

    def bwd(res, g):
        mask, kb = res
        if mask is not None:
            g = jnp.where(mask, 0.0, g)
        g = apply_format(g, backward_number, backward_rounding, kb)
        return (g, None)

    fn.defvjp(fwd, bwd)

    def wrapped(x, key=None):
        if key is None:
            key = jax.random.key(0)
        return fn(x, key)

    return wrapped
