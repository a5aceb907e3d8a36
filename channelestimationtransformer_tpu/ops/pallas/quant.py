"""Pallas fused quantization kernels.

Reference native kernels being replaced:
- ``quant_cuda/fixed_point_kernel.cu:29-144`` (fixed-point nearest/stochastic,
  one thread per element, separate launch per tensor),
- ``fibbinary_cpu/cpp_fibbinary_functions.cu:7-43`` (nearest-codeword linear
  scan in global memory).

Here each op is a single VPU-resident Pallas program: the tensor streams
HBM->VMEM once, rounding/clamping/codebook-snap happen in registers, and the
TPU hardware PRNG supplies stochastic-rounding bits (no host RNG state, unlike
the reference's global ``std::mt19937``, ``quant_cpu.cpp:31-33``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


BLOCK_ROWS = 512  # x 1024 lanes x 4 B = 2 MB per in/out block (VMEM-safe)


def _blocked(flat2d):
    """Pad the row dim to a BLOCK_ROWS multiple; return (padded, grid)."""
    rows = flat2d.shape[0]
    pad_rows = (-rows) % BLOCK_ROWS
    if pad_rows:
        flat2d = jnp.pad(flat2d, ((0, pad_rows), (0, 0)))
    return flat2d, flat2d.shape[0] // BLOCK_ROWS


def _fixed_kernel(x_ref, seed_ref, o_ref, *, scale, t_min, t_max, stochastic, clamp):
    x = x_ref[:]
    scaled = x * scale
    if stochastic:
        # distinct stream per grid cell
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        bits = pltpu.prng_random_bits(scaled.shape)
        u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))  # U[0,1)
        q = jnp.floor(scaled + u)
    else:
        q = jnp.round(scaled)
    q = q / scale
    if clamp:
        q = jnp.clip(q, t_min, t_max)
    o_ref[:] = q


@functools.partial(
    jax.jit, static_argnames=("wl", "fl", "clamp", "symmetric", "stochastic")
)
def fused_fixed_point_quantize(
    x: jnp.ndarray,
    wl: int,
    fl: int,
    *,
    clamp: bool = True,
    symmetric: bool = False,
    stochastic: bool = False,
    seed: int = 0,
) -> jnp.ndarray:
    """Fixed-point fake quantization as one fused Pallas program.

    Same numerics as ``ops.quant.functional.fixed_point_quantize`` (which is
    the jit-fusable reference implementation); this kernel guarantees a single
    HBM pass and on-chip PRNG for the optimizer's per-step weight-quant path.
    """
    res = 2.0 ** (-fl)
    t_min = -(2.0 ** (wl - fl - 1)) + (res if symmetric else 0.0)
    t_max = (2.0 ** (wl - fl - 1)) - res

    orig_shape = x.shape
    flat = x.reshape(-1)
    pad = (-flat.size) % 1024
    flat = jnp.pad(flat, (0, pad)).reshape(-1, 1024)
    flat, grid = _blocked(flat)

    kernel = functools.partial(
        _fixed_kernel,
        scale=2.0 ** fl,
        t_min=t_min,
        t_max=t_max,
        stochastic=stochastic,
        clamp=clamp,
    )
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, 1024), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, 1024), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(flat.shape, x.dtype),
    )(flat, jnp.asarray([seed], jnp.int32))
    return out.reshape(-1)[: np.prod(orig_shape)].reshape(orig_shape)


def _codeword_kernel(x_ref, cb_ref, o_ref, *, cb_size):
    x = x_ref[:]
    best = jnp.full_like(x, cb_ref[0])
    best_d = jnp.abs(x - cb_ref[0])

    def body(i, carry):
        best, best_d = carry
        c = cb_ref[i]
        d = jnp.abs(x - c)
        take = d < best_d
        return jnp.where(take, c, best), jnp.where(take, d, best_d)

    best, _ = jax.lax.fori_loop(1, cb_size, body, (best, best_d))
    o_ref[:] = best


@jax.jit
def fused_nearest_codeword(x: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Nearest-codeword snap with the codebook in SMEM — the Pallas
    replacement for the reference's CUDA global-memory scan.

    Ties resolve to the lower-index codeword (strict ``<``), matching both the
    reference kernel and ``ops.quant.codebooks.nearest_codeword``.
    """
    orig_shape = x.shape
    flat = x.reshape(-1)
    pad = (-flat.size) % 1024
    flat = jnp.pad(flat, (0, pad)).reshape(-1, 1024)
    flat, grid = _blocked(flat)
    cb = codebook.astype(x.dtype).reshape(-1)

    kernel = functools.partial(_codeword_kernel, cb_size=cb.size)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, 1024), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, 1024), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(flat.shape, x.dtype),
    )(flat, cb)
    return out.reshape(-1)[: np.prod(orig_shape)].reshape(orig_shape)
