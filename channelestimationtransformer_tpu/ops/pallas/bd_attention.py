"""Block-diagonal fused attention: the short-sequence training kernel.

Reference hot loop: ``models/Informer/attn.py:54-82`` (FullAttention). The
channel-prediction workload is thousands of *tiny* attention heads
(B*H = 2048, L <= 90, E = 16 at the flagship config). Both XLA's batched-GEMM
lowering and a one-head-per-program Pallas kernel are latency-bound there:
each [90,16]x[16,90] matmul barely touches the 128x128 MXU.

This kernel restores MXU density with a block-diagonal packing. Per batch
element, all H heads are one pair of dense matmuls:

    scores[q, h*Lp+l] = sum_he Q[q, he] * K_bd[h*Lp+l, he]

where ``Q`` is the model's native ``[L, H*E]`` activation slab (H*E = d_model,
one 128-lane tile at the flagship config) and ``K_bd`` is K tiled vertically
H times with everything outside head-block ``h`` masked to zero:

    K_bd[h*Lp+l, he'] = K[l, he']  if he' // E == h else 0.

The contraction runs over the full d_model lane dim (K = 128 on the MXU
instead of 16), one matmul per batch element instead of H. Per-head softmax
runs on lane-aligned [L, 128] column slices (Lp = 128). The value contraction
uses the same packing for V. The backward pass is the mirrored kernel (five
block-diagonal matmuls, softmax VJP on the slices) with the forward
recomputed — nothing but q/k/v/do is ever read from HBM, and the [L, H*Lp]
score tensor never leaves VMEM.

Attention-probability dropout (the reference applies dropout to the softmax
output, ``attn.py:75-79``) runs on the TPU hardware PRNG inside the kernel;
the backward kernel reseeds identically, so the mask reconstructs exactly
without storing it.

Trade-off: the padded matmuls do ~(128/E)x the minimal FLOPs, but at these
sizes the workload is latency-bound, not FLOP-bound — dense-but-redundant
MXU work beats sparse-but-tiny dispatches (measured in perf_study.json).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LP = 128  # per-head key-block width: exactly one lane tile
VMEM_BUDGET = 10 * 1024 * 1024  # of the ~16 MB/core, leave headroom


def _vmem_bytes(g: int, l_q: int, l_k: int, h: int, e: int) -> int:
    """Worst-case VMEM for one program: double-buffered in/out blocks for a
    group of ``g`` batch elements (backward holds 7 such blocks) plus the
    per-iteration intermediates (scores/p/dp/ds slabs + the packed K_bd/V_bd
    and their gradient counterparts)."""
    he = h * e
    blocks = 2 * 7 * g * max(l_q, l_k) * he          # 7 refs, double-buffered
    slabs = 4 * l_q * h * LP                          # scores/p/dp/ds
    packed = 4 * h * LP * he                          # K_bd/V_bd/dK_bd/dV_bd
    return 4 * (blocks + slabs + packed)


def _pick_group(b: int, l_q: int = 0, l_k: int = 0, h: int = 0,
                e: int = 0) -> int:
    g = 8
    while g > 1 and (b % g or _vmem_bytes(g, l_q, l_k, h, e) > VMEM_BUDGET):
        g //= 2
    return g


def _supported(l_q: int, l_k: int, h: int, e: int, d: int, b: int) -> bool:
    """Shapes this kernel handles: whole problem per batch element in VMEM
    (at group=1 if need be — _pick_group shrinks the group first)."""
    if e != d or l_k > LP or l_q > 512:
        return False
    return _vmem_bytes(1, l_q, l_k, h, e) <= VMEM_BUDGET


def _bd_pack(x_pad, h: int, e: int):
    """[LP, HE] -> block-diagonal [H*LP, HE] (tile vertically + mask)."""
    he = x_pad.shape[1]
    tiled = jnp.concatenate([x_pad] * h, axis=0)  # [H*LP, HE]
    row = jax.lax.broadcasted_iota(jnp.int32, (h * LP, he), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h * LP, he), 1)
    return jnp.where((row // LP) == (col // e), tiled, 0.0)


def _softmax_blocks(scores, *, h: int, l_q: int, l_k: int, causal: bool):
    """Per-head softmax on lane-aligned [Lq, LP] column slices.

    Returns the concatenated [Lq, H*LP] probabilities (zero at padded /
    masked positions).
    """
    parts = []
    row = jax.lax.broadcasted_iota(jnp.int32, (l_q, LP), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (l_q, LP), 1)
    mask = col < l_k
    if causal:
        mask = mask & (col <= row)
    for i in range(h):
        s = scores[:, i * LP:(i + 1) * LP]
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        parts.append(p / jnp.sum(p, axis=-1, keepdims=True))
    return jnp.concatenate(parts, axis=1)


def _dropout_mask(shape, seed, cell: int, *, keep_prob: float):
    """Deterministic keep-mask from the TPU PRNG; the backward kernel calls
    this with the identical (seed, cell) and reconstructs the same mask."""
    pltpu.prng_seed(seed + cell)
    bits = pltpu.prng_random_bits(shape)  # uint32
    thresh = min(int(keep_prob * float(1 << 32)), (1 << 32) - 1)
    return bits.astype(jnp.uint32) < jnp.uint32(thresh)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, h, e, l_q, l_k,
                scale, causal, dropout, group, precision):
    # k_ref/v_ref blocks arrive LP-row padded (wrapper pads once in HBM; the
    # pad rides the block DMA instead of costing VPU work per group element).
    for g in range(group):
        q = q_ref[g].astype(jnp.float32)  # [Lq, HE]
        k = k_ref[g].astype(jnp.float32)  # [LP, HE]
        v = v_ref[g].astype(jnp.float32)

        k_bd = _bd_pack(k, h, e)  # [H*LP, HE]
        v_bd = _bd_pack(v, h, e)

        scores = jax.lax.dot_general(
            q, k_bd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale  # [Lq, H*LP]

        p = _softmax_blocks(scores, h=h, l_q=l_q, l_k=l_k, causal=causal)
        if dropout > 0.0:
            keep = _dropout_mask(
                p.shape, seed_ref[0], pl.program_id(0) * group + g,
                keep_prob=1.0 - dropout,
            )
            p = jnp.where(keep, p * (1.0 / (1.0 - dropout)), 0.0)

        o = jax.lax.dot_general(
            p, v_bd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [Lq, HE]
        o_ref[g] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, h, e, l_q, l_k, scale, causal, dropout, group, precision):
    he = h * e
    inv_keep = 1.0 / (1.0 - dropout) if dropout > 0.0 else 1.0
    for g in range(group):
        q = q_ref[g].astype(jnp.float32)
        k = k_ref[g].astype(jnp.float32)  # [LP, HE] (pre-padded)
        v = v_ref[g].astype(jnp.float32)
        do = do_ref[g].astype(jnp.float32)  # [Lq, HE]

        k_bd = _bd_pack(k, h, e)
        v_bd = _bd_pack(v, h, e)

        # --- recompute forward probabilities ---
        scores = jax.lax.dot_general(
            q, k_bd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        ) * scale
        p = _softmax_blocks(scores, h=h, l_q=l_q, l_k=l_k, causal=causal)
        if dropout > 0.0:
            keep = _dropout_mask(
                p.shape, seed_ref[0], pl.program_id(0) * group + g,
                keep_prob=1.0 - dropout,
            )
            p_drop = jnp.where(keep, p * inv_keep, 0.0)
        else:
            p_drop = p

        # --- dP (through dropout), then softmax VJP per head block ---
        dp = jax.lax.dot_general(
            do, v_bd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [Lq, H*LP]
        if dropout > 0.0:
            dp = jnp.where(keep, dp * inv_keep, 0.0)

        ds_parts = []
        for i in range(h):
            p_i = p[:, i * LP:(i + 1) * LP]
            dp_i = dp[:, i * LP:(i + 1) * LP]
            dot = jnp.sum(dp_i * p_i, axis=-1, keepdims=True)
            ds_parts.append(p_i * (dp_i - dot) * scale)
        ds = jnp.concatenate(ds_parts, axis=1)  # [Lq, H*LP]

        # --- input grads ---
        dq = jax.lax.dot_general(
            ds, k_bd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [Lq, HE]
        dk_bd = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [H*LP, HE]
        dv_bd = jax.lax.dot_general(
            p_drop, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # [H*LP, HE]

        # Fold the block-diagonal back: dk[l, he'] = dk_bd[h'*LP+l, he'] at
        # h' = he'//E (off-block columns of dk_bd are junk -> masked out).
        # Rows l >= l_k are exact zeros (dS is zero at padded columns), so
        # the fold runs over the full padded LP rows and the wrapper's pad
        # VJP slices them away.
        col = jax.lax.broadcasted_iota(jnp.int32, (LP, he), 1)
        dk = jnp.zeros((LP, he), jnp.float32)
        dv = jnp.zeros((LP, he), jnp.float32)
        for i in range(h):
            blk = (col // e) == i
            dk = dk + jnp.where(blk, dk_bd[i * LP:(i + 1) * LP, :], 0.0)
            dv = dv + jnp.where(blk, dv_bd[i * LP:(i + 1) * LP, :], 0.0)

        dq_ref[g] = dq.astype(dq_ref.dtype)
        dk_ref[g] = dk.astype(dk_ref.dtype)
        dv_ref[g] = dv.astype(dv_ref.dtype)


def _specs(group, l, he):
    return pl.BlockSpec((group, l, he), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_call(q3, k3, v3, seed, *, h, e, scale, causal, dropout, interpret,
              precision, l_k):
    b, l_q, he = q3.shape
    lp = k3.shape[1]
    group = _pick_group(b, l_q, lp, h, e)
    kernel = functools.partial(
        _fwd_kernel, h=h, e=e, l_q=l_q, l_k=l_k, scale=scale, causal=causal,
        dropout=dropout, group=group, precision=precision,
    )
    flops_mm = 2 * b * l_q * he * h * LP * 2
    return pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _specs(group, l_q, he),
            _specs(group, lp, he),
            _specs(group, lp, he),
        ],
        out_specs=_specs(group, l_q, he),
        out_shape=jax.ShapeDtypeStruct((b, l_q, he), q3.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_mm, bytes_accessed=4 * b * (3 * lp + l_q) * he,
            transcendentals=b * l_q * h * LP,
        ),
        interpret=interpret,
    )(seed, q3, k3, v3)


def _bwd_call(q3, k3, v3, do3, seed, *, h, e, scale, causal, dropout,
              interpret, precision, l_k):
    b, l_q, he = q3.shape
    lp = k3.shape[1]
    group = _pick_group(b, l_q, lp, h, e)
    kernel = functools.partial(
        _bwd_kernel, h=h, e=e, l_q=l_q, l_k=l_k, scale=scale, causal=causal,
        dropout=dropout, group=group, precision=precision,
    )
    shapes = (
        jax.ShapeDtypeStruct((b, l_q, he), q3.dtype),
        jax.ShapeDtypeStruct((b, lp, he), k3.dtype),
        jax.ShapeDtypeStruct((b, lp, he), v3.dtype),
    )
    return pl.pallas_call(
        kernel,
        grid=(b // group,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _specs(group, l_q, he),
            _specs(group, lp, he),
            _specs(group, lp, he),
            _specs(group, l_q, he),
        ],
        out_specs=(_specs(group, l_q, he), _specs(group, lp, he),
                   _specs(group, lp, he)),
        out_shape=shapes,
        cost_estimate=pl.CostEstimate(
            flops=5 * b * l_q * he * h * LP * 2,
            bytes_accessed=4 * b * (3 * lp + 4 * l_q) * he,
            transcendentals=b * l_q * h * LP,
        ),
        interpret=interpret,
    )(seed, q3, k3, v3, do3)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11)
)
def _bd_attention(q3, k3, v3, seed, h, e, scale, causal, dropout, interpret,
                  precision, l_k):
    return _fwd_call(q3, k3, v3, seed, h=h, e=e, scale=scale, causal=causal,
                     dropout=dropout, interpret=interpret,
                     precision=precision, l_k=l_k)


def _vjp_fwd(q3, k3, v3, seed, h, e, scale, causal, dropout, interpret,
             precision, l_k):
    out = _fwd_call(q3, k3, v3, seed, h=h, e=e, scale=scale, causal=causal,
                    dropout=dropout, interpret=interpret,
                    precision=precision, l_k=l_k)
    return out, (q3, k3, v3, seed)


def _vjp_bwd(h, e, scale, causal, dropout, interpret, precision, l_k, res,
             do3):
    q3, k3, v3, seed = res
    dq, dk, dv = _bwd_call(
        q3, k3, v3, do3, seed, h=h, e=e, scale=scale, causal=causal,
        dropout=dropout, interpret=interpret, precision=precision, l_k=l_k,
    )
    # The PRNG seed is an integer primal: JAX's custom_vjp contract wants a
    # symbolic-zero float0 cotangent for it, not an int32 zero array.
    seed_ct = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)
    return dq, dk, dv, seed_ct


_bd_attention.defvjp(_vjp_fwd, _vjp_bwd)


def supported_shape(q, k, v) -> bool:
    """Whether :func:`bd_attention` handles these ``[B, L, H, E]`` tensors."""
    b, l_q, h, e = q.shape
    return _supported(l_q, k.shape[1], h, e, v.shape[-1], b)


TPU_BACKENDS = ("tpu", "axon")  # axon = the tunneled TPU PJRT plugin


def runtime_supported(dropout: float = 0.0) -> bool:
    """Whether the current backend can run the kernel: native on TPU-like
    backends, interpreter elsewhere (where the dropout path is unavailable —
    it needs the TPU hardware PRNG)."""
    return jax.default_backend() in TPU_BACKENDS or dropout == 0.0


def bd_attention(q, k, v, *, causal: bool = False, scale: float | None = None,
                 dropout: float = 0.0, seed=None, interpret: bool = False,
                 precision: str = "default"):
    """Fused block-diagonal attention over ``[B, L, H, E]`` tensors.

    Differentiable (fused backward kernel). ``dropout`` > 0 applies
    attention-probability dropout with the TPU PRNG, seeded by ``seed``
    (an int32 scalar/array; required when dropout > 0).

    ``precision``: MXU matmul precision request. Measured on v5e
    (bd_check artifacts): "default" tracks the XLA einsum path to ~7e-4
    absolute (MXU input rounding, symmetric between the two paths — the
    interpret-mode test pins the kernel's math to ~1e-7 of exact f32);
    requesting "highest" through Mosaic measured both slower AND further
    from XLA (~1.3e-2), so "default" is the default.
    """
    b, l_q, h, e = q.shape
    he = h * e
    scale = scale if scale is not None else 1.0 / math.sqrt(e)
    # Non-TPU backends (CPU tests / virtual meshes): interpreter mode.
    interpret = interpret or jax.default_backend() not in TPU_BACKENDS
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    l_k = k.shape[1]
    if l_k > LP:
        raise ValueError(
            f"bd_attention handles key lengths <= {LP}; got {l_k} "
            "(gate callers on supported_shape())"
        )
    q3 = q.reshape(b, l_q, he)
    k3 = k.reshape(b, l_k, he)
    v3 = v.reshape(b, l_k, he)
    if l_k < LP:
        # Pad once in HBM (the pad VJP slices dk/dv back automatically).
        k3 = jnp.pad(k3, ((0, 0), (0, LP - l_k), (0, 0)))
        v3 = jnp.pad(v3, ((0, 0), (0, LP - l_k), (0, 0)))
    prec = getattr(jax.lax.Precision, str(precision).upper())
    out = _bd_attention(q3, k3, v3, seed, h, e, float(scale), bool(causal),
                        float(dropout), bool(interpret), prec, l_k)
    return out.reshape(b, l_q, h, e)
