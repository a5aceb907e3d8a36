"""Full and ProbSparse attention, jit-native with static shapes.

Reference: ``models/Informer/attn.py``. TPU-first redesign notes:

- ``FullAttention`` is a plain scaled-dot-product einsum chain; XLA fuses the
  scale/mask/softmax into the surrounding matmuls on the MXU. A Pallas
  flash-attention kernel (``ops.pallas.attention``) can be swapped in via
  ``use_pallas`` for long sequences.
- ``ProbAttention`` (the Informer O(L log L) sparse attention,
  reference ``attn.py:85-187``): all sizes that torch derived from runtime
  shapes (``U_part = factor*ceil(ln L_K)``, ``u = factor*ceil(ln L_Q)``) are
  computed from *static* trace-time shapes, so the whole op compiles to fixed
  gather/top_k/scatter — no dynamic shapes, no recompiles.
- The reference's debug ``sio.savemat`` inside FullAttention.forward
  (``attn.py:59-67``) is intentionally not replicated (SURVEY §7.4 quirk 2).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

NEG_INF = float(jnp.finfo(jnp.float32).min)

# ProbSparse layout switch: within these limits the dense QK^T is computed
# once on the MXU and sampled rows are *selected*/written back with
# scatter-free one-hot einsums; beyond them, keys are gathered per query to
# stay O(L * sample_k * E) in memory. Measured (experiments/artifacts/
# prob_crossover.json, TPU v5e, fwd+bwd): the dense layout wins at EVERY
# length tried — 6.3x at l=128 down to 3.4x at l=2048 — so the gather path
# is purely a memory fallback, and the switch is sized by the dense scores'
# footprint (b*h*l_q*l_k elements, ~2 GB f32 at the budget), not by time.
DENSE_SCORES_MAX_LK = 2048  # largest measured dense-wins length
DENSE_SCORES_ELEM_BUDGET = 2 ** 29  # [B,H,L_Q,L_K] f32 cap (~2 GB)


def causal_mask(l_q: int, l_k: int) -> jnp.ndarray:
    """Boolean [l_q, l_k] mask, True where attention is DISALLOWED (strict upper
    triangle), matching ``TriangularCausalMask`` (reference ``attn.py:10-21``)."""
    return jnp.triu(jnp.ones((l_q, l_k), dtype=bool), k=1)


def full_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask_flag: bool,
    scale: Optional[float] = None,
    dropout: float = 0.0,
    deterministic: bool = True,
    dropout_rng=None,
    return_attn: bool = False,
):
    """Dense softmax attention over ``[B, L, H, E]`` tensors
    (reference ``FullAttention.forward``, ``attn.py:54-82``)."""
    b, l, h, e = q.shape
    s = k.shape[1]
    scale = scale if scale is not None else 1.0 / math.sqrt(e)

    scores = jnp.einsum("blhe,bshe->bhls", q, k)
    if mask_flag:
        scores = jnp.where(causal_mask(l, s)[None, None], NEG_INF, scores)
    a = jax.nn.softmax(scale * scores, axis=-1)
    if dropout > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout, a.shape)
        a_dropped = jnp.where(keep, a / (1.0 - dropout), 0.0)
    else:
        a_dropped = a
    out = jnp.einsum("bhls,bshd->blhd", a_dropped, v)
    return (out, a) if return_attn else (out, None)


def prob_sparse_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask_flag: bool,
    factor: int,
    sample_rng: jax.Array,
    scale: Optional[float] = None,
    dense_layout: Optional[bool] = None,
):
    """ProbSparse attention (reference ``ProbAttention``, ``attn.py:85-187``).

    Inputs ``[B, L, H, E]``. Static sparsity sizes:
    ``sample_k = min(factor*ceil(ln L_K), L_K)`` keys sampled per query,
    ``n_top  = min(factor*ceil(ln L_Q), L_Q)`` queries kept.

    Non-selected queries receive the mean of V (unmasked) or the causal
    cumulative sum of V (masked decoder self-attention), exactly as in
    ``_get_initial_context`` (reference ``attn.py:128-137``).
    """
    b, l_q, h, e = q.shape
    l_k = k.shape[1]

    # [B, H, L, E] layout for the sparse bookkeeping (reference transposes too).
    q_ = jnp.swapaxes(q, 1, 2)
    k_ = jnp.swapaxes(k, 1, 2)
    v_ = jnp.swapaxes(v, 1, 2)

    sample_k = min(factor * math.ceil(math.log(l_k)), l_k)
    n_top = min(factor * math.ceil(math.log(l_q)), l_q)

    # --- _prob_QK (reference attn.py:101-126) ---
    # One shared [L_Q, sample_k] index draw across batch/heads, like torch.randint.
    index_sample = jax.random.randint(sample_rng, (l_q, sample_k), 0, l_k)
    # ``dense_layout`` overrides the switch (used by the crossover
    # measurement, experiments/prob_crossover.py); both layouts are
    # numerically identical (tests/test_attention.py oracle).
    if dense_layout is None:
        use_dense = (l_k <= DENSE_SCORES_MAX_LK
                     and b * h * l_q * l_k <= DENSE_SCORES_ELEM_BUDGET)
    else:
        use_dense = dense_layout
    if use_dense:
        # Short sequences (the whole reference regime): computing the DENSE
        # QK^T is one MXU matmul at the same cost as full attention, and the
        # sampled scores are a [.., L_Q, sample_k] gather from it — identical
        # math to gathering K vectors first (qk[l, s] = q_l . k_{idx[l,s]}),
        # but it avoids materializing the [B, H, L_Q, sample_k, E] key tensor
        # (~sample_k/L_K x the dense scores' footprint; ~300 MB/layer at the
        # flagship config), which made this path gather-bound on TPU.
        qk_full = jnp.einsum("bhle,bhse->bhls", q_, k_)  # [B, H, L_Q, L_K]
        # Select the sampled scores with a one-hot contraction, not a gather:
        # the VJP of einsum is einsum (dense MXU work), while gather's VJP is
        # a scatter-add — and unsorted scatters both hang Mosaic compiles and
        # miscompile on the experimental axon TPU runtime (same family as the
        # LDPC segment-op bug, sim/ldpc.py). onehot is static [L_Q, sample_k,
        # L_K] built once per trace.
        onehot = (index_sample[..., None]
                  == jnp.arange(l_k)[None, None]).astype(q_.dtype)
        qk_sample = jnp.einsum("bhlk,lsk->bhls", qk_full, onehot)
    else:
        # Long sequences: stay O(L * sample_k * E); gather K vectors.
        k_sample = k_[:, :, index_sample]  # [B, H, L_Q, sample_k, E]
        qk_sample = jnp.einsum("bhle,bhlse->bhls", q_, k_sample)
    m = jnp.max(qk_sample, axis=-1) - jnp.sum(qk_sample, axis=-1) / l_k
    _, m_top = jax.lax.top_k(m, n_top)  # [B, H, n_top]

    if use_dense:
        # Rows of the dense QK^T at the selected queries — one-hot einsum for
        # the same scatter-free-VJP reason as above (m_top is data-dependent
        # per (b, h), so its one-hot is [B, H, n_top, L_Q]).
        sel = (m_top[..., None]
               == jnp.arange(l_q)[None, None, None]).astype(q_.dtype)
        scores = jnp.einsum("bhul,bhlk->bhuk", sel, qk_full)  # [B,H,n_top,L_K]
    else:
        q_reduce = jnp.take_along_axis(q_, m_top[..., None], axis=2)
        scores = jnp.einsum("bhue,bhke->bhuk", q_reduce, k_)  # [B,H,n_top,L_K]

    scale = scale if scale is not None else 1.0 / math.sqrt(e)
    scores = scores * scale

    # --- initial context (reference attn.py:128-137) ---
    if mask_flag:
        context = jnp.cumsum(v_, axis=-2)  # requires L_Q == L_K (self-attn)
    else:
        context = jnp.broadcast_to(
            jnp.mean(v_, axis=-2, keepdims=True), (b, h, l_q, v_.shape[-1])
        )

    # --- update context at the top queries (reference attn.py:139-158) ---
    if mask_flag:
        # ProbMask: causal-mask rows gathered at the selected query positions.
        cm = causal_mask(l_q, l_k)  # [L_Q, L_K]
        gathered_mask = cm[m_top]  # [B, H, n_top, L_K]
        scores = jnp.where(gathered_mask, NEG_INF, scores)
    attn = jax.nn.softmax(scores, axis=-1)
    update = jnp.einsum("bhuk,bhkd->bhud", attn, v_)
    if use_dense:
        # Scatter-free write-back: the r5 profile (experiments/artifacts/
        # prob_profile.json) measured the put_along_axis scatter at ~27 ms
        # fwd+bwd per encoder call on TPU v5e — 8x the REST of the op
        # combined, and x10 prob layers it was the entire 240 ms/batch gap to
        # the A100 prob baseline. `sel` (the [B, H, n_top, L_Q] query one-hot
        # built above) turns the row write into two einsums on the MXU:
        # rows in the selected set get `update`, the rest keep `context`.
        # top_k indices are distinct, so `in_sel` is exactly 0/1.
        in_sel = jnp.einsum("bhul->bhl", sel)
        scattered = jnp.einsum("bhul,bhud->bhld", sel, update)
        context = (context * (1.0 - in_sel)[..., None]
                   + scattered).astype(context.dtype)
    else:
        d_v = v_.shape[-1]
        context = jnp.put_along_axis(
            context,
            jnp.broadcast_to(m_top[..., None], (*m_top.shape, d_v)),
            update.astype(context.dtype),
            axis=2,
            inplace=False,
        )
    return jnp.swapaxes(context, 1, 2), None  # back to [B, L, H, E]


class AttentionLayer(nn.Module):
    """QKV/output projections around an inner attention
    (reference ``AttentionLayer``, ``attn.py:190-221``).

    ``mix=True`` replicates the reference's head/sequence transpose before the
    output projection (used by decoder self-attention).
    """

    d_model: int
    n_heads: int
    attn: str = "full"  # "full" | "prob" | "ring"
    mask_flag: bool = False
    factor: int = 5
    dropout: float = 0.0
    mix: bool = False
    output_attention: bool = False
    use_pallas: bool = False
    # One fused [d_model, 3*d_model] QKV projection for self-attention (KV
    # pair for cross-attention) instead of three/two separate matmuls — same
    # math and init distribution, fewer dispatches (latency-bound regime,
    # DESIGN.md §8). Distinct param layout ("qkv"/"kv" kernels), so the
    # reference-faithful parity recipe keeps it off; not combined with LSQ
    # (per-tensor step sizes want per-projection tensors).
    fuse_qkv: bool = False
    # Sequence-parallel ring attention (attn="ring"): mesh with a ``seq_axis``
    # axis; Q stays local, K/V shards rotate via ppermute (parallel/ring.py).
    mesh: Any = None
    seq_axis: str = "seq"
    dtype: jnp.dtype = jnp.float32
    lsq_nbits: int | None = None  # LSQ-quantize q/k/v/out kernels
    lsq_fibbinary: bool = False

    def _dense(self, features, name):
        if self.lsq_nbits is not None:
            from ..ops.quant.lsq import DenseLSQ

            return DenseLSQ(
                features, nbits=self.lsq_nbits, quantize=True,
                fibbinary=self.lsq_fibbinary, dtype=self.dtype, name=name,
            )
        return nn.Dense(features, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, queries, keys, values, *, deterministic: bool = True):
        b, l, _ = queries.shape
        s = keys.shape[1]
        h = self.n_heads
        d_head = self.d_model // h

        dense = lambda name: self._dense(d_head * h, name)
        d = d_head * h
        if self.fuse_qkv and self.lsq_nbits is None and queries is keys:
            # Self-attention: one [d_model, 3d] matmul, split into Q/K/V.
            qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(queries)
            q, k, v = (t.reshape(b, l, h, d_head)
                       for t in jnp.split(qkv, 3, axis=-1))
        elif self.fuse_qkv and self.lsq_nbits is None and keys is values:
            # Cross-attention: fuse the K/V pair over the encoder output.
            q = dense("query")(queries).reshape(b, l, h, d_head)
            kv = nn.Dense(2 * d, dtype=self.dtype, name="kv")(keys)
            k, v = (t.reshape(b, s, h, d_head)
                    for t in jnp.split(kv, 2, axis=-1))
        else:
            q = dense("query")(queries).reshape(b, l, h, d_head)
            k = dense("key")(keys).reshape(b, s, h, d_head)
            v = dense("value")(values).reshape(b, s, h, d_head)

        if self.attn == "ring":
            if self.mesh is None:
                raise ValueError("attn='ring' requires a mesh with a "
                                 f"'{self.seq_axis}' axis")
            from ..parallel.ring import ring_attention

            out = ring_attention(
                q, k, v, self.mesh,
                axis_name=self.seq_axis, causal=self.mask_flag,
            )
            attn = None
        elif self.attn == "prob":
            sample_rng = (
                self.make_rng("sample")
                if self.has_rng("sample")
                else jax.random.key(0)
            )
            out, attn = prob_sparse_attention(
                q, k, v,
                mask_flag=self.mask_flag,
                factor=self.factor,
                sample_rng=sample_rng,
            )
        else:
            from ..ops.pallas.bd_attention import (
                TPU_BACKENDS,
                runtime_supported,
                supported_shape,
            )

            drop = 0.0 if deterministic else self.dropout
            if (
                self.use_pallas
                and not self.output_attention
                and supported_shape(q, k, v)
                and runtime_supported(drop)
            ):
                # Fused block-diagonal kernel (fwd + bwd + in-kernel
                # attention-prob dropout) — the training hot path.
                from ..ops.pallas.bd_attention import bd_attention

                if not deterministic and self.dropout > 0.0:
                    seed = jax.random.bits(
                        self.make_rng("dropout"), dtype=jnp.uint32
                    ).astype(jnp.int32)
                    out = bd_attention(
                        q, k, v, causal=self.mask_flag,
                        dropout=self.dropout, seed=seed,
                    )
                else:
                    out = bd_attention(q, k, v, causal=self.mask_flag)
                attn = None
            elif (
                self.use_pallas
                and deterministic
                and not self.output_attention
                and jax.default_backend() in TPU_BACKENDS
            ):
                # Long-sequence eval fallback kernel (native TPU only — it
                # has no interpreter plumbing; other backends take XLA).
                from ..ops.pallas.attention import mha_attention

                out = mha_attention(q, k, v, causal=self.mask_flag)
                attn = None
            else:
                dropout_rng = (
                    self.make_rng("dropout")
                    if (not deterministic and self.dropout > 0.0)
                    else None
                )
                out, attn = full_attention(
                    q, k, v,
                    mask_flag=self.mask_flag,
                    dropout=self.dropout,
                    deterministic=deterministic,
                    dropout_rng=dropout_rng,
                    return_attn=self.output_attention,
                )

        if self.mix:
            # Reference transposes [B, L, H, D] -> [B, H, L, D] then flattens,
            # interleaving heads with sequence (attn.py:216-218).
            out = jnp.swapaxes(out, 1, 2)
        out = out.reshape(b, l, h * d_head)
        out = self._dense(self.d_model, "out")(out)
        return out, attn
