"""Informer encoder: attention layers + conv-distilling pyramid + stack.

Reference: ``models/Informer/encoder.py``. The distilling ``ConvLayer``
(circular conv k=3 -> BatchNorm -> ELU -> MaxPool k=3 s=2 p=1, halving the
sequence, reference ``encoder.py:5-25``) and the multi-resolution
``EncoderStack`` (each encoder sees the last ``L / 2^i`` slots, outputs are
concatenated on the sequence axis, reference ``encoder.py:84-99``) are kept as
architectural features; all ops are expressed in NLC layout so XLA maps the
convs and matmuls onto the MXU without layout shuffles.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .attention import AttentionLayer
from .embed import circular_conv1d


def distilled_length(l: int) -> int:
    """Sequence length after one ConvLayer (maxpool k=3, s=2, p=1)."""
    return (l - 1) // 2 + 1


class ConvLayer(nn.Module):
    """Distilling layer (reference ``encoder.py:5-25``)."""

    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, self.d_model, self.d_model),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.d_model,), jnp.float32)
        y = circular_conv1d(x, kernel.astype(self.dtype), bias.astype(self.dtype))
        y = nn.BatchNorm(
            use_running_average=deterministic,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="norm",
        )(y)
        y = nn.elu(y)
        y = nn.max_pool(y, window_shape=(3,), strides=(2,), padding=((1, 1),))
        return y


class FeedForward(nn.Module):
    """Position-wise FFN as two k=1 convs (== dense layers), matching the
    reference's ``conv1/conv2`` blocks (``encoder.py:31-33``). With
    ``lsq_nbits`` the kernels are LSQ fake-quantized (reference
    ``models/InformerLSQ/encoder.py:38-39`` Conv1dLSQ swap)."""

    d_model: int
    d_ff: int
    dropout: float
    activation: str
    dtype: jnp.dtype = jnp.float32
    lsq_nbits: int | None = None
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
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        act = nn.gelu if self.activation == "gelu" else nn.relu
        y = self._dense(self.d_ff, "conv1")(x)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(act(y))
        y = self._dense(self.d_model, "conv2")(y)
        return nn.Dropout(self.dropout, deterministic=deterministic)(y)


class EncoderLayer(nn.Module):
    """Self-attention + FFN with the reference's norm placement
    (``encoder.py:27-55``): post-norm after attn residual, second residual from
    the *normed* x, post-norm at the end."""

    d_model: int
    n_heads: int
    d_ff: int
    dropout: float
    activation: str
    attn: str = "full"
    factor: int = 5
    output_attention: bool = False
    use_pallas: bool = False
    fuse_qkv: bool = False
    pre_norm: bool = False
    mesh: Any = None  # required for attn="ring" (sequence-parallel)
    seq_axis: str = "seq"
    dtype: jnp.dtype = jnp.float32
    lsq_nbits: int | None = None
    lsq_fibbinary: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True):
        a_in = nn.LayerNorm(dtype=self.dtype, name="norm1")(x) if self.pre_norm else x
        new_x, attn = AttentionLayer(
            d_model=self.d_model,
            n_heads=self.n_heads,
            attn=self.attn,
            mask_flag=False,
            factor=self.factor,
            dropout=self.dropout,
            mix=False,
            output_attention=self.output_attention,
            use_pallas=self.use_pallas,
            fuse_qkv=self.fuse_qkv,
            mesh=self.mesh,
            seq_axis=self.seq_axis,
            dtype=self.dtype,
            lsq_nbits=self.lsq_nbits,
            lsq_fibbinary=self.lsq_fibbinary,
            name="attention",
        )(a_in, a_in, a_in, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(new_x)
        if self.pre_norm:
            y = FeedForward(
                self.d_model, self.d_ff, self.dropout, self.activation,
                dtype=self.dtype, lsq_nbits=self.lsq_nbits,
                lsq_fibbinary=self.lsq_fibbinary, name="ffn",
            )(nn.LayerNorm(dtype=self.dtype, name="norm2")(x),
              deterministic=deterministic)
            return x + y, attn
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = FeedForward(
            self.d_model, self.d_ff, self.dropout, self.activation,
            dtype=self.dtype, lsq_nbits=self.lsq_nbits,
            lsq_fibbinary=self.lsq_fibbinary, name="ffn",
        )(x, deterministic=deterministic)
        out = nn.LayerNorm(dtype=self.dtype, name="norm2")(x + y)
        return out, attn


class Encoder(nn.Module):
    """A stack of EncoderLayers with optional interleaved distilling ConvLayers
    and a final LayerNorm (reference ``encoder.py:57-82``)."""

    num_layers: int
    d_model: int
    n_heads: int
    d_ff: int
    dropout: float
    activation: str
    attn: str = "full"
    factor: int = 5
    distil: bool = True
    output_attention: bool = False
    use_pallas: bool = False
    fuse_qkv: bool = False
    pre_norm: bool = False
    mesh: Any = None  # required for attn="ring" (sequence-parallel)
    seq_axis: str = "seq"
    dtype: jnp.dtype = jnp.float32
    lsq_nbits: int | None = None
    lsq_fibbinary: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True):
        attns = []
        layer_kwargs = dict(
            d_model=self.d_model,
            n_heads=self.n_heads,
            d_ff=self.d_ff,
            dropout=self.dropout,
            activation=self.activation,
            attn=self.attn,
            factor=self.factor,
            output_attention=self.output_attention,
            use_pallas=self.use_pallas,
            fuse_qkv=self.fuse_qkv,
            pre_norm=self.pre_norm,
            mesh=self.mesh,
            seq_axis=self.seq_axis,
            dtype=self.dtype,
            lsq_nbits=self.lsq_nbits,
            lsq_fibbinary=self.lsq_fibbinary,
        )
        if self.distil and self.num_layers > 1:
            for i in range(self.num_layers - 1):
                x, attn = EncoderLayer(**layer_kwargs, name=f"layer_{i}")(
                    x, deterministic=deterministic
                )
                x = ConvLayer(self.d_model, dtype=self.dtype, name=f"distil_{i}")(
                    x, deterministic=deterministic
                )
                attns.append(attn)
            x, attn = EncoderLayer(**layer_kwargs, name=f"layer_{self.num_layers - 1}")(
                x, deterministic=deterministic
            )
            attns.append(attn)
        else:
            for i in range(self.num_layers):
                x, attn = EncoderLayer(**layer_kwargs, name=f"layer_{i}")(
                    x, deterministic=deterministic
                )
                attns.append(attn)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x, attns


class EncoderStack(nn.Module):
    """Multi-resolution encoder stack (reference ``encoder.py:84-99``):
    encoder ``i`` consumes the last ``L / 2^i`` slots; outputs concatenate on
    the sequence axis."""

    e_layers: Sequence[int]
    d_model: int
    n_heads: int
    d_ff: int
    dropout: float
    activation: str
    attn: str = "full"
    factor: int = 5
    distil: bool = True
    output_attention: bool = False
    use_pallas: bool = False
    fuse_qkv: bool = False
    pre_norm: bool = False
    mesh: Any = None  # required for attn="ring" (sequence-parallel)
    seq_axis: str = "seq"
    dtype: jnp.dtype = jnp.float32
    lsq_nbits: int | None = None
    lsq_fibbinary: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True):
        outs, attns = [], []
        l = x.shape[1]
        for i, el in enumerate(self.e_layers):
            inp_len = l // (2**i)
            enc = Encoder(
                num_layers=el,
                d_model=self.d_model,
                n_heads=self.n_heads,
                d_ff=self.d_ff,
                dropout=self.dropout,
                activation=self.activation,
                attn=self.attn,
                factor=self.factor,
                distil=self.distil,
                output_attention=self.output_attention,
                use_pallas=self.use_pallas,
                fuse_qkv=self.fuse_qkv,
                pre_norm=self.pre_norm,
                mesh=self.mesh,
                seq_axis=self.seq_axis,
                dtype=self.dtype,
                lsq_nbits=self.lsq_nbits,
                lsq_fibbinary=self.lsq_fibbinary,
                name=f"encoder_{i}",
            )
            x_s, attn = enc(x[:, l - inp_len :, :], deterministic=deterministic)
            outs.append(x_s)
            attns.append(attn)
        return jnp.concatenate(outs, axis=-2), attns


def encoder_stack_output_length(seq_len: int, e_layers: Sequence[int], distil: bool) -> int:
    """Static output length of :class:`EncoderStack` for a given input length."""
    total = 0
    for i, el in enumerate(e_layers):
        l = seq_len // (2**i)
        if distil:
            for _ in range(max(el - 1, 0)):
                l = distilled_length(l)
        total += l
    return total
