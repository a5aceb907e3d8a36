"""Informer decoder: masked self-attention + cross-attention + FFN.

Reference: ``models/Informer/decoder.py``. The decoder self-attention uses the
configured attention family with a causal mask and ``mix=True``; cross-attention
is always dense FullAttention with ``mix=False`` (reference
``models/Informer/model.py:196-228``).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from .attention import AttentionLayer
from .encoder import FeedForward


class DecoderLayer(nn.Module):
    """Reference ``decoder.py:5-36``: self-attn residual -> norm1 ->
    cross-attn residual -> norm2 -> FFN residual -> norm3."""

    d_model: int
    n_heads: int
    d_ff: int
    dropout: float
    activation: str
    attn: str = "full"
    factor: int = 5
    mix: bool = True
    use_pallas: bool = False
    fuse_qkv: bool = False
    pre_norm: bool = False
    dtype: jnp.dtype = jnp.float32
    lsq_nbits: int | None = None
    lsq_fibbinary: bool = False

    @nn.compact
    def __call__(self, x, cross, *, deterministic: bool = True):
        s_in = nn.LayerNorm(dtype=self.dtype, name="norm1")(x) if self.pre_norm else x
        # Decoder sequences are label_len+pred_len (~15 slots) and stay
        # replicated; "ring" only applies to the encoder's long axis.
        self_attn = "full" if self.attn == "ring" else self.attn
        self_out, _ = AttentionLayer(
            d_model=self.d_model,
            n_heads=self.n_heads,
            attn=self_attn,
            mask_flag=True,
            factor=self.factor,
            dropout=self.dropout,
            mix=self.mix,
            use_pallas=self.use_pallas,
            fuse_qkv=self.fuse_qkv,
            dtype=self.dtype,
            lsq_nbits=self.lsq_nbits,
            lsq_fibbinary=self.lsq_fibbinary,
            name="self_attention",
        )(s_in, s_in, s_in, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(self_out)
        if not self.pre_norm:
            x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        c_in = nn.LayerNorm(dtype=self.dtype, name="norm2")(x) if self.pre_norm else x

        cross_out, _ = AttentionLayer(
            d_model=self.d_model,
            n_heads=self.n_heads,
            attn="full",
            mask_flag=False,
            factor=self.factor,
            dropout=self.dropout,
            mix=False,
            use_pallas=self.use_pallas,
            fuse_qkv=self.fuse_qkv,
            dtype=self.dtype,
            lsq_nbits=self.lsq_nbits,
            lsq_fibbinary=self.lsq_fibbinary,
            name="cross_attention",
        )(c_in, cross, cross, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(cross_out)
        if self.pre_norm:
            y = FeedForward(
                self.d_model, self.d_ff, self.dropout, self.activation,
                dtype=self.dtype, lsq_nbits=self.lsq_nbits,
                lsq_fibbinary=self.lsq_fibbinary, name="ffn",
            )(nn.LayerNorm(dtype=self.dtype, name="norm3")(x),
              deterministic=deterministic)
            return x + y
        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)

        y = FeedForward(
            self.d_model, self.d_ff, self.dropout, self.activation,
            dtype=self.dtype, lsq_nbits=self.lsq_nbits,
            lsq_fibbinary=self.lsq_fibbinary, name="ffn",
        )(x, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(x + y)


class Decoder(nn.Module):
    """Stack of DecoderLayers + final LayerNorm (reference ``decoder.py:38-51``)."""

    num_layers: int
    d_model: int
    n_heads: int
    d_ff: int
    dropout: float
    activation: str
    attn: str = "full"
    factor: int = 5
    mix: bool = True
    use_pallas: bool = False
    fuse_qkv: bool = False
    pre_norm: bool = False
    dtype: jnp.dtype = jnp.float32
    lsq_nbits: int | None = None
    lsq_fibbinary: bool = False

    @nn.compact
    def __call__(self, x, cross, *, deterministic: bool = True):
        for i in range(self.num_layers):
            x = DecoderLayer(
                d_model=self.d_model,
                n_heads=self.n_heads,
                d_ff=self.d_ff,
                dropout=self.dropout,
                activation=self.activation,
                attn=self.attn,
                factor=self.factor,
                mix=self.mix,
                use_pallas=self.use_pallas,
                fuse_qkv=self.fuse_qkv,
                pre_norm=self.pre_norm,
                dtype=self.dtype,
                lsq_nbits=self.lsq_nbits,
                lsq_fibbinary=self.lsq_fibbinary,
                name=f"layer_{i}",
            )(x, cross, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)
