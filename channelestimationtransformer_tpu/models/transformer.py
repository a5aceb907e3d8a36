"""Vanilla encoder-decoder Transformer baseline.

Reference: ``models/Transformer/`` (``build_transformer``, ``model.py:90-174``;
building blocks in ``buildingblocks.py``): continuous-input conv embedding,
sinusoidal positions, pre-norm residual blocks, causal decoder, projection to
``c_out`` and the last ``pred_len`` steps returned.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..core.config import TransformerConfig
from .attention import AttentionLayer
from .embed import DataEmbedding


class PreNormBlock(nn.Module):
    """Pre-norm residual: ``x + dropout(sublayer(norm(x)))`` (reference
    ``buildingblocks.py`` ResidualConnection)."""

    d_model: int
    n_heads: int
    d_ff: int
    dropout: float
    causal_self: bool = False
    cross: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, *, deterministic: bool = True):
        h = nn.LayerNorm(dtype=self.dtype, name="norm_attn")(x)
        attn_out, _ = AttentionLayer(
            d_model=self.d_model, n_heads=self.n_heads, attn="full",
            mask_flag=self.causal_self, dropout=self.dropout,
            dtype=self.dtype, name="self_attention",
        )(h, h, h, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(attn_out)

        if self.cross:
            h = nn.LayerNorm(dtype=self.dtype, name="norm_cross")(x)
            cross_out, _ = AttentionLayer(
                d_model=self.d_model, n_heads=self.n_heads, attn="full",
                mask_flag=False, dropout=self.dropout,
                dtype=self.dtype, name="cross_attention",
            )(h, context, context, deterministic=deterministic)
            x = x + nn.Dropout(self.dropout, deterministic=deterministic)(cross_out)

        h = nn.LayerNorm(dtype=self.dtype, name="norm_ffn")(x)
        h = nn.Dense(self.d_ff, dtype=self.dtype, name="ffn1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="ffn2")(h)
        return x + nn.Dropout(self.dropout, deterministic=deterministic)(h)


class Transformer(nn.Module):
    """``model(enc_in [B,seq,F], dec_in [B,label+pred,F]) -> [B,pred,c_out]``."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, x_enc, x_dec, *, deterministic: bool = True):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)

        enc = DataEmbedding(cfg.d_model, cfg.dropout, dtype=dtype, name="src_embed")(
            x_enc, deterministic=deterministic
        )
        for i in range(cfg.num_encoder_layers):
            enc = PreNormBlock(
                d_model=cfg.d_model, n_heads=cfg.n_heads, d_ff=cfg.d_ff,
                dropout=cfg.dropout, dtype=dtype, name=f"encoder_{i}",
            )(enc, deterministic=deterministic)
        enc = nn.LayerNorm(dtype=dtype, name="encoder_norm")(enc)

        dec = DataEmbedding(cfg.d_model, cfg.dropout, dtype=dtype, name="tgt_embed")(
            x_dec, deterministic=deterministic
        )
        for i in range(cfg.num_decoder_layers):
            dec = PreNormBlock(
                d_model=cfg.d_model, n_heads=cfg.n_heads, d_ff=cfg.d_ff,
                dropout=cfg.dropout, causal_self=True, cross=True,
                dtype=dtype, name=f"decoder_{i}",
            )(dec, context=enc, deterministic=deterministic)
        dec = nn.LayerNorm(dtype=dtype, name="decoder_norm")(dec)

        out = nn.Dense(cfg.c_out, dtype=dtype, name="projection")(dec)
        return out[:, -cfg.pred_len :, :]
