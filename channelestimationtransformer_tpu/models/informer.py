"""Informer and InformerStack — the flagship channel-prediction models.

Reference: ``models/Informer/model.py`` (``Informer:11``, ``InformerStack:137``).
Keyword-only construction from :class:`InformerConfig` eliminates the
reference's positional-argument-shift bug class (SURVEY §7.4 quirk 1). The
temporal-mark inputs are dropped entirely (quirk 3: the reference never uses
them).

Forward contract: ``model(enc_in [B,seq_len,F], dec_in [B,label_len+pred_len,F])
-> pred [B, pred_len, c_out]`` (plus attention maps if ``output_attention``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..core.config import InformerConfig
from .decoder import Decoder
from .embed import DataEmbedding
from .encoder import Encoder, EncoderStack


class InformerBase(nn.Module):
    """Shared embedding/decoder/projection scaffolding; the encoder is supplied
    by the concrete subclasses below."""

    config: InformerConfig
    mesh: Any = None  # for attn="ring" sequence-parallel encoders
    seq_axis: str = "seq"

    def _encoder(self):
        raise NotImplementedError

    @nn.compact
    def __call__(self, x_enc, x_dec, *, deterministic: bool = True):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)

        enc = DataEmbedding(cfg.d_model, cfg.dropout, dtype=dtype, name="enc_embedding")(
            x_enc, deterministic=deterministic
        )
        enc_out, attns = self._encoder()(enc, deterministic=deterministic)

        dec = DataEmbedding(cfg.d_model, cfg.dropout, dtype=dtype, name="dec_embedding")(
            x_dec, deterministic=deterministic
        )
        dec_out = Decoder(
            num_layers=cfg.d_layers,
            d_model=cfg.d_model,
            n_heads=cfg.n_heads,
            d_ff=cfg.d_ff,
            dropout=cfg.dropout,
            activation=cfg.activation,
            attn=cfg.attn,
            factor=cfg.factor,
            mix=cfg.mix,
            pre_norm=cfg.pre_norm,
            dtype=dtype,
            lsq_nbits=cfg.lsq_nbits,
            lsq_fibbinary=cfg.lsq_fibbinary,
            use_pallas=cfg.use_pallas,
            fuse_qkv=cfg.fuse_qkv,
            name="decoder",
        )(dec, enc_out, deterministic=deterministic)

        out = nn.Dense(cfg.c_out, dtype=dtype, name="projection")(dec_out)
        pred = out[:, -cfg.pred_len :, :]
        if cfg.output_attention:
            return pred, attns
        return pred


class Informer(InformerBase):
    """Single-resolution Informer (reference ``models/Informer/model.py:11-134``)."""

    def _encoder(self):
        cfg = self.config
        e_layers = cfg.e_layers[0] if not isinstance(cfg.e_layers, int) else cfg.e_layers
        return Encoder(
            num_layers=e_layers,
            d_model=cfg.d_model,
            n_heads=cfg.n_heads,
            d_ff=cfg.d_ff,
            dropout=cfg.dropout,
            activation=cfg.activation,
            attn=cfg.attn,
            factor=cfg.factor,
            distil=cfg.distil,
            output_attention=cfg.output_attention,
            pre_norm=cfg.pre_norm,
            mesh=self.mesh,
            seq_axis=self.seq_axis,
            dtype=jnp.dtype(cfg.dtype),
            lsq_nbits=cfg.lsq_nbits,
            lsq_fibbinary=cfg.lsq_fibbinary,
            use_pallas=cfg.use_pallas,
            fuse_qkv=cfg.fuse_qkv,
            name="encoder",
        )


class InformerStack(InformerBase):
    """Multi-resolution Informer stack (reference ``model.py:137-267``) — the
    model used by every reference experiment (with e_layers=[4,3])."""

    def _encoder(self):
        cfg = self.config
        return EncoderStack(
            e_layers=tuple(cfg.e_layers),
            d_model=cfg.d_model,
            n_heads=cfg.n_heads,
            d_ff=cfg.d_ff,
            dropout=cfg.dropout,
            activation=cfg.activation,
            attn=cfg.attn,
            factor=cfg.factor,
            distil=cfg.distil,
            output_attention=cfg.output_attention,
            pre_norm=cfg.pre_norm,
            mesh=self.mesh,
            seq_axis=self.seq_axis,
            dtype=jnp.dtype(cfg.dtype),
            lsq_nbits=cfg.lsq_nbits,
            lsq_fibbinary=cfg.lsq_fibbinary,
            use_pallas=cfg.use_pallas,
            fuse_qkv=cfg.fuse_qkv,
            name="encoder",
        )


def build_informer(config: InformerConfig, *, mesh=None, seq_axis="seq") -> InformerBase:
    """Factory: stacked encoder when ``e_layers`` has >1 entry, like the
    reference experiment drivers always instantiating ``InformerStack``.

    ``mesh``/``seq_axis``: device mesh for ``attn="ring"`` sequence-parallel
    encoders (the encoder sequence axis is sharded; parallel/ring.py).
    """
    if isinstance(config.e_layers, int) or len(config.e_layers) == 1:
        return Informer(config=config, mesh=mesh, seq_axis=seq_axis)
    return InformerStack(config=config, mesh=mesh, seq_axis=seq_axis)
