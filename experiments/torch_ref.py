"""Faithful torch re-implementation of the reference InformerStack (full-attn).

Purpose: A/B harness to localize the round-1 NMSE convergence gap. This is a
fresh implementation of the reference architecture's *semantics* (studied from
``/root/reference/models/Informer/{model,attn,encoder,decoder,embed}.py``) used
only for cross-checking the JAX stack — it is not part of the framework.

Replicated semantics (with reference pointers):
- TokenEmbedding: circular Conv1d k=3, kaiming_normal(fan_in, leaky_relu),
  bias on (embed.py:26-38); sinusoid positional table (embed.py:7-24);
  value+pos then dropout (embed.py:96-108; temporal marks unused, quirk 3).
- FullAttention: softmax(scale * QK^T) with scale=1/sqrt(E), dropout on the
  attention matrix (attn.py:37-82; the debug sio.savemat is NOT replicated).
- AttentionLayer: per-head projections, optional ``mix`` transpose that
  interleaves heads with sequence before the out projection (attn.py:190-221).
- EncoderLayer post-norm block and ConvLayer distil (circular conv k=3 ->
  BatchNorm -> ELU -> MaxPool(3,2,1)) (encoder.py:5-55).
- EncoderStack multi-resolution slicing x[:, -L/2^i:] (encoder.py:84-99,
  model.py:174-200).
- DecoderLayer: causal self-attn (mix=True), dense cross-attn (mix=False),
  conv FFN, three norms (decoder.py:5-36).
- Projection + [-pred_len:] slice (model.py:237-267).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class SinusoidPositional(nn.Module):
    def __init__(self, d_model: int, max_len: int = 5000):
        super().__init__()
        pe = torch.zeros(max_len, d_model)
        pos = torch.arange(max_len, dtype=torch.float32).unsqueeze(1)
        div = torch.exp(
            torch.arange(0, d_model, 2, dtype=torch.float32)
            * -(math.log(10000.0) / d_model)
        )
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe.unsqueeze(0))

    def forward(self, x):
        return self.pe[:, : x.size(1)]


class TokenEmbed(nn.Module):
    def __init__(self, c_in: int, d_model: int):
        super().__init__()
        self.conv = nn.Conv1d(c_in, d_model, 3, padding=1, padding_mode="circular")
        nn.init.kaiming_normal_(self.conv.weight, mode="fan_in", nonlinearity="leaky_relu")

    def forward(self, x):  # [B, L, C]
        return self.conv(x.permute(0, 2, 1)).transpose(1, 2)


class DataEmbed(nn.Module):
    def __init__(self, c_in: int, d_model: int, dropout: float):
        super().__init__()
        self.value = TokenEmbed(c_in, d_model)
        self.pos = SinusoidPositional(d_model)
        self.dropout = nn.Dropout(dropout)

    def forward(self, x):
        return self.dropout(self.value(x) + self.pos(x))


class FullAttn(nn.Module):
    def __init__(self, mask_flag: bool, dropout: float):
        super().__init__()
        self.mask_flag = mask_flag
        self.dropout = nn.Dropout(dropout)

    def forward(self, q, k, v):  # [B, L, H, E]
        b, l, h, e = q.shape
        scale = 1.0 / math.sqrt(e)
        scores = torch.einsum("blhe,bshe->bhls", q, k)
        if self.mask_flag:
            causal = torch.triu(
                torch.ones(l, scores.shape[-1], dtype=torch.bool, device=q.device), 1
            )
            scores = scores.masked_fill(causal, float("-inf"))
        a = self.dropout(torch.softmax(scale * scores, dim=-1))
        return torch.einsum("bhls,bshd->blhd", a, v).contiguous()


class AttnLayer(nn.Module):
    def __init__(self, d_model: int, n_heads: int, mask_flag: bool, mix: bool, dropout: float):
        super().__init__()
        d_head = d_model // n_heads
        self.q = nn.Linear(d_model, d_head * n_heads)
        self.k = nn.Linear(d_model, d_head * n_heads)
        self.v = nn.Linear(d_model, d_head * n_heads)
        self.out = nn.Linear(d_head * n_heads, d_model)
        self.inner = FullAttn(mask_flag, dropout)
        self.h = n_heads
        self.mix = mix

    def forward(self, queries, keys, values):
        b, l, _ = queries.shape
        s = keys.shape[1]
        q = self.q(queries).view(b, l, self.h, -1)
        k = self.k(keys).view(b, s, self.h, -1)
        v = self.v(values).view(b, s, self.h, -1)
        o = self.inner(q, k, v)  # [B, L, H, D]
        if self.mix:
            o = o.transpose(2, 1).contiguous()  # [B, H, L, D] (reference quirk)
        return self.out(o.view(b, l, -1))


class DistilConv(nn.Module):
    def __init__(self, d_model: int):
        super().__init__()
        self.conv = nn.Conv1d(d_model, d_model, 3, padding=1, padding_mode="circular")
        self.norm = nn.BatchNorm1d(d_model)
        self.act = nn.ELU()
        self.pool = nn.MaxPool1d(3, stride=2, padding=1)

    def forward(self, x):  # [B, L, D]
        y = self.conv(x.permute(0, 2, 1))
        y = self.pool(self.act(self.norm(y)))
        return y.transpose(1, 2)


class EncLayer(nn.Module):
    def __init__(self, d_model: int, n_heads: int, d_ff: int, dropout: float):
        super().__init__()
        self.attn = AttnLayer(d_model, n_heads, mask_flag=False, mix=False, dropout=dropout)
        self.conv1 = nn.Conv1d(d_model, d_ff, 1)
        self.conv2 = nn.Conv1d(d_ff, d_model, 1)
        self.norm1 = nn.LayerNorm(d_model)
        self.norm2 = nn.LayerNorm(d_model)
        self.dropout = nn.Dropout(dropout)

    def forward(self, x):
        x = x + self.dropout(self.attn(x, x, x))
        y = x = self.norm1(x)
        y = self.dropout(F.gelu(self.conv1(y.transpose(-1, 1)), approximate='tanh'))
        y = self.dropout(self.conv2(y).transpose(-1, 1))
        return self.norm2(x + y)


class Encoder(nn.Module):
    def __init__(self, num_layers: int, d_model: int, n_heads: int, d_ff: int,
                 dropout: float, distil: bool):
        super().__init__()
        self.layers = nn.ModuleList(
            EncLayer(d_model, n_heads, d_ff, dropout) for _ in range(num_layers)
        )
        self.convs = (
            nn.ModuleList(DistilConv(d_model) for _ in range(num_layers - 1))
            if distil and num_layers > 1 else None
        )
        self.norm = nn.LayerNorm(d_model)

    def forward(self, x):
        if self.convs is not None:
            for layer, conv in zip(self.layers[:-1], self.convs):
                x = conv(layer(x))
            x = self.layers[-1](x)
        else:
            for layer in self.layers:
                x = layer(x)
        return self.norm(x)


class DecLayer(nn.Module):
    def __init__(self, d_model: int, n_heads: int, d_ff: int, dropout: float, mix: bool):
        super().__init__()
        self.self_attn = AttnLayer(d_model, n_heads, mask_flag=True, mix=mix, dropout=dropout)
        self.cross_attn = AttnLayer(d_model, n_heads, mask_flag=False, mix=False, dropout=dropout)
        self.conv1 = nn.Conv1d(d_model, d_ff, 1)
        self.conv2 = nn.Conv1d(d_ff, d_model, 1)
        self.norm1 = nn.LayerNorm(d_model)
        self.norm2 = nn.LayerNorm(d_model)
        self.norm3 = nn.LayerNorm(d_model)
        self.dropout = nn.Dropout(dropout)

    def forward(self, x, cross):
        x = self.norm1(x + self.dropout(self.self_attn(x, x, x)))
        x = x + self.dropout(self.cross_attn(x, cross, cross))
        y = x = self.norm2(x)
        y = self.dropout(F.gelu(self.conv1(y.transpose(-1, 1)), approximate='tanh'))
        y = self.dropout(self.conv2(y).transpose(-1, 1))
        return self.norm3(x + y)


class TorchInformerStack(nn.Module):
    """Reference InformerStack, full-attention path, effective config after the
    positional-shift quirk (distil on, gelu, mix=True on decoder self-attn)."""

    def __init__(self, enc_in=16, dec_in=16, c_out=16, pred_len=5, d_model=128,
                 n_heads=8, e_layers=(4, 3), d_layers=3, d_ff=64, dropout=0.05,
                 distil=True, mix=True):
        super().__init__()
        self.pred_len = pred_len
        self.enc_embedding = DataEmbed(enc_in, d_model, dropout)
        self.dec_embedding = DataEmbed(dec_in, d_model, dropout)
        self.encoders = nn.ModuleList(
            Encoder(el, d_model, n_heads, d_ff, dropout, distil) for el in e_layers
        )
        self.decoder = nn.ModuleList(
            DecLayer(d_model, n_heads, d_ff, dropout, mix) for _ in range(d_layers)
        )
        self.dec_norm = nn.LayerNorm(d_model)
        self.projection = nn.Linear(d_model, c_out)

    def forward(self, x_enc, x_dec):
        l = x_enc.shape[1]
        enc = self.enc_embedding(x_enc)
        outs = []
        for i, encoder in enumerate(self.encoders):
            inp_len = l // (2 ** i)
            outs.append(encoder(enc[:, l - inp_len:, :]))
        enc_out = torch.cat(outs, dim=1)

        dec = self.dec_embedding(x_dec)
        for layer in self.decoder:
            dec = layer(dec, enc_out)
        dec = self.dec_norm(dec)
        out = self.projection(dec)
        return out[:, -self.pred_len:, :]


def nmse(pred, target):
    return torch.sum((pred - target) ** 2) / torch.sum(target ** 2)


def nmse_split(pred, target):
    """Per-horizon NMSE normalized by PREDICTION power (reference
    Utils/metrics.py:26-39 quirk)."""
    num = torch.sum((pred - target) ** 2, dim=(0, 2))
    den = torch.sum(pred ** 2, dim=(0, 2))
    return num / den
