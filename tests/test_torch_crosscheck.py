"""Cross-check layer semantics against torch (CPU) with shared weights.

The reference is a PyTorch codebase; its layer semantics (circular Conv1d
padding, MaxPool1d(k=3, s=2, p=1), BatchNorm1d eval statistics, ELU, the
attention 'mix' head/sequence transpose) are re-derived here in fresh torch
modules and compared numerically against this framework's JAX implementations
with identical weights. Guards against silent drift of the ported semantics
(reference pointers: ``models/Informer/embed.py:26-37``,
``models/Informer/encoder.py:5-25``, ``models/Informer/attn.py:190-221``).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from channelestimationtransformer_tpu.models.attention import full_attention
from channelestimationtransformer_tpu.models.embed import circular_conv1d
from channelestimationtransformer_tpu.models.encoder import ConvLayer


def test_circular_conv1d_matches_torch():
    rng = np.random.default_rng(0)
    b, l, c_in, c_out, k = 3, 17, 5, 8, 3
    x = rng.normal(size=(b, l, c_in)).astype(np.float32)
    w = rng.normal(size=(k, c_in, c_out)).astype(np.float32)

    out_jax = np.asarray(circular_conv1d(jnp.asarray(x), jnp.asarray(w)))

    conv = torch.nn.Conv1d(c_in, c_out, kernel_size=k, padding=k // 2,
                           padding_mode="circular", bias=False)
    # torch kernel layout [C_out, C_in, K]
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))
        out_t = conv(torch.from_numpy(x.transpose(0, 2, 1)))
    out_torch = out_t.numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(out_jax, out_torch, rtol=1e-5, atol=1e-5)


def test_distil_convlayer_matches_torch_eval():
    """ConvLayer (circular conv k=3 -> BatchNorm -> ELU -> MaxPool k3 s2 p1)
    vs the same stack built in torch, in eval mode with shared weights and
    matched running statistics."""
    rng = np.random.default_rng(1)
    b, l, d = 2, 21, 6
    x = rng.normal(size=(b, l, d)).astype(np.float32)

    layer = ConvLayer(d_model=d)
    variables = layer.init(jax.random.key(0), jnp.asarray(x))
    # Non-trivial weights and batch stats.
    w = rng.normal(size=(3, d, d)).astype(np.float32) * 0.3
    bias = rng.normal(size=(d,)).astype(np.float32) * 0.1
    scale = rng.uniform(0.5, 1.5, size=(d,)).astype(np.float32)
    bnb = rng.normal(size=(d,)).astype(np.float32) * 0.1
    mean = rng.normal(size=(d,)).astype(np.float32) * 0.2
    var = rng.uniform(0.5, 2.0, size=(d,)).astype(np.float32)
    variables = {
        "params": {
            "kernel": jnp.asarray(w),
            "bias": jnp.asarray(bias),
            "norm": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bnb)},
        },
        "batch_stats": {"norm": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)}},
    }
    out_jax = np.asarray(layer.apply(variables, jnp.asarray(x), deterministic=True))

    conv = torch.nn.Conv1d(d, d, 3, padding=1, padding_mode="circular")
    bn = torch.nn.BatchNorm1d(d, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))
        conv.bias.copy_(torch.from_numpy(bias))
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bnb))
        bn.running_mean.copy_(torch.from_numpy(mean))
        bn.running_var.copy_(torch.from_numpy(var))
        bn.eval()
        t = torch.from_numpy(x.transpose(0, 2, 1))
        t = torch.nn.functional.elu(bn(conv(t)))
        t = torch.nn.functional.max_pool1d(t, kernel_size=3, stride=2, padding=1)
    out_torch = t.numpy().transpose(0, 2, 1)
    assert out_jax.shape == out_torch.shape
    np.testing.assert_allclose(out_jax, out_torch, rtol=1e-4, atol=1e-5)


def test_full_attention_matches_torch_reference_math():
    """full_attention vs the reference einsum chain re-expressed in torch
    (scale AFTER mask, softmax over keys; reference ``attn.py:54-82``)."""
    rng = np.random.default_rng(2)
    b, l, s, h, e = 2, 7, 9, 4, 8
    q = rng.normal(size=(b, l, h, e)).astype(np.float32)
    k = rng.normal(size=(b, s, h, e)).astype(np.float32)
    v = rng.normal(size=(b, s, h, e)).astype(np.float32)

    out_jax, _ = full_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask_flag=False
    )

    tq, tk, tv = map(torch.from_numpy, (q, k, v))
    scores = torch.einsum("blhe,bshe->bhls", tq, tk)
    a = torch.softmax(scores / np.sqrt(e), dim=-1)
    out_torch = torch.einsum("bhls,bshd->blhd", a, tv).numpy()
    np.testing.assert_allclose(np.asarray(out_jax), out_torch, rtol=1e-5, atol=1e-6)


def test_causal_full_attention_matches_torch():
    rng = np.random.default_rng(3)
    b, l, h, e = 2, 9, 2, 4
    q = rng.normal(size=(b, l, h, e)).astype(np.float32)
    k = rng.normal(size=(b, l, h, e)).astype(np.float32)
    v = rng.normal(size=(b, l, h, e)).astype(np.float32)
    out_jax, _ = full_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask_flag=True
    )
    tq, tk, tv = map(torch.from_numpy, (q, k, v))
    scores = torch.einsum("blhe,bshe->bhls", tq, tk)
    mask = torch.triu(torch.ones(l, l, dtype=torch.bool), diagonal=1)
    scores = scores.masked_fill(mask[None, None], -np.inf)
    a = torch.softmax(scores / np.sqrt(e), dim=-1)
    out_torch = torch.einsum("bhls,bshd->blhd", a, tv).numpy()
    np.testing.assert_allclose(np.asarray(out_jax), out_torch, rtol=1e-5, atol=1e-6)


def _copy_attn(params, tmod):
    """flax AttentionLayer params -> torch AttnLayer weights."""
    for fl, tl in (("query", tmod.q), ("key", tmod.k), ("value", tmod.v), ("out", tmod.out)):
        tl.weight.data = torch.from_numpy(np.asarray(params[fl]["kernel"]).T.copy())
        tl.bias.data = torch.from_numpy(np.asarray(params[fl]["bias"]).copy())


def _copy_ffn_and_norms(params, tmod):
    """flax EncoderLayer/DecoderLayer FFN+norm params -> torch module."""
    tmod.conv1.weight.data = torch.from_numpy(
        np.asarray(params["ffn"]["conv1"]["kernel"]).T.copy()
    ).unsqueeze(-1)
    tmod.conv1.bias.data = torch.from_numpy(np.asarray(params["ffn"]["conv1"]["bias"]).copy())
    tmod.conv2.weight.data = torch.from_numpy(
        np.asarray(params["ffn"]["conv2"]["kernel"]).T.copy()
    ).unsqueeze(-1)
    tmod.conv2.bias.data = torch.from_numpy(np.asarray(params["ffn"]["conv2"]["bias"]).copy())
    for name in ("norm1", "norm2", "norm3"):
        if name in params and hasattr(tmod, name):
            tn = getattr(tmod, name)
            tn.weight.data = torch.from_numpy(np.asarray(params[name]["scale"]).copy())
            tn.bias.data = torch.from_numpy(np.asarray(params[name]["bias"]).copy())


def _copy_embed(params, tmod):
    tmod.value.conv.weight.data = torch.from_numpy(
        np.asarray(params["token"]["kernel"]).transpose(2, 1, 0).copy()
    )
    tmod.value.conv.bias.data.zero_()  # flax TokenEmbedding has no bias


def _copy_distil(params, stats, tmod):
    tmod.conv.weight.data = torch.from_numpy(
        np.asarray(params["kernel"]).transpose(2, 1, 0).copy()
    )
    tmod.conv.bias.data = torch.from_numpy(np.asarray(params["bias"]).copy())
    tmod.norm.weight.data = torch.from_numpy(np.asarray(params["norm"]["scale"]).copy())
    tmod.norm.bias.data = torch.from_numpy(np.asarray(params["norm"]["bias"]).copy())
    tmod.norm.running_mean.data = torch.from_numpy(np.asarray(stats["norm"]["mean"]).copy())
    tmod.norm.running_var.data = torch.from_numpy(np.asarray(stats["norm"]["var"]).copy())


def test_full_informer_stack_matches_torch():
    """Full-model forward equivalence: flax InformerStack vs a fresh torch
    implementation of the reference architecture (experiments/torch_ref.py)
    with identical weights, eval mode. Pins every layer's semantics at once
    (reference models/Informer/model.py:137-267)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from experiments.torch_ref import TorchInformerStack

    from channelestimationtransformer_tpu.core.config import InformerConfig
    from channelestimationtransformer_tpu.models import build_informer

    cfg = InformerConfig(
        seq_len=24, label_len=6, pred_len=5, d_model=32, n_heads=4,
        e_layers=(2, 2), d_layers=2, d_ff=32, dropout=0.0, attn="full",
        distil=True, output_attention=False,
    )
    fmodel = build_informer(cfg)
    rng = np.random.default_rng(0)
    x_enc = rng.normal(size=(3, cfg.seq_len, cfg.enc_in)).astype(np.float32)
    x_dec = rng.normal(size=(3, cfg.label_len + cfg.pred_len, cfg.dec_in)).astype(np.float32)
    variables = fmodel.init(jax.random.key(0), jnp.asarray(x_enc), jnp.asarray(x_dec))
    params, stats = variables["params"], variables.get("batch_stats", {})

    tmodel = TorchInformerStack(
        enc_in=cfg.enc_in, dec_in=cfg.dec_in, c_out=cfg.c_out,
        pred_len=cfg.pred_len, d_model=cfg.d_model, n_heads=cfg.n_heads,
        e_layers=cfg.e_layers, d_layers=cfg.d_layers, d_ff=cfg.d_ff,
        dropout=0.0, distil=True, mix=True,
    )
    _copy_embed(params["enc_embedding"], tmodel.enc_embedding)
    _copy_embed(params["dec_embedding"], tmodel.dec_embedding)
    for i in range(len(cfg.e_layers)):
        fenc = params["encoder"][f"encoder_{i}"]
        fstat = stats.get("encoder", {}).get(f"encoder_{i}", {})
        tenc = tmodel.encoders[i]
        for j in range(cfg.e_layers[i]):
            fl = fenc[f"layer_{j}"]
            _copy_attn(fl["attention"], tenc.layers[j].attn)
            _copy_ffn_and_norms(fl, tenc.layers[j])
        for j in range(cfg.e_layers[i] - 1):
            _copy_distil(fenc[f"distil_{j}"], fstat[f"distil_{j}"], tenc.convs[j])
        tenc.norm.weight.data = torch.from_numpy(np.asarray(fenc["norm"]["scale"]).copy())
        tenc.norm.bias.data = torch.from_numpy(np.asarray(fenc["norm"]["bias"]).copy())
    for i in range(cfg.d_layers):
        fl = params["decoder"][f"layer_{i}"]
        tdl = tmodel.decoder[i]
        _copy_attn(fl["self_attention"], tdl.self_attn)
        _copy_attn(fl["cross_attention"], tdl.cross_attn)
        _copy_ffn_and_norms(fl, tdl)
    tmodel.dec_norm.weight.data = torch.from_numpy(
        np.asarray(params["decoder"]["norm"]["scale"]).copy()
    )
    tmodel.dec_norm.bias.data = torch.from_numpy(
        np.asarray(params["decoder"]["norm"]["bias"]).copy()
    )
    tmodel.projection.weight.data = torch.from_numpy(
        np.asarray(params["projection"]["kernel"]).T.copy()
    )
    tmodel.projection.bias.data = torch.from_numpy(
        np.asarray(params["projection"]["bias"]).copy()
    )

    tmodel.eval()
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x_enc), torch.from_numpy(x_dec)).numpy()
    f_out = np.asarray(
        fmodel.apply(variables, jnp.asarray(x_enc), jnp.asarray(x_dec))
    )
    np.testing.assert_allclose(f_out, t_out, rtol=2e-4, atol=2e-5)
