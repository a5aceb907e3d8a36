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
