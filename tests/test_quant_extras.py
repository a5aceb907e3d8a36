"""Tests for activation quantization (auto_low), pruning, settings builder,
LSQ-quantized Informer, and complexity/log-parsing utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from channelestimationtransformer_tpu.core.config import InformerConfig
from channelestimationtransformer_tpu.models import build_informer
from channelestimationtransformer_tpu.models.informer_lsq import build_informer_lsq
from channelestimationtransformer_tpu.ops.prune import (
    apply_pruning,
    block_magnitude_mask,
    cubic_sparsity_schedule,
    measured_sparsity,
)
from channelestimationtransformer_tpu.ops.quant import FixedPoint, quantizer
from channelestimationtransformer_tpu.ops.quant.auto_low import quantize_activations
from channelestimationtransformer_tpu.ops.quant.settings import (
    build_weight_quant_settings,
    quantized_param_names,
)


def _small_cfg(**kw):
    base = dict(
        seq_len=24, label_len=6, pred_len=5, d_model=32, n_heads=4,
        e_layers=(2, 1), d_layers=2, d_ff=16, dropout=0.0,
    )
    base.update(kw)
    return InformerConfig(**base)


def _init(model, cfg):
    x_enc = jnp.ones((2, cfg.seq_len, cfg.enc_in))
    x_dec = jnp.ones((2, cfg.dec_len, cfg.dec_in))
    return model.init(jax.random.key(0), x_enc, x_dec), x_enc, x_dec


def test_quantized_param_names_cover_attention_and_ffn():
    cfg = _small_cfg()
    model = build_informer(cfg)
    variables, _, _ = _init(model, cfg)
    names = quantized_param_names(variables["params"])
    # Encoder stack: 3 enc layers x (4 attn + 2 ffn) = 18; decoder: 2 layers x
    # (2 attentions x 4 + 2 ffn) = 20. Total 38 quantized kernels.
    assert len(names) == 38, (len(names), names[:5])
    assert any("self_attention/query/kernel" in n for n in names)
    assert any("cross_attention/out/kernel" in n for n in names)
    assert any("ffn/conv1/kernel" in n for n in names)
    # Embeddings / final projection excluded (reference keeps them FP32).
    assert not any("embedding" in n for n in names)
    assert not any(n.startswith("projection") for n in names)


def test_lsq_informer_forward_and_grads():
    cfg = _small_cfg()
    model = build_informer_lsq(cfg, nbits=8)
    variables, x_enc, x_dec = _init(model, cfg)
    # step_size params exist for quantized kernels.
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    step_names = [jax.tree_util.keystr(p) for p, _ in flat if "step_size" in jax.tree_util.keystr(p)]
    assert len(step_names) == 38, len(step_names)
    out = model.apply(variables, x_enc, x_dec)
    assert np.isfinite(np.asarray(out)).all()

    def loss(params):
        return jnp.sum(
            model.apply({**variables, "params": params}, x_enc, x_dec) ** 2
        )

    g = jax.grad(loss)(variables["params"])
    gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_lsq_fp32_weights_interchange():
    # FP32 and LSQ models share parameter names (minus step_size), enabling
    # the reference's strict=False preload pattern.
    cfg = _small_cfg()
    fp32 = build_informer(cfg)
    lsq = build_informer_lsq(cfg, nbits=8)
    v32, _, _ = _init(fp32, cfg)
    vlsq, _, _ = _init(lsq, cfg)

    def names(tree):
        return {
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(tree)
        }

    n32 = names(v32["params"])
    nlsq = names(vlsq["params"])
    assert n32 <= nlsq
    assert all("step_size" in n for n in nlsq - n32)


def test_quantize_activations_context():
    cfg = _small_cfg()
    model = build_informer(cfg)
    variables, x_enc, x_dec = _init(model, cfg)
    q = quantizer(forward_number=FixedPoint(wl=6, fl=3))
    base = model.apply(variables, x_enc, x_dec)
    with quantize_activations(lambda x: q(x), (nn.Dense,)):
        quantized = model.apply(variables, x_enc, x_dec)
    assert not np.allclose(np.asarray(base), np.asarray(quantized))
    # Coarser format changes outputs more.
    q2 = quantizer(forward_number=FixedPoint(wl=3, fl=1))
    with quantize_activations(lambda x: q2(x), (nn.Dense,)):
        coarse = model.apply(variables, x_enc, x_dec)
    d_fine = float(jnp.mean((base - quantized) ** 2))
    d_coarse = float(jnp.mean((base - coarse) ** 2))
    assert d_coarse > d_fine


def test_block_magnitude_mask_pattern_and_sparsity():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    mask = np.asarray(block_magnitude_mask(w, 0.5, block=4))
    # 4x1 pattern: mask constant within each 4-row block per column.
    blocks = mask.reshape(16, 4, 32)
    assert (blocks.all(axis=1) | (~blocks.any(axis=1))).all()
    assert abs((~mask).mean() - 0.5) < 0.1


def test_apply_pruning_and_measured_sparsity():
    cfg = _small_cfg()
    model = build_informer(cfg)
    variables, _, _ = _init(model, cfg)
    pruned = apply_pruning(variables["params"], 0.75)
    s = measured_sparsity(jax.device_get(pruned))
    assert 0.6 < s < 0.9, s


def test_cubic_schedule():
    assert cubic_sparsity_schedule(0, target=0.9, end_step=100) == 0.0
    assert cubic_sparsity_schedule(100, target=0.9, end_step=100) == 0.9
    mid = cubic_sparsity_schedule(50, target=0.9, end_step=100)
    assert 0.7 < mid < 0.9  # cubic ramps fast early


def test_parse_logs_roundtrip():
    from channelestimationtransformer_tpu.utils.parse_logs import (
        final_valid_losses,
        parse_log_text,
    )

    text = (
        "Model_name:  test_model_21\n"
        "| epoch   0 |    22/  226 batches | lr 1.000000e-03 | ms/batch 13.51 "
        "| loss 0.4378  | Loss pred_len  0:  0.27 1:  0.57 2:  0.81 3:  1.15 4:  1.74\n"
        "| end of epoch   0 | time:  4.68s | valid loss 1.1031 "
        "| Loss pred len  0:  0.29 1:  0.72 2:  1.11 3:  1.46 4:  1.94\n"
    )
    parsed = parse_log_text(text)
    assert parsed["test_model_21"]["valid_loss"] == [1.1031]
    assert parsed["test_model_21"]["split"][0] == [0.29, 0.72, 1.11, 1.46, 1.94]
    assert parsed["test_model_21"]["ms_per_batch"] == [13.51]
    assert final_valid_losses(parsed) == {"test_model_21": 1.1031}
