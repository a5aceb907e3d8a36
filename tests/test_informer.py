"""Shape/behavior tests for the Informer model family."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from channelestimationtransformer_tpu.core.config import InformerConfig
from channelestimationtransformer_tpu.models import build_informer
from channelestimationtransformer_tpu.models.encoder import (
    distilled_length,
    encoder_stack_output_length,
)


def _make(cfg, batch=2):
    model = build_informer(cfg)
    x_enc = jnp.ones((batch, cfg.seq_len, cfg.enc_in))
    x_dec = jnp.ones((batch, cfg.label_len + cfg.pred_len, cfg.dec_in))
    variables = model.init(jax.random.key(0), x_enc, x_dec)
    return model, variables, x_enc, x_dec


@pytest.mark.parametrize("attn", ["full", "prob"])
def test_informer_stack_output_shape(attn):
    cfg = InformerConfig(
        seq_len=48, label_len=10, pred_len=5, d_model=32, n_heads=4,
        e_layers=(2, 1), d_layers=2, d_ff=16, attn=attn,
    )
    model, variables, x_enc, x_dec = _make(cfg)
    out = model.apply(variables, x_enc, x_dec)
    assert out.shape == (2, 5, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_single_encoder_informer():
    cfg = InformerConfig(
        seq_len=32, label_len=8, pred_len=5, d_model=32, n_heads=4,
        e_layers=(3,), d_layers=1, d_ff=16,
    )
    model, variables, x_enc, x_dec = _make(cfg)
    out = model.apply(variables, x_enc, x_dec)
    assert out.shape == (2, 5, 16)


def test_distil_reduces_cross_length():
    # encoder_stack_output_length mirrors the reference geometry:
    # seq 90, e_layers [4,3], distil -> 90->45->23->12 and 45->23->12, total 24.
    assert distilled_length(90) == 45
    assert distilled_length(45) == 23
    assert distilled_length(23) == 12
    assert encoder_stack_output_length(90, (4, 3), True) == 24
    assert encoder_stack_output_length(90, (4, 3), False) == 135


def test_dropout_changes_train_outputs():
    cfg = InformerConfig(
        seq_len=32, label_len=8, pred_len=5, d_model=32, n_heads=4,
        e_layers=(2,), d_layers=1, d_ff=16, dropout=0.5,
    )
    model, variables, x_enc, x_dec = _make(cfg)
    out1, _ = model.apply(
        variables, x_enc, x_dec, deterministic=False,
        rngs={"dropout": jax.random.key(1)},
        mutable=["batch_stats"],
    )
    out2, _ = model.apply(
        variables, x_enc, x_dec, deterministic=False,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_informer_is_jittable_no_recompile():
    cfg = InformerConfig(
        seq_len=32, label_len=8, pred_len=5, d_model=32, n_heads=4,
        e_layers=(2, 1), d_layers=1, d_ff=16, attn="prob",
    )
    model, variables, x_enc, x_dec = _make(cfg)
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b))
    out1 = fwd(variables, x_enc, x_dec)
    out2 = fwd(variables, x_enc * 2, x_dec)
    assert out1.shape == out2.shape == (2, 5, 16)


def test_pre_norm_variant():
    """pre_norm=True builds a different (pre-LN) program with the same output
    contract; params differ in norm placement but shapes/loss path hold."""
    cfg = InformerConfig(
        seq_len=32, label_len=8, pred_len=5, d_model=32, n_heads=4,
        e_layers=(2, 1), d_layers=2, d_ff=16, pre_norm=True,
    )
    model, variables, x_enc, x_dec = _make(cfg)
    out = model.apply(variables, x_enc, x_dec)
    assert out.shape == (2, 5, 16)
    assert np.isfinite(np.asarray(out)).all()
    # post-norm variant must produce a different function
    cfg2 = dataclasses.replace(cfg, pre_norm=False)
    model2, variables2, _, _ = _make(cfg2)
    out2 = model2.apply(variables2, x_enc, x_dec)
    assert out.shape == out2.shape


def test_fused_qkv_matches_separate_projections():
    """fuse_qkv=True computes the identical function: transplanting the
    three per-projection kernels into the fused qkv/kv layout reproduces
    the unfused model's output exactly (one matmul vs three is the only
    difference — DESIGN.md §8 latency-regime fusion)."""
    cfg = InformerConfig(
        seq_len=48, label_len=8, pred_len=4, d_model=32, n_heads=4,
        e_layers=(2,), d_layers=2, d_ff=16, dropout=0.0,
    )
    model, variables, x_enc, x_dec = _make(cfg)
    fcfg = dataclasses.replace(cfg, fuse_qkv=True)
    fmodel = build_informer(fcfg)
    fvars = fmodel.init(jax.random.key(1), x_enc, x_dec)

    def transplant(ref, fused):
        out = {}
        for k, v in fused.items():
            if k == "qkv":
                out[k] = {
                    "kernel": jnp.concatenate(
                        [ref[n]["kernel"] for n in ("query", "key", "value")],
                        axis=1,
                    ),
                    "bias": jnp.concatenate(
                        [ref[n]["bias"] for n in ("query", "key", "value")]
                    ),
                }
            elif k == "kv":
                out[k] = {
                    "kernel": jnp.concatenate(
                        [ref[n]["kernel"] for n in ("key", "value")], axis=1
                    ),
                    "bias": jnp.concatenate(
                        [ref[n]["bias"] for n in ("key", "value")]
                    ),
                }
            elif isinstance(v, dict):
                out[k] = transplant(ref[k], v)
            else:
                out[k] = ref[k]
        return out

    fvars = {
        "params": transplant(variables["params"], fvars["params"]),
        "batch_stats": variables["batch_stats"],
    }
    ref_out = model.apply(variables, x_enc, x_dec)
    fused_out = fmodel.apply(fvars, x_enc, x_dec)
    np.testing.assert_allclose(
        np.asarray(fused_out), np.asarray(ref_out), atol=2e-5, rtol=2e-5
    )
