"""Real int8 serving path (ops/quant/serving.py).

The reference only fake-quantizes (rounds weights, computes in f32,
``qtorch/quant/quant_function.py``); this path executes int8 matmuls for
real. Tests: table construction scope, numerical closeness to f32, LSQ
step-size reuse, and exactness of the int8 kernel against a hand-computed
quantized matmul.
"""

import jax
import jax.numpy as jnp
import numpy as np

from channelestimationtransformer_tpu.core.config import InformerConfig
from channelestimationtransformer_tpu.models import build_informer
from channelestimationtransformer_tpu.ops.quant.serving import (
    build_int8_table,
    int8_dense_apply,
    predict_int8,
)

CFG = dict(seq_len=24, label_len=6, pred_len=3, d_model=32, n_heads=4,
           e_layers=(2, 1), d_layers=2, d_ff=16, dropout=0.0)


def _model_and_inputs():
    cfg = InformerConfig(**CFG)
    m = build_informer(cfg)
    rng = np.random.default_rng(0)
    x_enc = jnp.asarray(rng.normal(size=(4, 24, 16)), jnp.float32)
    x_dec = jnp.asarray(rng.normal(size=(4, 9, 16)), jnp.float32)
    v = m.init(jax.random.key(0), x_enc, x_dec)
    return m, v, x_enc, x_dec


def test_int8_table_scope_excludes_embeddings_and_projection():
    m, v, x_enc, x_dec = _model_and_inputs()
    table = build_int8_table(v)
    assert table, "no layers quantized"
    for path in table:
        joined = "/".join(path)
        assert "projection" not in joined
        assert "embedding" not in joined
        assert table[path]["w_q"].dtype == jnp.int8


def test_int8_table_includes_distil_convs():
    """Reference LSQ scope quantizes the distil conv too
    (models/InformerLSQ/encoder.py:12-18) — so does serving (im2col int8)."""
    m, v, x_enc, x_dec = _model_and_inputs()
    table = build_int8_table(v)
    conv_rows = [p for p in table if "distil" in "/".join(p)]
    assert conv_rows, "distil conv not quantized"
    for p in conv_rows:
        assert table[p]["taps"] == 3
        assert table[p]["w_q"].ndim == 2  # im2col [3*C_in, C_out]


def test_int8_circular_conv_matches_f32_conv():
    from channelestimationtransformer_tpu.models.embed import circular_conv1d
    from channelestimationtransformer_tpu.ops.quant.serving import (
        _quantize_kernel,
        int8_circular_conv_apply,
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 12, 8)), jnp.float32)
    kern = jnp.asarray(rng.normal(size=(3, 8, 8)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(8,)) * 0.1, jnp.float32)
    entry = dict(_quantize_kernel(
        {"kernel": kern.reshape(24, 8), "bias": bias}, 8), taps=3)
    got = int8_circular_conv_apply(x, entry)
    ref = circular_conv1d(x, kern, bias)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_int8_serving_close_to_f32_and_actually_quantized():
    m, v, x_enc, x_dec = _model_and_inputs()
    ref = m.apply(v, x_enc, x_dec)
    got = predict_int8(m, v, x_enc, x_dec)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.1, f"int8 serving too far from f32: rel={rel}"
    # and the intercept actually replaced compute (not a silent no-op)
    assert float(jnp.max(jnp.abs(got - ref))) > 1e-6


def test_int8_weight_only_serving_close_to_f32_and_quantized():
    """Weight-only mode (int8 weights, bf16 MACs, epilogue dequant) must track
    f32 at least as closely as W8A8 — it skips activation quantization."""
    m, v, x_enc, x_dec = _model_and_inputs()
    ref = m.apply(v, x_enc, x_dec)
    got = predict_int8(m, v, x_enc, x_dec, mode="weight_only")
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.1, f"weight-only int8 serving too far from f32: rel={rel}"
    assert float(jnp.max(jnp.abs(got - ref))) > 1e-6


def test_int8_weight_only_dense_apply_matches_manual():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(5, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    w_scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    w_q = jnp.clip(jnp.round(w / w_scale), -128, 127).astype(jnp.int8)
    entry = {"w_q": w_q, "w_scale": w_scale, "bias": b}
    from channelestimationtransformer_tpu.ops.quant.serving import (
        int8_dense_weight_only_apply,
    )

    got = int8_dense_weight_only_apply(x, entry)
    manual = (
        np.asarray(x, np.float32).astype(np.float32)
        @ np.asarray(w_q, np.float32)
    ) * np.asarray(w_scale) + np.asarray(b)
    # bf16 MACs: compare loosely to the exact int-weight matmul, tightly to f32
    np.testing.assert_allclose(np.asarray(got), manual, rtol=2e-2, atol=2e-2)
    exact = np.asarray(x @ w + b)
    rel = np.linalg.norm(np.asarray(got) - exact) / np.linalg.norm(exact)
    assert rel < 0.05


def test_int8_dense_apply_matches_manual_quantized_matmul():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(5, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
    w_scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    w_q = jnp.clip(jnp.round(w / w_scale), -128, 127).astype(jnp.int8)
    entry = {"w_q": w_q, "w_scale": w_scale, "bias": b}
    got = int8_dense_apply(x, entry)

    a_scale = float(jnp.max(jnp.abs(x))) / 127.0
    x_q = np.clip(np.round(np.asarray(x) / a_scale), -127, 127)
    manual = (x_q @ np.asarray(w_q, np.int32)) * (a_scale * np.asarray(w_scale)) + np.asarray(b)
    np.testing.assert_allclose(np.asarray(got), manual, rtol=1e-5, atol=1e-5)
    # int8 matmul of a well-scaled layer stays within a few percent of f32
    exact = np.asarray(x @ w + b)
    rel = np.linalg.norm(np.asarray(got) - exact) / np.linalg.norm(exact)
    assert rel < 0.05


def test_int8_table_uses_lsq_step_size():
    from channelestimationtransformer_tpu.ops.quant.serving import _quantize_kernel

    rng = np.random.default_rng(2)
    kernel = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    step = jnp.asarray(0.05, jnp.float32)
    entry = _quantize_kernel({"kernel": kernel, "step_size": step}, nbits=8)
    np.testing.assert_allclose(np.asarray(entry["w_scale"]), 0.05)
    expect = np.clip(np.round(np.asarray(kernel) / 0.05), -128, 127)
    np.testing.assert_array_equal(np.asarray(entry["w_q"], np.int32), expect)


def test_rate_report_entropy_bounds():
    """estimateRate(WIP) completed: entropy <= fixed bits, sane totals."""
    from channelestimationtransformer_tpu.ops.quant.rate import (
        model_rate_report,
        symbol_entropy_bits,
    )

    # entropy sanity: uniform over 2^k symbols -> exactly k bits
    sym = np.arange(16).repeat(10)
    assert abs(symbol_entropy_bits(sym) - 4.0) < 1e-9
    assert symbol_entropy_bits(np.zeros(100)) == 0.0

    m, v, x_enc, x_dec = _model_and_inputs()
    report = model_rate_report(v, nbits=8)
    assert "_total" in report
    tot = report["_total"]
    assert 0 < tot["entropy_bits_per_weight"] <= 8.0
    assert tot["compression_entropy"] >= tot["compression_fixed"] == 4.0
    # per-layer rows cover the same scope as serving
    from channelestimationtransformer_tpu.ops.quant.serving import (
        build_int8_table,
    )
    assert len(report) - 1 == len(build_int8_table(v, nbits=8))
