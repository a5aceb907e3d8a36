"""Real int8 inference serving — past fake quantization.

The reference's whole quantization study (PTQ/QAT/LSQ, SURVEY §2.2) motivates
efficient inference but only ever *simulates* quantization: weights are
rounded and immediately rematerialized as float32 for cuBLAS
(``qtorch/quant/quant_function.py``, ``models/InformerLSQ/LSQ.py:65-74``).
This module executes the quantized network for real on the TPU MXU, in two
modes:

- **W8A8**: weights stored as int8 (per-output-channel symmetric scales, or
  the trained LSQ ``step_size`` when the checkpoint carries one), activations
  dynamically quantized per tensor (symmetric abs-max), matmuls as
  int8 x int8 -> int32 ``lax.dot_general``. The int8 MAC-rate gain is eaten
  by the per-call activation quant at the model sizes measured
  (``experiments/artifacts/int8_scale_ab.json``) — use it for int-exactness
  experiments, not latency.
- **weight_only**: int8 weights (4x smaller than f32 in HBM), bf16
  activations and MACs, per-channel dequant folded into the matmul epilogue
  — zero per-activation overhead; the serving-latency configuration.

Following the reference's quantization scope, only the attention projections
and FFN layers are quantized (token embedding and the final projection stay
float, ``QuantizationStudy/LSQ/TrainInformerLSQ.py:190-201``).

Usage::

    table = build_int8_table(variables)
    with serving_intercept(table):
        pred = model.apply(variables, x_enc, x_dec)   # int8 MXU matmuls
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .lsq import DenseLSQ

PathKey = Tuple[str, ...]

# Module path names never quantized (reference scope: embeddings + final
# projection stay FP32).
DEFAULT_EXCLUDE = ("projection", "enc_embedding", "dec_embedding")


def _quantize_kernel(sub: dict, nbits: int):
    """int8 weights + f32 scale for one Dense subtree (uses the trained LSQ
    step_size when present, else per-output-channel abs-max)."""
    kernel = jnp.asarray(sub["kernel"])
    qp = 2 ** (nbits - 1) - 1
    qn = -(2 ** (nbits - 1))
    if "step_size" in sub:
        scale = jnp.maximum(jnp.abs(jnp.asarray(sub["step_size"])), 1e-12)
    else:
        scale = jnp.maximum(
            jnp.max(jnp.abs(kernel), axis=0) / qp, 1e-12
        )  # [N] per out-channel
    w_q = jnp.clip(jnp.round(kernel / scale), qn, qp).astype(jnp.int8)
    return {
        "w_q": w_q,
        "w_scale": jnp.asarray(scale, jnp.float32),
        "bias": jnp.asarray(sub["bias"], jnp.float32) if "bias" in sub else None,
    }


def build_int8_table(
    variables: dict,
    *,
    nbits: int = 8,
    exclude: Tuple[str, ...] = DEFAULT_EXCLUDE,
) -> Dict[PathKey, dict]:
    """Walk ``variables['params']`` and quantize every eligible kernel:
    2-D Dense kernels (attention q/k/v/out projections + FFN layers) and the
    3-tap distil conv kernels (reference LSQ scope includes the distil
    ``Conv1dLSQ``, ``models/InformerLSQ/encoder.py:12-18``), the latter as
    im2col [3*C_in, C_out] matrices."""
    table: Dict[PathKey, dict] = {}

    def walk(tree: dict, path: PathKey):
        kern = tree.get("kernel")
        nd = getattr(kern, "ndim", 0)
        if nd == 2:
            if not any(p in exclude for p in path):
                table[path] = _quantize_kernel(tree, nbits)
            return
        if nd == 3 and not any(p in exclude for p in path):
            k, c_in, c_out = kern.shape
            flat = dict(tree, kernel=jnp.asarray(kern).reshape(k * c_in, c_out))
            table[path] = dict(_quantize_kernel(flat, nbits), taps=k)
            return
        for name, sub in tree.items():
            if isinstance(sub, dict):
                walk(sub, path + (name,))

    walk(dict(variables["params"]), ())
    return table


def int8_dense_apply(x: jnp.ndarray, entry: dict) -> jnp.ndarray:
    """W8A8 dynamic-quantized dense: int8 x int8 -> int32 on the MXU, one
    fused f32 rescale out."""
    out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    a_scale = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-12)
    x_q = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, entry["w_q"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (a_scale * entry["w_scale"])
    if entry["bias"] is not None:
        y = y + entry["bias"]
    return y.astype(out_dtype)


def int8_dense_weight_only_apply(x: jnp.ndarray, entry: dict) -> jnp.ndarray:
    """Weight-only int8 dense: int8 weights stream from HBM (half the bf16
    bytes), activations stay bf16, MACs run bf16 on the MXU.

    The W8A8 path's dynamic activation quantization (abs-max reduce + round +
    clip per call) costs more than the int8 MAC-rate gain at these shapes
    (``int8_scale_ab.json``, r4: 0.83-0.90x vs f32). Here dequantization is
    algebraically *free*: with per-output-channel scales,
    ``x @ (w_q * s) == (x @ w_q) * s``, so the kernel is one int8->bf16
    convert fused into the matmul's weight read plus one epilogue rescale —
    no per-activation work at all.
    """
    out_dtype = x.dtype
    mac_dtype = jnp.bfloat16
    y = jax.lax.dot_general(
        x.astype(mac_dtype), entry["w_q"].astype(mac_dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = y * entry["w_scale"]
    if entry["bias"] is not None:
        y = y + entry["bias"]
    return y.astype(out_dtype)


def int8_circular_conv_apply(
    x: jnp.ndarray, entry: dict, *, weight_only: bool = False
) -> jnp.ndarray:
    """Circular k-tap conv as an im2col int8 matmul (taps gathered by
    circular roll; tap order matches ``models/embed.circular_conv1d``:
    tap t sees x[l + t - k//2])."""
    k = entry["taps"]
    pad = k // 2
    cols = [jnp.roll(x, pad - t, axis=1) for t in range(k)]
    apply = int8_dense_weight_only_apply if weight_only else int8_dense_apply
    return apply(jnp.concatenate(cols, axis=-1), entry)


def _int8_conv_layer(
    module, x: jnp.ndarray, entry: dict, *, weight_only: bool = False
) -> jnp.ndarray:
    """Serve a distil ``ConvLayer`` (models/encoder.py): int8 circular conv,
    then the layer's own BatchNorm (inference stats) / ELU / maxpool."""
    var = module.variables
    y = int8_circular_conv_apply(x, entry, weight_only=weight_only)
    bn_p = var["params"]["norm"]
    bn_s = var["batch_stats"]["norm"]
    inv = jax.lax.rsqrt(bn_s["var"] + 1e-5)
    y = (y - bn_s["mean"]) * inv * bn_p["scale"] + bn_p["bias"]
    y = nn.elu(y)
    return nn.max_pool(y, window_shape=(3,), strides=(2,), padding=((1, 1),))


def serving_intercept(
    table: Dict[PathKey, dict],
    hits: Optional[set] = None,
    *,
    mode: str = "w8a8",
):
    """Context manager: inside, every ``nn.Dense``/``DenseLSQ`` (and distil
    ``ConvLayer``) whose module path is in ``table`` executes as a real int8
    matmul.

    ``mode``: ``"w8a8"`` (dynamic activation quant, int8xint8 MACs) or
    ``"weight_only"`` (int8 weights, bf16 activations/MACs — the measured-win
    serving config; see :func:`int8_dense_weight_only_apply`).

    ``hits`` (optional): a set the interceptor adds each served module path
    to, so callers can verify the table actually matched (a Flax API change
    that breaks ``Module.path`` would otherwise silently serve f32).
    """
    from ...models.encoder import ConvLayer

    if mode not in ("w8a8", "weight_only"):
        raise ValueError(f"unknown serving mode {mode!r}")
    weight_only = mode == "weight_only"
    dense_apply = int8_dense_weight_only_apply if weight_only else int8_dense_apply

    def interceptor(next_fn, args, kwargs, context):
        if context.method_name != "__call__":
            return next_fn(*args, **kwargs)
        path = tuple(getattr(context.module, "path", ()) or ())
        entry = table.get(path)
        if entry is not None:
            if isinstance(context.module, (nn.Dense, DenseLSQ)):
                if hits is not None:
                    hits.add(path)
                return dense_apply(args[0], entry)
            if isinstance(context.module, ConvLayer):
                if hits is not None:
                    hits.add(path)
                return _int8_conv_layer(
                    context.module, args[0], entry, weight_only=weight_only
                )
        return next_fn(*args, **kwargs)

    return nn.intercept_methods(interceptor)


def predict_int8(
    model,
    variables: dict,
    *args,
    nbits: int = 8,
    table: Optional[Dict[PathKey, dict]] = None,
    mode: str = "w8a8",
    **kwargs,
):
    """Forward pass with all eligible dense layers served in int8.

    Raises ``RuntimeError`` if the intercept matched *no* table entry (the
    whole model silently running f32), and warns when only a subset matched.
    """
    table = table if table is not None else build_int8_table(variables, nbits=nbits)
    hits: set = set()
    with serving_intercept(table, hits=hits, mode=mode):
        out = model.apply(variables, *args, **kwargs)
    if table and not hits:
        raise RuntimeError(
            "predict_int8: int8 table matched no module path — the model ran "
            "entirely in f32 (Flax Module.path unavailable or paths renamed)"
        )
    if len(hits) < len(table):
        import warnings

        warnings.warn(
            f"predict_int8: only {len(hits)}/{len(table)} int8 table entries "
            "were exercised by this forward pass",
            stacklevel=2,
        )
    return out
