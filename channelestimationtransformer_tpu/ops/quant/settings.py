"""Builders for the per-parameter weight-quantization settings dicts.

Reference: the hand-written 66-entry settings dicts covering every attention
projection and FFN conv in both encoder stacks + 3 decoder layers
(``QuantizationStudy/PostTrainingQuantization/PostTrainingQuantization.py:153-247``,
``…QuantizationAwareTraining/QuantizationAwareTraining.py:409-503``). Here the
same selection is derived from the params tree by pattern, so it tracks any
model geometry instead of being hand-copied per experiment.
"""

from __future__ import annotations

from typing import Callable, Dict, List

import jax

from .optim import WeightQuantSettings, flatten_path

# The quantized tensor families in the reference settings dicts: attention
# q/k/v/out projection kernels and the two FFN convs (encoder + decoder), plus
# the distil convs in the QAT variants. Embedding/projection stay FP32.
QUANT_KERNEL_MARKERS = (
    "attention/query/kernel",
    "attention/key/kernel",
    "attention/value/kernel",
    "attention/out/kernel",
    "ffn/conv1/kernel",
    "ffn/conv2/kernel",
)


def quantized_param_names(params, markers=QUANT_KERNEL_MARKERS) -> List[str]:
    """All parameter paths whose suffix matches a quantized family."""
    names: List[str] = []

    def visit(path, _):
        name = flatten_path(path)
        # endswith also catches self_attention/cross_attention variants.
        if any(name.endswith(m) for m in markers):
            names.append(name)

    jax.tree_util.tree_map_with_path(visit, params)
    return sorted(set(names))


def build_weight_quant_settings(
    params, quant_fn: Callable, markers=QUANT_KERNEL_MARKERS
) -> WeightQuantSettings:
    """``WeightQuantSettings`` applying ``quant_fn(w, percentage, key)`` to
    every matched tensor."""
    settings: Dict[str, Callable] = {
        name: quant_fn for name in quantized_param_names(params, markers)
    }
    if not settings:
        raise ValueError("no parameters matched the quantization markers")
    return WeightQuantSettings(settings, params)
