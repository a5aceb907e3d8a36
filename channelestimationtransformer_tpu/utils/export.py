"""Weight export + dynamic-range analysis.

Reference: ``Utils/exportWeights.py:55-78`` (dump every state-dict tensor to
JSON for hardware export) and
``PaperFigures/WeigthDynamicRange/dynamicRangeMeasurement.py:17-60``
(min/max/mean-|w| table from those dumps).
"""

from __future__ import annotations

import json
from typing import Dict

import jax
import numpy as np

from ..ops.quant.optim import flatten_path


def _named_leaves(params) -> Dict[str, np.ndarray]:
    out = {}
    jax.tree_util.tree_map_with_path(
        lambda path, v: out.__setitem__(flatten_path(path), np.asarray(v)), params
    )
    return out


def export_weights_json(params, path: str) -> None:
    """Dump every parameter tensor to JSON (name -> nested list), the
    reference's HW-export interchange format."""
    data = {k: v.tolist() for k, v in _named_leaves(params).items()}
    with open(path, "w") as f:
        json.dump(data, f)


def export_hlo(fn, *example_args, path: str) -> str:
    """Dump the lowered StableHLO text of ``fn(*example_args)`` — the
    graph-export analogue of the reference's torchviz/ONNX artifacts
    (``FullPrecision/VizualizeNetwork.py:9``, ``informer_model.onnx``)."""
    import jax

    lowered = jax.jit(fn).lower(*example_args)
    text = lowered.as_text()
    with open(path, "w") as f:
        f.write(text)
    return path


def weight_dynamic_range(params) -> Dict[str, Dict[str, float]]:
    """Per-tensor dynamic range report: min / max / mean(|w|) / required
    integer bits (reference ``dynamicRangeMeasurement.py:17-60``)."""
    report = {}
    for name, w in _named_leaves(params).items():
        amax = float(np.max(np.abs(w))) if w.size else 0.0
        report[name] = {
            "min": float(w.min()) if w.size else 0.0,
            "max": float(w.max()) if w.size else 0.0,
            "mean_abs": float(np.mean(np.abs(w))) if w.size else 0.0,
            "int_bits": int(np.ceil(np.log2(amax + 1e-12))) + 1 if amax > 0 else 0,
        }
    return report
