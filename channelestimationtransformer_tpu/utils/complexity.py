"""Model complexity analysis: parameters + MACs.

Reference: ``ComparisonLSTMvsRNNvsGRUvsTransformer/complexityAnalysis.py:73-127``
(ptflops with custom input constructors, aten backend for the transformers).

Two methods here:
- :func:`count_params` — exact, from the params pytree.
- :func:`estimate_macs` — XLA's own FLOP accounting via
  ``jit(...).lower(...).compile().cost_analysis()`` (MACs = FLOPs/2), which
  reflects the *compiled* program rather than a per-module estimate.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def estimate_macs(fn, *example_args) -> Optional[float]:
    """MACs for one call of ``fn(*example_args)`` from XLA cost analysis.

    Returns None when the backend does not expose cost analysis.

    Caveat (verified on both XLA:CPU and the TPU backend): cost_analysis
    counts a ``lax.scan``/while-loop body ONCE, ignoring the trip count.
    For models that scan over time (the recurrent predictors), the returned
    count covers a single timestep — use ``model_complexity``'s
    ``sequential_steps`` to scale it to the full sequence.
    """
    try:
        compiled = jax.jit(fn).lower(*example_args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns a list per computation
            cost = cost[0]
        flops = cost.get("flops") if cost else None
        return flops / 2.0 if flops else None
    except Exception:
        return None


def model_complexity(
    model, variables, *example_inputs, sequential_steps: int = 1
) -> dict:
    """Params + MACs report for a model's apply fn (the complexityAnalysis
    equivalent; per-sample MACs = total / batch).

    ``sequential_steps``: trip count of the model's internal time scan, by
    which the scan-body-once cost_analysis count is multiplied (see
    :func:`estimate_macs`; 1 for feed-forward models, ``T-1`` for the
    teacher-forced recurrent predictors). The reference's ptflops numbers
    count the full unrolled sequence (``complexityAnalysis.py:73-127``).
    """
    batch = example_inputs[0].shape[0]
    macs = estimate_macs(
        lambda v, *a: model.apply(v, *a), variables, *example_inputs
    )
    if macs:
        macs *= sequential_steps
    return {
        "params": count_params(variables.get("params", variables)),
        "macs_total": macs,
        "macs_per_sample": macs / batch if macs else None,
    }
