"""Low-precision optimizer wrapper — the ``OptimLP`` equivalent.

Reference: ``FullPrecision/qtorch/optim/optim_low.py:7-167``: wraps SGD/Adam,
optionally quantizing gradients before the step and momenta/accumulators after,
and applies a **per-parameter weight quantization after each step** driven by a
``{param_name: {"weight_quant": fn}}`` settings dict; ``step(percentage=...)``
threads the progressive-quantization fraction into the weight-quant fns.

Here the same contract is expressed functionally:

- :func:`quantize_grads` — an optax transform quantizing updates (gradient
  quantization, reference ``optim_low.py:96-104``),
- :class:`WeightQuantSettings` — path->fn mapping validated against the params
  tree like OptimLP validates against ``named_parameters``
  (``optim_low.py:57-73``),
- :func:`apply_weight_quant` — the post-step weight transform, called with the
  current progressive fraction + RNG key (``optim_low.py:109-127``).

The partial-quantization threshold runs fully on device (no host sort —
SURVEY §7.4 quirk 7).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import optax


def quantize_grads(quant_fn: Callable) -> optax.GradientTransformation:
    """Quantize raw gradients before the inner optimizer sees them."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree.map(quant_fn, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def flatten_path(path) -> str:
    """'encoder/layer_0/attention/query/kernel'-style name for a tree path."""
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


class WeightQuantSettings:
    """Per-parameter weight-quant functions, validated against the params tree.

    ``settings`` maps a parameter path string (as produced by
    :func:`flatten_path`) to ``fn(w, percentage, key) -> w``. Like OptimLP,
    unknown names raise immediately (reference ``optim_low.py:57-73``).
    """

    def __init__(self, settings: Dict[str, Callable], params):
        valid = set()
        jax.tree_util.tree_map_with_path(
            lambda path, _: valid.add(flatten_path(path)), params
        )
        unknown = set(settings) - valid
        if unknown:
            raise ValueError(
                f"weight_quant settings reference unknown parameters: {sorted(unknown)}"
            )
        self.settings = dict(settings)

    def __contains__(self, name):
        return name in self.settings

    def __len__(self):
        return len(self.settings)


def apply_weight_quant(
    params,
    settings: WeightQuantSettings,
    *,
    percentage: float = 1.0,
    key: Optional[jax.Array] = None,
):
    """Post-step weight transform: ``param = fn(param, percentage, key)`` for
    every configured parameter (reference ``optim_low.py:109-127``)."""
    if key is None:
        key = jax.random.key(0)

    def leaf(path, w):
        name = flatten_path(path)
        fn = settings.settings.get(name)
        if fn is None:
            return w
        return fn(w, percentage, jax.random.fold_in(key, hash(name) & 0x7FFFFFFF))

    return jax.tree_util.tree_map_with_path(leaf, params)
