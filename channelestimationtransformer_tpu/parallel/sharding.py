"""Parameter sharding rules for tensor parallelism.

Simple, shape-driven rules (the models are small; TP matters only for the
large-``d_model`` sweep configs, SURVEY §2.7): Dense kernels shard their output
features over the ``model`` axis when divisible; everything else replicates.
GSPMD propagates the shardings through the jitted step and inserts the
all-reduces on the ``model`` axis.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def infer_param_spec(path: tuple, value, model_size: int) -> P:
    """Partition spec for one parameter leaf."""
    if model_size <= 1 or value.ndim == 0:
        return P()
    # Dense kernels [in, out] / conv kernels [k, in, out]: shard the output
    # features (column parallel) when they divide evenly.
    if value.ndim >= 2 and value.shape[-1] % model_size == 0 and value.shape[-1] >= 2 * model_size:
        return P(*([None] * (value.ndim - 1)), "model")
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a params pytree."""
    model_size = mesh.shape.get("model", 1)

    def leaf(path, value):
        return NamedSharding(mesh, infer_param_spec(path, value, model_size))

    return jax.tree_util.tree_map_with_path(leaf, params)


def shard_params(params, mesh: Mesh):
    return jax.device_put(params, param_shardings(params, mesh))
