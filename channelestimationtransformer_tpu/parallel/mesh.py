"""Device-mesh construction and sharding rules.

The reference has no distributed support at all (single GPU + SLURM job
fan-out, SURVEY §2.7); here parallelism is a first-class subsystem:

- ``data`` axis: batch (data-parallel) sharding — gradients are reduced by
  XLA-inserted ``psum`` when the jitted train step sees a batch-sharded input
  and replicated params.
- ``model`` axis: reserved for tensor-parallel sharding of ``d_model``/heads
  on large-model sweeps.
- ``seq``  axis: reserved for sequence sharding (ring attention; the
  ``ops.pallas`` ring kernels ride this axis).

Multi-host: ``jax.distributed.initialize()`` is called by the launcher before
mesh construction; ``make_mesh`` spans all global devices so ICI carries the
collectives inside a slice and DCN only sees inter-host edges.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "model", "seq")


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    seq: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model, seq)`` mesh over the given (default: all) devices.

    ``data=None`` absorbs all remaining devices into the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % (model * seq) != 0:
            raise ValueError(f"{n} devices not divisible by model*seq={model * seq}")
        data = n // (model * seq)
    if data * model * seq != n:
        raise ValueError(f"mesh {data}x{model}x{seq} != {n} devices")
    arr = np.asarray(devices).reshape(data, model, seq)
    return Mesh(arr, AXES)


def ensure_virtual_devices(n_devices: int) -> None:
    """Guarantee >= n_devices JAX devices, falling back to a virtual CPU mesh.

    Hardware plugins (the axon tunnel) pin themselves regardless of
    ``JAX_PLATFORMS``, and ``XLA_FLAGS`` is parsed once per process at first
    client creation — so after a 1-chip backend initialized, the only reliable
    route to an N-device mesh is: switch ``jax_platforms`` to cpu, drop the
    live backend set (``clear_backends`` also clears the cached
    ``get_backend``), then set ``jax_num_cpu_devices`` while no backend is
    initialized. Used by multi-chip dry runs and the scaling harness when run
    without a pod."""
    if jax.local_device_count() >= n_devices:
        return
    platform = jax.devices()[0].platform if jax.local_device_count() else "none"
    if platform not in ("cpu", "none"):
        import warnings

        warnings.warn(
            f"ensure_virtual_devices: replacing live {platform} backend "
            f"({jax.local_device_count()} device(s)) with {n_devices} virtual "
            "CPU devices; arrays created on the old backend become invalid "
            "and all subsequent compute runs on CPU",
            stacklevel=2,
        )
    jax.config.update("jax_platforms", "cpu")
    try:
        from jax.extend.backend import clear_backends
    except ImportError:  # older jax layout
        from jax.lib.xla_bridge import clear_backends  # type: ignore
    clear_backends()
    jax.config.update("jax_num_cpu_devices", n_devices)
    if jax.local_device_count() < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {jax.local_device_count()}"
        )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the ``data`` axis."""
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())
