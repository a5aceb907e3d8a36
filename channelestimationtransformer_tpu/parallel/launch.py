"""Multi-host launch helpers.

The reference scales out via SLURM job fan-out only (independent processes,
``parrallel.sbatch:10-13``); true multi-host data parallelism is designed in here:
``initialize_distributed()`` before mesh construction makes ``jax.devices()``
span the whole slice, so the same ``Trainer``/``train_step`` code runs 1-chip,
1-host, or N-host unchanged — collectives ride ICI within a slice and DCN
across hosts.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or SLURM/TPU-pod env vars.

    Returns True if multi-process mode was initialized. Safe no-op for
    single-process runs (the common case on one chip/host).
    """
    import jax

    if num_processes is None:
        num_processes = int(
            os.environ.get("SLURM_NTASKS", os.environ.get("JAX_NUM_PROCESSES", "1"))
        )
    if num_processes <= 1:
        return False
    if process_id is None:
        process_id = int(
            os.environ.get("SLURM_PROCID", os.environ.get("JAX_PROCESS_ID", "0"))
        )
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def per_host_batch(global_batch: int) -> int:
    """Split the global batch across hosts (data-parallel input pipeline)."""
    import jax

    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n
