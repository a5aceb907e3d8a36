"""Profiling helpers: traces, step timing, throughput.

Reference equivalents: CUDA-event latency harness
(``TimingAnalysis/TrainInformer.py:97-147``), per-step ``ms/batch`` logging,
``torchviz``/ONNX graph export. TPU-native: ``jax.profiler`` traces (viewable
in TensorBoard/XProf), ``block_until_ready`` walls, and samples/s/chip.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _force(out):
    """Reliable execution barrier: fetch a scalar reduction of the output.

    On the axon tunnel runtime ``jax.block_until_ready`` can return before
    the dispatched program actually executes (observed 50-150x inflated
    throughput); materializing a value on the host is the only trustworthy
    sync. The reduction is a tiny device op + a scalar fetch, so the timing
    overhead is one tunnel RTT — identical per rep, subtract-out-able."""
    leaf = jax.tree.leaves(out)[0]
    import jax.numpy as jnp

    return float(jnp.sum(jnp.asarray(leaf).ravel()[:1]))


def time_fn(fn: Callable, *args, warmup: int = 20, reps: int = 100):
    """Mean/std wall ms of ``fn(*args)`` with device sync (the reference's
    CUDA-event harness semantics)."""
    for _ in range(warmup):
        _force(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        times.append((time.perf_counter() - t0) * 1000)
    return float(np.mean(times)), float(np.std(times))


def time_fn_amortized(
    fn: Callable, *args, inner: int = 20, warmup: int = 3, reps: int = 10
):
    """Mean/std wall ms of ONE ``fn(*args)`` invocation, measured by chaining
    ``inner`` data-dependent invocations inside a single compiled program.

    ``time_fn`` pays one tunnel dispatch RTT (~45 ms on the axon runtime) per
    rep — it measures end-to-end dispatch latency, which swamps sub-10 ms
    kernels (the failure mode the round-1 ``runtime.json`` exhibited:
    seq_len=75 "faster" than seq_len=25, std > mean). Here each scan
    iteration's carry (the first argument) is perturbed by a negligible
    scalar derived from the previous output, so XLA can neither batch nor CSE
    the invocations; the whole chain is timed through the value-fetch barrier
    and divided by ``inner`` — on-device latency, dispatch amortized away.

    The first argument must be an array (or pytree of arrays) whose shape the
    chain can carry; remaining args are closed over.
    """
    import jax.numpy as jnp

    def chained(x0, *rest):
        def body(carry, _):
            out = fn(carry, *rest)
            dep = jnp.sum(jax.tree.leaves(out)[0].ravel()[:1]) * 1e-30
            new = jax.tree.map(lambda a: a + dep.astype(a.dtype), carry)
            return new, None

        final, _ = jax.lax.scan(body, x0, None, length=inner)
        return final

    run = jax.jit(chained)
    for _ in range(warmup):
        _force(run(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(run(*args))
        times.append((time.perf_counter() - t0) * 1000 / inner)
    return float(np.mean(times)), float(np.std(times))


def throughput(fn: Callable, *args, batch: int, warmup: int = 5, reps: int = 50):
    """samples/s/chip for a batched step fn."""
    mean_ms, _ = time_fn(fn, *args, warmup=warmup, reps=reps)
    per_chip = batch / (mean_ms / 1000)
    return per_chip / max(jax.device_count(), 1)


def device_memory_stats() -> Optional[dict]:
    """Live/peak HBM bytes when the backend exposes them."""
    try:
        stats = jax.devices()[0].memory_stats()
        return {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
    except Exception:
        return None
