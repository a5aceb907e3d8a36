"""Runtime setup shared by all experiment drivers."""

from __future__ import annotations

import os


def setup(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache (compiles through the TPU
    tunnel cost minutes; caching makes re-runs and sweeps start instantly)
    and other runtime defaults. Safe no-op if the backend can't serialize."""
    import jax

    # The axon TPU plugin pins itself regardless of JAX_PLATFORMS; apply the
    # env request through jax.config, which does take effect. Lets any driver
    # be forced onto CPU (JAX_PLATFORMS=cpu) without touching the TPU tunnel.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    # Optional PRNG implementation override (CETPU_PRNG=rbg|unsafe_rbg|
    # threefry2x32). The fused train step draws tens of millions of randoms
    # per step (window sampling, AWGN, every dropout mask); threefry is a
    # ~20-round ALU ladder while rbg rides the TPU's hardware-accelerated
    # generator. Counter-based determinism per key is preserved either way —
    # only the stream values differ, so checkpoints/parity runs should pin
    # one impl (the default stays threefry for cross-backend reproducibility).
    prng = os.environ.get("CETPU_PRNG")
    if prng:
        try:
            jax.config.update("jax_default_prng_impl", prng)
        except Exception:
            pass

    try:
        cache = cache_dir or os.environ.get(
            "CET_JAX_CACHE", os.path.join(os.path.dirname(__file__), "../../.jax_cache")
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
