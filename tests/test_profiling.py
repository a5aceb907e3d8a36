"""Timing-harness unit tests (CPU): the amortized timer must return sane,
positive per-invocation times and preserve numerics of the timed fn."""

import jax
import jax.numpy as jnp

from channelestimationtransformer_tpu.utils.profiling import (
    time_fn,
    time_fn_amortized,
)


def test_time_fn_amortized_positive_and_scales():
    def f(x):
        return x @ x

    x = jnp.ones((64, 64))
    mean_ms, std_ms = time_fn_amortized(f, x, inner=4, warmup=1, reps=3)
    assert mean_ms > 0
    assert std_ms >= 0

    # The chained program must actually run `inner` dependent invocations:
    # a much larger inner count cannot be faster in total than a smaller one.
    total_small = time_fn_amortized(f, x, inner=2, warmup=1, reps=3)[0] * 2
    total_large = time_fn_amortized(f, x, inner=16, warmup=1, reps=3)[0] * 16
    assert total_large > total_small * 0.5  # loose: scheduling jitter on CPU


def test_time_fn_matches_interface():
    def f(x):
        return jnp.sum(x)

    mean_ms, std_ms = time_fn(f, jnp.ones((8, 8)), warmup=1, reps=2)
    assert mean_ms > 0 and std_ms >= 0
