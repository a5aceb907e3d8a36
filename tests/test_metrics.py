"""Golden tests for NMSE metrics vs a plain-NumPy oracle.

Checks the exact reference semantics (reference ``Utils/metrics.py``), including
the per-horizon variant's prediction-power normalization quirk (SURVEY §7.4 q4).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from channelestimationtransformer_tpu.core.metrics import nmse, nmse_db, nmse_split


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_nmse_matches_numpy_oracle(rng):
    x = rng.normal(size=(4, 5, 16)).astype(np.float32)
    x_hat = x + 0.1 * rng.normal(size=x.shape).astype(np.float32)
    expected = np.sum((x - x_hat) ** 2) / np.sum(x**2)
    got = nmse(jnp.asarray(x_hat), jnp.asarray(x))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_nmse_zero_for_perfect_prediction(rng):
    x = rng.normal(size=(2, 5, 8)).astype(np.float32)
    assert float(nmse(jnp.asarray(x), jnp.asarray(x))) == 0.0


def test_nmse_split_normalizes_by_prediction_power(rng):
    # The reference's NMSE_Split_cuda divides by sum(x_hat^2), NOT sum(x^2).
    x = rng.normal(size=(4, 5, 16)).astype(np.float32)
    x_hat = 2.0 * x  # prediction power = 4x target power
    got = np.asarray(nmse_split(jnp.asarray(x_hat), jnp.asarray(x)))
    expected = np.sum((x - x_hat) ** 2, axis=(0, 2)) / np.sum(x_hat**2, axis=(0, 2))
    np.testing.assert_allclose(got, expected, rtol=1e-5)
    assert got.shape == (5,)


def test_nmse_db():
    np.testing.assert_allclose(float(nmse_db(0.01)), -20.0, atol=1e-3)
