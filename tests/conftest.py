"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4 test plan). Must be set
before JAX initializes a backend, hence the top-of-conftest placement.
"""

import os

# The env may pin JAX_PLATFORMS to a hardware plugin; the config.update below is
# what reliably forces CPU, but both are set for good measure.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
