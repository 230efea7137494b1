"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere, hence this file
manipulates os.environ at import time (pytest imports conftest first).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Force CPU via the config (not the env var): the environment's
# sitecustomize registers a tunneled TPU backend and programmatically
# sets jax_platforms, which overrides JAX_PLATFORMS — tests must not
# silently run through the device tunnel.
jax.config.update("jax_platforms", "cpu")

# Tests validate math, not kernel speed: pin matmuls to full precision
# (the platform default is reduced-precision even for tiny contractions).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(25)
