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

# Subprocesses spawned by tests (the parity script, the 2-process
# distributed test) inherit os.environ — the box exports
# JAX_PLATFORMS=axon (the tunneled TPU), so without this override a
# child process rides the tunnel and hangs the suite whenever the
# tunnel is down (observed: test_run_reference_parity_script timing
# out at 1200 s against a dead tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Force CPU via the config too (not just the env var): the
# environment's sitecustomize registers the tunneled TPU backend and
# programmatically sets jax_platforms, which overrides JAX_PLATFORMS —
# in-process tests must not silently run through the device tunnel.
jax.config.update("jax_platforms", "cpu")

# Tests validate math, not kernel speed: pin matmuls to full precision
# (the platform default is reduced-precision even for tiny contractions).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(25)
