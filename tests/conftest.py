"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding/collective
behavior is validated on a virtual 8-device CPU platform, which exercises
exactly the same jax.sharding / shard_map code paths (SURVEY.md section 4e).

Note: this environment's jaxlib ignores the JAX_PLATFORMS env var (a
tunneled 'axon' TPU plugin takes priority), so we must call
``jax.config.update('jax_platforms', 'cpu')`` after import.  XLA_FLAGS must
still be set before the CPU backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
