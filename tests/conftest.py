"""Test configuration: force CPU with 8 virtual devices so sharding
tests run without TPU hardware (SURVEY.md section 4).

NOTE: this environment's sitecustomize imports jax at interpreter start
with JAX_PLATFORMS=axon (TPU tunnel), so env vars are too late —
jax.config.update is the reliable switch.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
