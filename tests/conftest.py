"""Test configuration: force CPU JAX with 8 virtual devices.

Tests must run identically with or without TPU hardware; multi-chip
sharding tests use the 8 virtual CPU devices.  The environment may
pre-import jax with a hardware platform selected (e.g. a tunneled TPU), so
``os.environ`` alone is not enough — we override the live jax config before
any backend is initialised.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
