"""Test configuration: run on a virtual 8-device CPU mesh.

Pallas kernels auto-select interpreter mode off-TPU (see
``sputnik_tpu.kernels.common.use_interpret``), so the full suite runs in CI
without TPU hardware; the distributed tests build a Mesh over the 8 virtual
CPU devices (the JAX-native 'fake backend').
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores JAX_PLATFORMS from the environment; force the
# CPU backend through the config API instead.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
