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


# ---------------------------------------------------------------------------
# Smoke tier: ``pytest -m smoke -n 8`` runs a <2-minute representative
# subset — per test function, the CHEAPEST measured parametrization, with
# functions whose cheapest config exceeds 20 s (interpret-mode heavyweights:
# ring attention, transformer blocks, fused-backward chains) left to the
# full CI tier. The id list is generated from a full --durations run
# (tests/smoke_ids.txt); regenerate it when adding test modules.
# ---------------------------------------------------------------------------


def _smoke_ids():
    path = os.path.join(os.path.dirname(__file__), "smoke_ids.txt")
    try:
        with open(path) as f:
            return {line.strip() for line in f if line.strip()}
    except OSError:
        return set()


def pytest_collection_modifyitems(config, items):
    smoke = _smoke_ids()
    seen = set()
    for item in items:
        if item.nodeid in smoke:
            item.add_marker(pytest.mark.smoke)
            seen.add(item.nodeid.split("[", 1)[0])
    # New test functions not yet in the generated list: mark their first
    # parametrization so fresh code keeps smoke coverage by default.
    for item in items:
        base = item.nodeid.split("[", 1)[0]
        if base not in seen:
            seen.add(base)
            item.add_marker(pytest.mark.smoke)
