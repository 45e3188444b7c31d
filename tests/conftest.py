"""Test harness: force an 8-device virtual CPU mesh BEFORE any backend init.

This is the TPU analog of "test multi-node without a cluster" (SURVEY.md §4):
sharding/pjit tests run against 8 fake devices on the host.

Note: the environment's sitecustomize registers a TPU ("axon") backend and
sets ``jax_platforms`` at interpreter start, so env vars alone are too late —
we override the jax config directly before the first backend initialization.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
