"""Test harness configuration.

Tests run on a virtual 8-device CPU backend (the standard fake-backend
trick for multi-device JAX tests without a TPU) — set BEFORE jax import.
"""

import os

# Force CPU even if the ambient environment points JAX at a TPU tunnel:
# unit tests are golden-value tests that need f32 determinism and an
# 8-device virtual mesh. NOTE: this machine's sitecustomize registers the
# axon TPU backend in every interpreter and overrides JAX_PLATFORMS, so
# the env var alone is not enough — jax.config must be updated too.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
