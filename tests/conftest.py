"""Test configuration: force an 8-virtual-device CPU backend so sharding
tests run anywhere (SURVEY.md §4 implication; real-TPU paths are exercised
by bench.py / __graft_entry__.py instead)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session env pins JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup, so the env var
# above may be read too late; force the platform through the config API.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
