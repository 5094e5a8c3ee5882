"""Test configuration: force CPU with 8 virtual devices BEFORE jax imports.

This is the standard way to exercise pjit/shard_map multi-chip sharding without
real TPUs (SURVEY.md §4(6)): XLA's host platform is split into 8 virtual
devices, so `jax.sharding.Mesh` tests run the same partitioned programs the
TPU pod would.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on (virtual multi-)CPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin registers itself at interpreter start (sitecustomize)
# and ignores the JAX_PLATFORMS env var; the config knob does win.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
