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

import subprocess

import numpy as np
import pytest

# Build the native IO library up front (module level: test files evaluate
# skipif marks like test_flac's `flac_available()` at IMPORT time, before any
# fixture runs -- on a fresh checkout the whole FLAC suite silently skipped
# whenever it collected before test_native's build fixture had run).
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
try:
    _r = subprocess.run(
        ["make", "-C", os.path.join(_repo, "native")],
        capture_output=True, timeout=300,
    )
    if _r.returncode == 0:
        import whisper_tpu.io.native as _native

        if _native._LIB is None:
            _native._LIB = _native._load_lib()
            if _native._LIB is not None:
                try:
                    _native._bind_flac(_native._LIB)
                except AttributeError:  # old .so without the FLAC symbols
                    pass
except (OSError, subprocess.TimeoutExpired):  # no make: tests skip as before
    pass


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
