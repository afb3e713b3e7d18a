"""Test configuration: force an 8-device virtual CPU mesh before jax loads.

Multi-chip sharding tests run on this virtual mesh
(xla_force_host_platform_device_count), per the TPU-native test strategy in
SURVEY.md §4 — real-TPU benchmarks are driven separately by bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The image's sitecustomize force-registers the axon TPU plugin and overrides
# JAX_PLATFORMS; pin the test backend to the virtual CPU mesh explicitly.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the fused train-step graphs take minutes to
# compile on this single-core host; cache hits make suite reruns fast.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
