"""Test configuration: force a virtual 8-device CPU backend and float64.

Must run before jax initializes its backends, hence the env mutation at
module import time (pytest imports conftest before any test module).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU environment force-sets jax_platforms="axon,cpu" via a
# sitecustomize hook, overriding JAX_PLATFORMS; pin it back to cpu so the
# 8-virtual-device host platform is used for all tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: repeat suite runs skip the big scan compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20240816)
