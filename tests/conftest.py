"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without a TPU pod by forcing the
host platform and 8 virtual CPU devices (SURVEY §4 test-strategy).  Must
run before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize registers the TPU plugin and force-sets
# jax_platforms at interpreter startup; override it back to CPU before any
# backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is XLA-compile-dominated, so
# repeat runs drop sharply once executables are cached on disk.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       "/tmp/rub_mimo_test_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # cache support must never break the suite
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from rub_mimo_tpu.config import ModemConfig, Modulation, tiny_config  # noqa: E402


@pytest.fixture(scope="session")
def tcfg() -> ModemConfig:
    """Small 2x2 config used across tests."""
    return tiny_config()


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
