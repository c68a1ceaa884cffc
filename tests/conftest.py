"""Test configuration: run on CPU with 8 virtual devices.

Sharding tests exercise a virtual 8-device mesh the way the driver's
multi-chip dry-run does; compute tests don't need the real TPU.

Note: the session environment ships an axon (remote TPU) sitecustomize on
PYTHONPATH that imports jax at interpreter start — BEFORE this conftest —
which freezes the device configuration and makes
``xla_force_host_platform_device_count`` a no-op. Multi-device tests
(test_parallel.py) therefore run their bodies in clean subprocesses with the
axon site stripped; see ``tests/parallel_impl.py``.
"""

import os
import sys

# Hard override: the session environment presets JAX_PLATFORMS=axon (TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache: XLA CPU compiles of the traversal loops cost
# tens of seconds each; cache them across test runs. The env vars alone are
# NOT enough here: the axon sitecustomize imports jax at interpreter start
# (before this conftest), freezing the env-derived config — so set the
# config explicitly too.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update(
    "jax_persistent_cache_min_entry_size_bytes",
    int(os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"]),
)
jax.config.update(
    "jax_persistent_cache_min_compile_time_secs",
    float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]),
)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
