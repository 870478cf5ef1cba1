"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on host CPU devices
(``xla_force_host_platform_device_count``); real-TPU benchmarking happens in
``bench.py``, not in tests.
"""

import os

# NOTE: the environment's sitecustomize force-registers the axon TPU backend
# and overrides JAX_PLATFORMS, so the env var alone is not enough — the
# config.update below (before any backend init) is what actually pins CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # tests check bit-exact integer semantics; XLA optimization level only
    # affects compile speed (big win on the 2-CPU test host)
    flags = flags + " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the scan-heavy inverse kernels are expensive to
# compile on CPU; cache them across pytest runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_msm")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)
