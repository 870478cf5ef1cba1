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

import hashlib
import platform

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the scan-heavy inverse kernels are expensive to
# compile on CPU; cache them across pytest runs. The dir is fingerprinted by
# the host CPU: XLA:CPU AOT results compiled on a machine with different CPU
# features SIGSEGV/SIGILL when loaded (observed: a cache written on an
# avx512 host with +prefer-no-scatter crashed test_msm_flagship_sharded on
# this host).
def _cpu_fingerprint() -> str:
    # cpuinfo flags alone are NOT enough: XLA:CPU bakes additional tuning
    # target-features (+prefer-no-scatter, +prefer-no-gather, ...) chosen at
    # compile time into AOT results, and loading an entry whose features the
    # loader deems host-incompatible SIGSEGVs mid-suite (observed; the
    # loader itself warns "could lead to execution errors such as SIGILL").
    # Include the boot id so a cache never survives onto a different
    # machine/boot — within-boot reuse is what matters for test speed.
    try:
        flags = ""
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        flags = platform.processor()
    try:
        with open("/proc/sys/kernel/random/boot_id") as fh:
            flags += fh.read().strip()
    except OSError:
        pass
    import jaxlib

    flags += jaxlib.__version__
    return hashlib.sha256(flags.encode()).hexdigest()[:12]


if os.environ.get("MSM_NO_COMPILE_CACHE"):
    # diagnosis knob: run with the persistent compile cache fully off
    # (slow cold, but removes cache load/store from the process entirely)
    jax.config.update("jax_enable_compilation_cache", False)
else:
    jax.config.update(
        "jax_compilation_cache_dir", f"/tmp/jax_cache_msm_{_cpu_fingerprint()}"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import random

import pytest

# ---- known XLA:CPU crash when running MANY modules in one process ----------
# A process that compiles several test modules' worth of MSM programs can
# SIGSEGV/SIGABRT inside a LATER XLA:CPU compile (fault in libgcc's
# unwinder per the kernel log). Diagnosed in round 4: it reproduces with
# the persistent cache fully OFF (MSM_NO_COMPILE_CACHE=1) and with every
# jit wrapper kept alive, at shifting test positions — i.e. an XLA:CPU
# heap-corruption bug, not cache serialization and not executable GC.
# Mitigation: worker isolation —
#     pytest tests/ -n 4 --dist=loadfile --max-worker-restart=8
# (a crashed worker costs one failed test; observed 0-1 per full run).
# Individual modules always pass standalone.


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)


@pytest.fixture
def no_compile_cache():
    """Disable persistent compile-cache WRITES for one test.

    XLA:CPU crashes (SIGSEGV/SIGABRT) while SERIALIZING some multi-device
    executables for the persistent cache (jax compilation_cache
    put_executable_and_time) — observed on the 8-device sharded MSM
    programs. `jax_enable_compilation_cache` cannot be toggled mid-session
    (is_cache_used is memoized), but the min-compile-time threshold is read
    dynamically at write time — raise it so nothing qualifies."""
    prev = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    yield
    # restore the PREVIOUS value: a module-scope no-cache-writes fixture may
    # be active around this one (resetting to 1.0 here re-enabled writes
    # mid-module and resurfaced the serializer segfault)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev)
