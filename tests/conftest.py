"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on host CPU devices
(``xla_force_host_platform_device_count``); real-TPU benchmarking happens in
``bench.py``, not in tests.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)
