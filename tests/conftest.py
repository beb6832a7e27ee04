"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding paths are exercised on virtual CPU devices
(``--xla_force_host_platform_device_count``), per the project's test strategy
(SURVEY.md §4): the reference has no test framework at all, so unit tests,
golden-model parity, and sharded-statistics tests are all new here.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
