"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are exercised on virtual CPU devices, per the
project's test strategy (SURVEY.md §4): the reference has no test framework
at all, so unit tests, golden-model parity, and sharded-statistics tests are
all new here.

TPU-tunnel images preselect a TPU backend (JAX_PLATFORMS + a sitecustomize
PJRT plugin registration), so env vars alone are not enough — but backends
are lazily initialized, and conftest runs before any test imports execute a
JAX operation, so explicit config updates here still win.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight test (>10 s: zlane interpret runs, n=64800 "
        'constructions, full rate grids) — excluded by -m "not slow" for '
        "the ~5-min inner-loop subset; the full suite still runs them",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
