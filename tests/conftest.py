"""Test configuration: run on a virtual 8-device CPU mesh.

This is the TPU-world fake backend (SURVEY.md §4): multi-device sharding
logic (psum over 'data', TP over 'model') executes on host CPU devices so the
suite runs anywhere and exercises the same compiled collectives.

Note: a pytest plugin imports jax before this conftest runs, so env vars are
too late — jax.config.update still works because the backend has not been
initialized yet.
"""

import jax

jax.config.update("jax_platforms", "cpu")   # override preset axon/TPU platform
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: longer-running training tests")
