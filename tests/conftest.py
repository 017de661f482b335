"""Test configuration: force an 8-device virtual CPU platform.

This is the TPU-world "fake backend" the reference lacked (SURVEY.md §4):
all SPMD/all_to_all code paths are exercised on a virtual 8-device CPU mesh,
so distributed correctness is tested without hardware.
Must run before jax initializes — pytest imports conftest first.
"""

import os

# Must happen before any backend initialization. The image's sitecustomize
# registers the remote-TPU "axon" platform and forces JAX_PLATFORMS=axon;
# an env override is ignored, so the platform is reset via jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from salient_plusplus_tpu.data import synthetic


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "serial: timing-sensitive tests that assert wall-clock bounds on "
        "subprocess legs; they must run without xdist load on the same "
        "cores (the Makefile runs them in a second, sequential pass — "
        "round-4 regression: the host-overhead bound failed only under "
        "-n auto contention, 3 xdist workers + 3 measurement processes "
        "on 4 cores)")


@pytest.fixture(scope="session")
def tiny_graph():
    """Deterministic small planted-partition graph for unit tests."""
    return synthetic.planted_partition(
        name="tiny", num_nodes=500, num_classes=5, avg_degree=8,
        num_features=16, seed=7,
    )


@pytest.fixture(scope="session")
def small_graph():
    """Medium graph for end-to-end/sampler tests."""
    return synthetic.planted_partition(
        name="small", num_nodes=5000, num_classes=10, avg_degree=10,
        num_features=32, seed=3,
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
