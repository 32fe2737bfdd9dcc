"""Pytest configuration.

JAX tests run on a virtual 8-device CPU mesh so multi-chip sharding is
exercised without TPU hardware (the driver separately dry-runs the
multichip path; bench.py uses the real chip).

NOTE: this image boots JAX with the axon TPU-tunnel plugin and forces
`jax_platforms=axon,cpu` from sitecustomize, ignoring the JAX_PLATFORMS
env var — so the CPU override must go through jax.config after import.
Additionally, the plugin's registration contacts the (single-client) TPU
tunnel at interpreter startup and BLOCKS if another process holds it; when
running tests while a TPU job is active, disable the plugin entirely:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

from zukelang_tpu import jax_setup

# ZUKELANG_TEST_TPU=1 keeps the real TPU backend so the compiled-Pallas
# regression tests in test_pallas_tpu.py actually run; default is the
# virtual 8-device CPU mesh.
if os.environ.get("ZUKELANG_TEST_TPU", "") != "1":
    jax_setup.force_cpu(8)

import pytest


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run slow tests (full program suites)")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: slow end-to-end tests")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow; use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
