"""Test config: force a deterministic 8-device CPU mesh for sharding tests.

Real-chip runs use bench.py / the CLIs; unit + sharding tests run on the
CPU backend so they work everywhere (and in CI without a TPU).
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import pytest

REFERENCE_RESOURCES = pathlib.Path("/root/reference/resources")


@pytest.fixture(scope="session")
def corpus_dir():
    if not REFERENCE_RESOURCES.is_dir():
        pytest.skip("reference corpus not available")
    return REFERENCE_RESOURCES
