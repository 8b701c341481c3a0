"""Test config: force a deterministic 8-device CPU mesh for all tests.

The environment pins JAX_PLATFORMS=axon (the single real TPU chip via a
tunnel) and ignores the env-var override, so we must force the CPU backend
through jax.config before any computation.  Unit + sharding tests run on
CPU with 8 virtual devices; real-chip runs go through bench.py / the CLIs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # belt — some paths do honor it

import jax

jax.config.update("jax_platforms", "cpu")  # suspenders — axon ignores env
jax.config.update("jax_num_cpu_devices", 8)

import pathlib

import pytest

REFERENCE_RESOURCES = pathlib.Path("/root/reference/resources")


@pytest.fixture(scope="session")
def corpus_dir():
    if not REFERENCE_RESOURCES.is_dir():
        pytest.skip("reference corpus not available")
    return REFERENCE_RESOURCES
