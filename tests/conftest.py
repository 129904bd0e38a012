"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware.

The image pins JAX_PLATFORMS=axon via sitecustomize (which also imports
jax at interpreter start), so an env setdefault is not enough — override
the env var *and* the live config before any backend initializes."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/tests/data")


@pytest.fixture(scope="session")
def reference_corpus():
    """AVIF files from the reference test corpus (read-only), if present."""
    if not REFERENCE_DATA.is_dir():
        pytest.skip("reference corpus not available")
    return sorted(REFERENCE_DATA.glob("*.avif"))
