"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware. Must run before jax is imported anywhere."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/tests/data")


@pytest.fixture(scope="session")
def reference_corpus():
    """AVIF files from the reference test corpus (read-only), if present."""
    if not REFERENCE_DATA.is_dir():
        pytest.skip("reference corpus not available")
    return sorted(REFERENCE_DATA.glob("*.avif"))
