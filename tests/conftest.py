"""Test configuration: run everything on an 8-device virtual CPU mesh.

This is the TPU equivalent of "test multi-node without a cluster"
(SURVEY.md §4): `xla_force_host_platform_device_count=8` gives eight XLA CPU
devices so sharding/collective paths are exercised for real, without TPU
hardware.  Must be set before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell presets axon (TPU tunnel)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize imports jax and registers the axon (TPU) plugin before the
# env var assignment above can take effect, so force the platform explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402

from stove_tpu.config import Config  # noqa: E402


@pytest.fixture(scope="session")
def cfg() -> Config:
    """Small-but-real config shared across tests."""
    return Config().debug_shrunk()


@pytest.fixture(scope="session")
def key():
    return jax.random.key(0)


def pytest_configure(config):
    config.addinivalue_line("markers",
                            "slow: long-running integration test")
