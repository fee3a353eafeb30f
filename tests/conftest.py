"""Test configuration: force CPU backend with a virtual 8-device mesh so
multi-chip sharding logic is exercised without TPU hardware, and enable x64 so
numeric oracles run at reference (double) precision.

Some installed packages register pytest plugins that import jax before this
conftest's env assignments would be read, so the jax config is also set
programmatically (env vars alone are not reliable here).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "true")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    yield


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
