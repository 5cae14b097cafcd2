"""Test configuration: force an 8-device CPU platform before JAX loads.

This is the TPU-native answer to "test multi-device without a cluster"
— XLA's host platform is split into 8 virtual devices so mesh/sharding
code paths run under plain pytest.
"""
import os

# NB: the environment may pre-register a hardware TPU plugin and pin
# JAX_PLATFORMS to it; tests must run on the virtual-8-device CPU
# platform, so override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy integration tests (multi-minute compiles / "
        "subprocesses); deselect with -m 'not slow' for a quick loop")
