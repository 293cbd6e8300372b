"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The env vars must be set before jax initializes any backend, so this happens
at conftest import time (pytest imports conftest before test modules). The
'axon' TPU plugin in this image registers itself regardless of JAX_PLATFORMS,
so we additionally pin the default device to CPU after import.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

if jax.default_backend() != "cpu":
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402


@pytest.fixture
def cpu_devices():
    return jax.devices("cpu")
