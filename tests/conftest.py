"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(xla_force_host_platform_device_count), so the suite runs anywhere and
exercises the same GSPMD partitioning the TPU path uses.

Note: the session's sitecustomize imports jax and pins JAX_PLATFORMS to the
tunneled TPU backend before pytest starts, so plain env mutation here is too
late — we must go through jax.config (backends are not yet initialized at
conftest import time).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
