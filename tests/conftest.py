"""Test configuration: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths (`libstevi_tpu.parallel`) are exercised without TPU
hardware.

The container's sitecustomize registers the axon TPU plugin and overrides
JAX_PLATFORMS, so the env var alone is not enough — we must also update the
jax config before any backend is initialized."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running validation (flagship-geometry "
        "distributed runs); deselect with -m 'not slow'")


@pytest.fixture
def rng():
    return np.random.default_rng(42)
