"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU backend and pins
``jax_platforms`` to it, so the JAX_PLATFORMS env var alone is not enough;
we must also update the config after importing jax.  XLA_FLAGS has to be
set before the CPU backend initializes to get 8 virtual devices (the same
setup the driver uses for the multi-chip dry run).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
  os.environ["XLA_FLAGS"] = (
      _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
  return np.random.RandomState(0)


def pytest_configure(config):
  assert jax.default_backend() == "cpu", (
      "tests must run on the CPU backend, got " + jax.default_backend())
  assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
