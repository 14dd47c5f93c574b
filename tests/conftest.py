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


# ~60-second smoke tier (`pytest -m quick`): fast, high-signal modules
# covering the public API, every solver family and update rule, the
# torch-reference parity contract, and the aux utils.  The heavyweight
# conv/pallas/parallel trajectory suites stay full-run only.
_QUICK_MODULES = {
    "test_api", "test_warm_power", "test_fc_ista_fista",
    "test_dict_update_rules", "test_subspace_ista_fista",
    "test_reference_parity", "test_trainer_trajectory_parity",
    "test_trainer_extras", "test_lca",
    "test_plotting", "test_torch_dataloader_compat",
    "test_dataset_loaders", "test_native_entropy", "test_jpeg_utils",
    "test_reset_prune", "test_pallas_ica_train",
}


def pytest_configure(config):
  assert jax.default_backend() == "cpu", (
      "tests must run on the CPU backend, got " + jax.default_backend())
  assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
  config.addinivalue_line(
      "markers", "quick: ~60s smoke subset (pytest -m quick)")


def pytest_collection_modifyitems(config, items):
  for item in items:
    if item.module.__name__ in _QUICK_MODULES:
      item.add_marker(pytest.mark.quick)
