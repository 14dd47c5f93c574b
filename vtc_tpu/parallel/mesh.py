"""Device-mesh construction helpers."""
import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(data: int = None, code: int = 1, devices=None) -> Mesh:
  """Build a (data, code) mesh over the available devices.

  Args:
    data: size of the batch-sharding axis; defaults to
      ``len(devices) // code``.
    code: size of the dictionary-row-sharding axis (1 = pure data
      parallel).
    devices: explicit device list (defaults to jax.devices()).

  Returns:
    jax.sharding.Mesh with named axes ('data', 'code').
  """
  devices = list(jax.devices()) if devices is None else list(devices)
  if data is None:
    assert len(devices) % code == 0
    data = len(devices) // code
  assert data * code <= len(devices), (
      f"mesh {data}x{code} needs more than {len(devices)} devices")
  grid = np.asarray(devices[:data * code]).reshape(data, code)
  return Mesh(grid, axis_names=("data", "code"))
