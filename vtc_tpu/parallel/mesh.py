"""Device-mesh construction helpers.

Single-slice meshes have named axes ('data', 'code'): batch sharding
over ICI plus optional dictionary-row sharding.  Multi-slice (pod)
deployments add a leading 'dcn' axis -- slices are connected by
data-center network, chips within a slice by ICI -- so data parallelism
spans ('dcn', 'data') and the per-step gradient/statistics psum
decomposes into a fast ICI all-reduce within each slice followed by a
small cross-slice DCN all-reduce (XLA derives that decomposition from
the device assignment; keep the device list grouped by slice, which is
the order jax.devices() returns on multislice TPU).
"""
import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(data: int = None, code: int = 1, dcn: int = 1,
              devices=None) -> Mesh:
  """Build a (data, code) or (dcn, data, code) mesh.

  Args:
    data: size of the batch-sharding axis; defaults to
      ``len(devices) // (code * dcn)``.
    code: size of the dictionary-row-sharding axis (1 = pure data
      parallel).
    dcn: number of slices for multi-slice deployments (1 = single
      slice; the mesh then has no 'dcn' axis).  Devices must be listed
      slice-by-slice so the leading axis maps to DCN boundaries.
    devices: explicit device list (defaults to jax.devices()).

  Returns:
    jax.sharding.Mesh with axes ('data', 'code') or
    ('dcn', 'data', 'code').
  """
  devices = list(jax.devices()) if devices is None else list(devices)
  if data is None:
    assert len(devices) % (code * dcn) == 0
    data = len(devices) // (code * dcn)
  assert dcn * data * code <= len(devices), (
      f"mesh {dcn}x{data}x{code} needs more than {len(devices)} devices")
  if dcn == 1:
    grid = np.asarray(devices[:data * code]).reshape(data, code)
    return Mesh(grid, axis_names=("data", "code"))
  grid = np.asarray(devices[:dcn * data * code]).reshape(dcn, data, code)
  return Mesh(grid, axis_names=("dcn", "data", "code"))


def dp_axes(mesh) -> tuple:
  """The mesh axes data parallelism spans: ('data',) on a single slice,
  ('dcn', 'data') on a multi-slice mesh."""
  return (("dcn", "data") if "dcn" in mesh.axis_names else ("data",))
