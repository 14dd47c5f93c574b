"""Miscellaneous host-side utilities.

Parity with reference utils/misc.py:9-152: newest-checkpoint loading
(re-exported from vtc_tpu.utils.checkpoint), rotational averaging of 2-d
arrays, and random / great-circle walks on the N-dimensional unit sphere
(used by the reset/prune nonuniformity analysis and experiments).
"""
import numpy as np

from vtc_tpu.utils.checkpoint import (  # noqa: F401 (public re-export)
    load_newest_dictionary_checkpoint)


def rotational_average(array_2d, nbins=10, elem_cartesian_coords=None):
  """Average a 2-d array over polar angle in radial-magnitude bins.

  Returns (rotational_means (nbins,), bin_left_edges (nbins,)).
  Magnitudes beyond the largest cartesian dimension (the 'corners') are
  excluded, and the right edge of the last bin is inclusive.
  """
  array_2d = np.asarray(array_2d)
  if elem_cartesian_coords is None:
    v, h = np.meshgrid(np.arange(array_2d.shape[0]),
                       np.arange(array_2d.shape[1]), indexing="ij")
  else:
    v, h = elem_cartesian_coords
  mag = np.sqrt(v.astype(float)**2 + h.astype(float)**2)
  highest = max(np.max(np.abs(v)), np.max(np.abs(h)))
  edges = np.linspace(0.0, highest, nbins + 1)
  assignments = np.digitize(mag, edges) - 1
  assignments[mag == highest] = nbins - 1
  means = np.array([
      np.mean(array_2d[assignments == i]) if np.any(assignments == i)
      else np.nan
      for i in range(nbins)])
  return means, edges[:-1]


def walk_on_unit_sphere(starting_position, step_angle_radians, num_steps,
                        walk_type="random", additional_params=None,
                        rng=None):
  """A sequence of unit vectors stepping along the N-sphere.

  Each step rotates the current position by ``step_angle_radians``
  within a 2-d plane: a freshly random plane per step ('random' walk) or
  one fixed plane ('great_circle', optionally defined by
  additional_params['gc_other_vector']).

  Returns (N, num_steps) with the start position in column 0.
  """
  assert walk_type in ("random", "great_circle")
  start = np.asarray(starting_position, float)
  assert start.ndim == 1
  n = start.size
  rng = rng if rng is not None else np.random.default_rng()
  pos = start / np.linalg.norm(start)

  def plane_through(vec, other=None):
    if other is None:
      other = rng.standard_normal(n)
      other /= np.linalg.norm(other)
    basis, _ = np.linalg.qr(np.c_[vec, other])
    return basis

  rot = np.array([
      [np.cos(step_angle_radians), -np.sin(step_angle_radians)],
      [np.sin(step_angle_radians), np.cos(step_angle_radians)]])

  if walk_type == "great_circle":
    other = None
    if additional_params is not None:
      other = np.array(additional_params["gc_other_vector"], float)
      assert other.shape == (n,)
    fixed_basis = plane_through(pos, other)

  steps = np.zeros((n, num_steps))
  steps[:, 0] = pos
  for k in range(1, num_steps):
    basis = plane_through(steps[:, k - 1]) if walk_type == "random" \
        else fixed_basis
    steps[:, k] = basis @ (rot @ (basis.T @ steps[:, k - 1]))
  return steps
