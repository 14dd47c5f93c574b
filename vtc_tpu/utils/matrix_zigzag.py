"""Zigzag (JPEG scan order) reordering of 2-d arrays.

Functional parity with reference utils/matrix_zigzag.py:16-194 (a
vendored MATLAB translation with explicit index walking); here the
zigzag index permutation is built vectorized from anti-diagonals and
cached, so both directions are O(n) gathers.
"""
import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _zigzag_permutation(vmax: int, hmax: int):
  """Flat indices of a (vmax, hmax) array in zigzag scan order."""
  order = []
  for d in range(vmax + hmax - 1):
    rows = np.arange(max(0, d - hmax + 1), min(d + 1, vmax))
    cols = d - rows
    if d % 2 == 0:  # even anti-diagonal: walk up-right
      rows, cols = rows[::-1], cols[::-1]
    order.append(rows * hmax + cols)
  return np.concatenate(order)


def zigzag(matrix):
  """(v, h) array -> (v*h,) vector in zigzag scan order."""
  matrix = np.asarray(matrix)
  perm = _zigzag_permutation(matrix.shape[0], matrix.shape[1])
  return matrix.reshape(-1)[perm]


def inverse_zigzag(vector, vmax, hmax):
  """(v*h,) zigzag vector -> (v, h) array."""
  vector = np.asarray(vector).reshape(-1)
  perm = _zigzag_permutation(vmax, hmax)
  out = np.empty(vmax * hmax, dtype=vector.dtype)
  out[perm] = vector
  return out.reshape(vmax, hmax)
