"""Exact linear analysis transform (matrix inverse / transpose).

Parity with vision_transform_codes/analysis_transforms/fully_connected/
invertible_linear.py:6-26.  For the non-orthonormal case we use a linear
solve instead of forming the explicit inverse: ``codes = X D^{-1}`` is the
solution of ``codes D = X``, i.e. ``D^T codes^T = X^T`` -- better
conditioned and cheaper on TPU than ``inverse`` + matmul.
"""
import functools

import jax
import jax.numpy as jnp
from vtc_tpu.ops.precision import matmul_precision


@jax.jit
def _solve_nonortho(images, dictionary):
  # codes @ dictionary = images  =>  dictionary^T @ codes^T = images^T
  with matmul_precision():
    return jax.scipy.linalg.solve(dictionary.T, images.T).T


@jax.jit
def _solve_ortho(images, dictionary):
  with matmul_precision():
    return images @ dictionary.T


def run(images, dictionary, orthonormal=False):
  """Infer codes via the exact inverse of a square dictionary.

  Args:
    images: (b, n) batch of flattened images.
    dictionary: (n, n) square dictionary.
    orthonormal: if True use the transpose (exact inverse for orthonormal
      dictionaries, cheaper and numerically exact).

  Returns:
    (b, n) codes.
  """
  images = jnp.asarray(images, jnp.float32)
  dictionary = jnp.asarray(dictionary, jnp.float32)
  if orthonormal:
    return _solve_ortho(images, dictionary)
  return _solve_nonortho(images, dictionary)
