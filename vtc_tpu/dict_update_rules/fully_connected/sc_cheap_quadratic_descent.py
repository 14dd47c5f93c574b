"""Hessian-diagonal-scaled ("cheap quadratic") dictionary update, fc.

Parity with vision_transform_codes/dict_update_rules/fully_connected/
sc_cheap_quadratic_descent.py:11-49: the steepest-descent gradient is
divided elementwise (per dictionary row) by ``hessian_diagonal +
lowest_code_val`` before the step.  The Hessian-diagonal EMA itself is
maintained by the trainer (see vtc_tpu.training.sparse_coding, matching
reference training/sparse_coding.py:154).  Pure: returns the new
dictionary.
"""
import functools

import jax
import jax.numpy as jnp
from vtc_tpu.ops.precision import matmul_precision


@functools.partial(jax.jit, static_argnames=("num_iters",
                                             "normalize_dictionary"))
def _update(images, dictionary, codes, hessian_diagonal, stepsize,
            num_iters, lowest_code_val, normalize_dictionary):
  batch = codes.shape[0]
  scale = (hessian_diagonal + lowest_code_val)[:, None]

  def body(_, d):
    grad = codes.T @ (codes @ d - images) / batch
    d = d - stepsize * grad / scale
    if normalize_dictionary:
      d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return d

  with matmul_precision():
    return jax.lax.fori_loop(0, num_iters, body, dictionary)


def run(images, dictionary, codes, hessian_diagonal, stepsize=0.001,
        num_iters=1, lowest_code_val=0.001, normalize_dictionary=True):
  """Approximate quadratic descent steps on the dictionary.

  Args:
    images: (b, n); dictionary: (s, n); codes: (b, s).
    hessian_diagonal: (s,) EMA estimate of the code second moments.
    stepsize, num_iters, lowest_code_val, normalize_dictionary: see module
      docstring / reference.

  Returns:
    (s, n) updated dictionary.
  """
  return _update(jnp.asarray(images, jnp.float32),
                 jnp.asarray(dictionary, jnp.float32),
                 jnp.asarray(codes, jnp.float32),
                 jnp.asarray(hessian_diagonal, jnp.float32),
                 jnp.asarray(stepsize, jnp.float32), int(num_iters),
                 jnp.asarray(lowest_code_val, jnp.float32),
                 bool(normalize_dictionary))


def hessian_diagonal_ema(hessian_diagonal, codes):
  """Trainer-side EMA: h <- 0.99 h + mean(codes^2, axis=0) / 100
  (reference training/sparse_coding.py:154)."""
  return 0.99 * hessian_diagonal + jnp.mean(codes**2, axis=0) / 100.0
