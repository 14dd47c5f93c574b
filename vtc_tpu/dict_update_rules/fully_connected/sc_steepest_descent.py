"""Steepest-descent dictionary update for fully-connected sparse coding.

Parity with vision_transform_codes/dict_update_rules/fully_connected/
sc_steepest_descent.py:9-43:

  D <- D - eta * codes^T (codes D - X) / b,  then row-renormalize to ||.||=1

repeated ``num_iters`` times.  Pure function: returns the new dictionary.
The whole update (two MXU matmuls + renorm epilogue) is one jitted program
and is also reused inside the fused train step (vtc_tpu.training).
"""
import functools

import jax
import jax.numpy as jnp
from vtc_tpu.ops.precision import matmul_precision


def _renormalize_rows(dictionary):
  norms = jnp.linalg.norm(dictionary, axis=1, keepdims=True)
  return dictionary / norms


@functools.partial(jax.jit, static_argnames=("num_iters",
                                             "normalize_dictionary"))
def _update(images, dictionary, codes, stepsize, num_iters,
            normalize_dictionary):
  batch = codes.shape[0]

  def body(_, d):
    grad = codes.T @ (codes @ d - images) / batch
    d = d - stepsize * grad
    if normalize_dictionary:
      d = _renormalize_rows(d)
    return d

  with matmul_precision():
    return jax.lax.fori_loop(0, num_iters, body, dictionary)


def run(images, dictionary, codes, stepsize=0.001, num_iters=1,
        normalize_dictionary=True):
  """One or more steepest-descent steps on the dictionary.

  Args:
    images: (b, n) batch of flattened patches.
    dictionary: (s, n) current dictionary.
    codes: (b, s) codes inferred for this batch.
    stepsize: learning rate eta.
    num_iters: number of descent steps.
    normalize_dictionary: renormalize rows to unit l2 after each step.

  Returns:
    (s, n) updated dictionary.
  """
  return _update(jnp.asarray(images, jnp.float32),
                 jnp.asarray(dictionary, jnp.float32),
                 jnp.asarray(codes, jnp.float32),
                 jnp.asarray(stepsize, jnp.float32), int(num_iters),
                 bool(normalize_dictionary))
