"""Subspace cheap-quadratic dictionary update (fc).

Parity with vision_transform_codes/dict_update_rules/fully_connected/
subspace_sc_cheap_quadratic_descent.py:13-89: the cheap-quadratic step
plus a within-group anti-alignment regularization term weighted by
``alignment_penalty`` (fast path when the penalty is zero).  Pure:
returns the new dictionary.
"""
import functools

import jax
import jax.numpy as jnp

from vtc_tpu.analysis_transforms.fully_connected.subspace_ista_fista import (
    pack_group_indices)
from vtc_tpu.dict_update_rules.fully_connected import (
    sc_cheap_quadratic_descent)
from vtc_tpu.dict_update_rules.fully_connected._subspace_common import (
    alignment_regularization_gradients)
from vtc_tpu.ops.precision import matmul_precision


@functools.partial(jax.jit, static_argnames=("num_iters",
                                             "normalize_dictionary"))
def _update_with_reg(images, dictionary, codes, gather_inds, valid_mask,
                     hessian_diagonal, alignment_penalty, stepsize,
                     num_iters, lowest_code_val, normalize_dictionary):
  batch = codes.shape[0]
  scale = (hessian_diagonal + lowest_code_val)[:, None]

  def body(_, d):
    reg = alignment_regularization_gradients(
        d, gather_inds, valid_mask, normalize_dictionary)
    grad = (codes.T @ (codes @ d - images) / batch
            + alignment_penalty * reg)
    d = d - stepsize * grad / scale
    if normalize_dictionary:
      d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return d

  with matmul_precision():
    return jax.lax.fori_loop(0, num_iters, body, dictionary)


def run(images, dictionary, codes, group_assignments, hessian_diagonal,
        alignment_penalty, stepsize=0.001, num_iters=1,
        lowest_code_val=0.001, normalize_dictionary=True):
  """Cheap-quadratic descent with within-group anti-alignment penalty.

  Args mirror the reference (see module docstring); ``group_assignments``
  is a list of index lists (groups may overlap).

  Returns:
    (s, n) updated dictionary.
  """
  if alignment_penalty == 0:
    # fast path, identical to plain cheap quadratic descent
    # (reference lines 80-88)
    return sc_cheap_quadratic_descent.run(
        images, dictionary, codes, hessian_diagonal, stepsize, num_iters,
        lowest_code_val, normalize_dictionary)
  gather_inds, valid_mask = pack_group_indices(
      group_assignments, int(jnp.shape(dictionary)[0]))
  return _update_with_reg(
      jnp.asarray(images, jnp.float32),
      jnp.asarray(dictionary, jnp.float32),
      jnp.asarray(codes, jnp.float32), gather_inds, valid_mask,
      jnp.asarray(hessian_diagonal, jnp.float32),
      jnp.asarray(alignment_penalty, jnp.float32),
      jnp.asarray(stepsize, jnp.float32), int(num_iters),
      jnp.asarray(lowest_code_val, jnp.float32),
      bool(normalize_dictionary))
