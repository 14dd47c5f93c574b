"""Subspace steepest-descent dictionary update (fc).

The reference ADVERTISES this rule (training/sparse_coding.py:62-64,
291-294, 421-424) but never ships the module -- importing it raises
ImportError (see SURVEY.md section 2.4 item 1).  We implement it for
real: it is the subspace cheap-quadratic rule WITHOUT the Hessian
diagonal scaling, i.e. plain steepest descent on the reconstruction error
plus the within-group anti-alignment regularizer.  Pure: returns the new
dictionary.
"""
import functools

import jax
import jax.numpy as jnp

from vtc_tpu.analysis_transforms.fully_connected.subspace_ista_fista import (
    pack_group_indices)
from vtc_tpu.dict_update_rules.fully_connected import sc_steepest_descent
from vtc_tpu.dict_update_rules.fully_connected._subspace_common import (
    alignment_regularization_gradients)
from vtc_tpu.ops.precision import matmul_precision


@functools.partial(jax.jit, static_argnames=("num_iters",
                                             "normalize_dictionary"))
def _update_with_reg(images, dictionary, codes, gather_inds, valid_mask,
                     alignment_penalty, stepsize, num_iters,
                     normalize_dictionary):
  batch = codes.shape[0]

  def body(_, d):
    reg = alignment_regularization_gradients(
        d, gather_inds, valid_mask, normalize_dictionary)
    grad = (codes.T @ (codes @ d - images) / batch
            + alignment_penalty * reg)
    d = d - stepsize * grad
    if normalize_dictionary:
      d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return d

  with matmul_precision():
    return jax.lax.fori_loop(0, num_iters, body, dictionary)


def run(images, dictionary, codes, group_assignments, alignment_penalty,
        stepsize=0.001, num_iters=1, normalize_dictionary=True):
  """Steepest descent with within-group anti-alignment penalty.

  Returns:
    (s, n) updated dictionary.
  """
  if alignment_penalty == 0:
    return sc_steepest_descent.run(
        images, dictionary, codes, stepsize, num_iters,
        normalize_dictionary)
  gather_inds, valid_mask = pack_group_indices(
      group_assignments, int(jnp.shape(dictionary)[0]))
  return _update_with_reg(
      jnp.asarray(images, jnp.float32),
      jnp.asarray(dictionary, jnp.float32),
      jnp.asarray(codes, jnp.float32), gather_inds, valid_mask,
      jnp.asarray(alignment_penalty, jnp.float32),
      jnp.asarray(stepsize, jnp.float32), int(num_iters),
      bool(normalize_dictionary))
