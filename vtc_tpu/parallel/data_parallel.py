"""Sharded fused train steps: explicit shard_map DP and GSPMD pjit DP+TP.

Two interchangeable builders (both return compiled callables with the
same signature as the single-device fused step minus the static tail):

  build_shard_map_train_step -- explicit SPMD: the batch is sharded over
    the mesh's 'data' axis, the dictionary and Hessian EMA are
    replicated, and the dictionary gradient + Hessian statistics are
    ``psum``-reduced across the axis each update iteration.  Covers every
    algorithm combination (fc / conv x steepest / cheap-quadratic /
    subspace rules).  Produces the SAME update as the single-device step
    on the identical global batch (up to float reduction order) -- the
    invariant tested on the virtual 8-device mesh.

  build_pjit_train_step -- GSPMD: the same raw step is jitted with
    NamedShardings (batch over 'data', dictionary rows optionally over
    'code' for very large dictionaries); XLA inserts the collectives.

Design notes: the dictionary is small (s x n floats) relative to patch
batches, so DP-with-replicated-dictionary is the right default; 'code'
sharding exists for heavily overcomplete dictionaries where s >> n and
the s x s Gram dominates HBM.
"""
import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vtc_tpu.analysis_transforms.convolutional import (
    ista_fista as conv_ista_fista)
from vtc_tpu.analysis_transforms.fully_connected import (
    ista_fista as fc_ista_fista)
from vtc_tpu.analysis_transforms.fully_connected import subspace_ista_fista
from vtc_tpu.dict_update_rules.fully_connected._subspace_common import (
    alignment_regularization_gradients)
from vtc_tpu.ops import conv_shapes
from vtc_tpu.ops import convolutions as conv_ops
from vtc_tpu.ops import lipschitz as lipschitz_ops
from vtc_tpu.ops.precision import matmul_precision
from vtc_tpu.training.sparse_coding import build_raw_step_fn


def build_pjit_train_step(mesh, mode, inference_alg, update_alg, *,
                          upd_num_iters=1, shard_code_axis=False,
                          **config):
  """GSPMD-sharded fused step.  Batch sharded over 'data'; dictionary
  rows optionally sharded over 'code'.  Signature:
    step(dictionary, hessian, batch, sparsity_weight, inf_num_iters,
         upd_stepsize) -> (new_dictionary, new_hessian, codes)
  """
  raw = build_raw_step_fn(mode, inference_alg, update_alg, **config)

  def step(dictionary, hessian, batch, sparsity_weight, inf_num_iters,
           upd_stepsize):
    return raw(dictionary, hessian, batch, sparsity_weight,
               inf_num_iters, upd_stepsize, upd_num_iters,
               jnp.float32(0.0))

  from vtc_tpu.parallel.mesh import dp_axes
  axes = dp_axes(mesh)
  code = "code" if shard_code_axis else None
  if mode == "fully-connected":
    dict_spec = P(code, None)
    codes_spec = P(axes, code)
  else:
    dict_spec = P(code, None, None, None)
    codes_spec = P(axes, code, None, None)
  batch_spec = P(axes) if mode == "fully-connected" else (
      P(axes, None, None, None))

  def sh(spec):
    return NamedSharding(mesh, spec)

  return jax.jit(
      step,
      in_shardings=(sh(dict_spec), sh(P(code)), sh(batch_spec),
                    sh(P()), sh(P()), sh(P())),
      out_shardings=(sh(dict_spec), sh(P(code)), sh(codes_spec)))


def build_dp_local_step(data_axis_size, mode, inference_alg, update_alg,
                        *, nonneg=False, hard_threshold=False,
                        kernel_stride=None, padding=None,
                        group_assignments=None, alignment_penalty=0.0,
                        renormalize=True, fc_formulation="gram",
                        lipschitz_method="eigvalsh", upd_num_iters=1,
                        lowest_code_val=0.001, axis_names=("data",),
                        early_stopping_epsilon=None):
  """The per-device body of the data-parallel fused step.

  Must execute inside a shard_map over a 'data' mesh axis of size
  ``data_axis_size``: it psums the dictionary gradient and Hessian
  statistics over that axis each update iteration.  Used by
  build_shard_map_train_step (single step) and by the scanned trainer's
  multi-chip mode (lax.scan of this body inside one shard_map).

  Signature: local_step(dictionary, hessian, batch_shard, sw,
  inf_num_iters, upd_stepsize) -> (new_dictionary, new_hessian, codes).

  ``early_stopping_epsilon``: the reference's batch-GLOBAL stop test
  (fc/ista_fista.py:135-144) under data parallelism -- the solver's
  while predicate pmean's the shard-local mean |delta| over
  ``axis_names`` (one scalar all-reduce per iteration), so all shards
  stop at the same iteration and the codes equal the single-device
  solve on the concatenated global batch.
  """
  is_subspace_inf = inference_alg.startswith("subspace")
  is_subspace_upd = update_alg.startswith("subspace")
  variant = inference_alg[9:] if is_subspace_inf else inference_alg
  uses_hessian = update_alg in ("sc_cheap_quadratic_descent",
                                "subspace_sc_cheap_quadratic_descent")
  data_size = int(data_axis_size)
  stop_axes = (tuple(axis_names)
               if early_stopping_epsilon is not None else None)
  early_eps = (None if early_stopping_epsilon is None
               else float(early_stopping_epsilon))

  if group_assignments is not None:
    code_size_hint = max(max(g) for g in group_assignments) + 1
    gather_inds, valid_mask = subspace_ista_fista.pack_group_indices(
        group_assignments, code_size_hint)

  def infer(dictionary, batch_shard, sw, n_it):
    if mode == "fully-connected":
      if is_subspace_inf:
        grouped = subspace_ista_fista.build_grouped_dictionary(
            dictionary, gather_inds, valid_mask)
        stepsize = lipschitz_ops.fista_stepsize(grouped, lipschitz_method)
        init = jnp.zeros((batch_shard.shape[0],) + gather_inds.shape,
                         batch_shard.dtype)
        return subspace_ista_fista._solve(
            batch_shard, grouped, gather_inds, valid_mask, sw, n_it,
            stepsize, init, variant, False, early_eps, fc_formulation,
            dictionary.shape[0], True, psum_axes=stop_axes)
      stepsize = lipschitz_ops.fista_stepsize(dictionary, lipschitz_method)
      init = jnp.zeros((batch_shard.shape[0], dictionary.shape[0]),
                       batch_shard.dtype)
      return fc_ista_fista._solve(
          batch_shard, dictionary, sw, n_it, stepsize, init, variant,
          nonneg, hard_threshold, early_eps, fc_formulation,
          psum_axes=stop_axes)
    flat = dictionary.reshape(dictionary.shape[0], -1)
    stepsize = lipschitz_ops.fista_stepsize(flat, lipschitz_method)
    sh_, sw_ = conv_ista_fista.code_spatial_dims(
        batch_shard.shape, dictionary.shape, kernel_stride)
    init = jnp.zeros(
        (batch_shard.shape[0], dictionary.shape[0], sh_, sw_),
        batch_shard.dtype)
    mask = conv_shapes.create_mask(batch_shard.shape, padding,
                                   batch_shard.dtype)
    pad_static = (None if padding is None else
                  tuple(tuple(int(x) for x in p) for p in padding))
    return conv_ista_fista._solve(
        batch_shard, dictionary, mask, sw, n_it, stepsize, init,
        tuple(kernel_stride), variant, nonneg, hard_threshold,
        early_eps, formulation="gram", padding=pad_static,
        psum_axes=stop_axes)

  def local_step(dictionary, hessian, batch_shard, sw, n_it, upd_step):
    with matmul_precision():
      codes = infer(dictionary, batch_shard, sw, n_it)
      local_b = batch_shard.shape[0]
      global_b = local_b * data_size
      if uses_hessian:
        if mode == "fully-connected":
          stat = jax.lax.psum(jnp.sum(codes**2, axis=0), axis_names)
        else:
          stat = jax.lax.psum(
              jnp.sum(codes**2, axis=(0, 2, 3)), axis_names)
        hessian = 0.99 * hessian + (stat / global_b) / 100.0

      if mode == "convolutional":
        from vtc_tpu.ops import conv_dict_gram
        mask = conv_shapes.create_mask(batch_shard.shape, padding,
                                       batch_shard.dtype)
        pad_static = (None if padding is None else
                      tuple(tuple(int(x) for x in p) for p in padding))
        if conv_dict_gram.supported(dictionary.shape,
                                    tuple(kernel_stride)):
          # code-space gradient: the D-independent autocorrelation
          # stats are computed once per step, outside the update loop
          stats = conv_dict_gram.build_dict_gradient_stats(
              batch_shard, codes, dictionary.shape,
              tuple(kernel_stride), pad_static)
          conv_grad = lambda d: conv_dict_gram.dictionary_gradient_from_stats(
              stats, d, tuple(kernel_stride))
        else:
          conv_grad = lambda d: conv_ops.dictionary_gradient(
              batch_shard, codes, d, kernel_stride, mask)

      def body(_, d):
        if mode == "fully-connected":
          local_grad = codes.T @ (codes @ d - batch_shard)
          grad = jax.lax.psum(local_grad, axis_names) / global_b
          if is_subspace_upd and alignment_penalty != 0:
            grad = grad + alignment_penalty * (
                alignment_regularization_gradients(
                    d, gather_inds, valid_mask, renormalize))
          if uses_hessian:
            grad = grad / (hessian + lowest_code_val)[:, None]
          d = d - upd_step * grad
          if renormalize:
            d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
          return d
        # convolutional: psum the batch-summed kernel gradient, then
        # apply the single-device epilogue (hessian scale, norm
        # rescale, renorm) on the GLOBAL gradient
        local_grad = conv_grad(d) * local_b
        grad = jax.lax.psum(local_grad, axis_names) / global_b
        if uses_hessian:
          grad = grad / (hessian + lowest_code_val)[:, None, None, None]
        grad = grad * (jnp.linalg.norm(d.ravel()) /
                       jnp.linalg.norm(grad.ravel()))
        d = d - upd_step * grad
        if renormalize:
          norms = jnp.sqrt(jnp.sum(d**2, axis=(1, 2, 3), keepdims=True))
          d = d / norms
        return d

      new_dict = jax.lax.fori_loop(0, upd_num_iters, body, dictionary)
      return new_dict, hessian, codes

  return local_step


def build_dp_fused_local_step(data_axis_size, inference_alg, update_alg,
                              *, nonneg=False, hard_threshold=False,
                              renormalize=True, upd_num_iters=1,
                              lowest_code_val=0.001, power_iters=12,
                              axis_names=("data",), interpret=None,
                              mxu="highest"):
  """Per-device body composing the fused Pallas solve with DP.

  Each device runs ONE kernel per step -- warm Lipschitz refresh + the
  whole VMEM-resident FISTA solve + its shard's gram-form update
  statistics (ops/pallas_train_step.fused_solve_stats_pallas) -- then
  the only cross-chip traffic is one psum of (C, B, hessian-stat) over
  ICI and the dictionary update runs replicated from the GLOBAL stats:
  grad at D' = (sum C @ D' - sum B) / global_b, exactly the
  single-device update for any number of update iterations.  fc only
  (the conv/subspace DP paths stay on build_dp_local_step).

  Signature: local_step(dictionary, hessian, eigvec, batch_shard, sw,
  inf_num_iters, upd_stepsize) -> (dict, hessian, eigvec, codes).
  The eigvec rides the caller's scan carry (replicated; the power
  refresh runs on the replicated dictionary so every shard computes
  the identical stepsize).
  """
  from vtc_tpu.ops.pallas_train_step import fused_solve_stats_pallas

  uses_hessian = update_alg == "sc_cheap_quadratic_descent"
  data_size = int(data_axis_size)

  def local_step(dictionary, hessian, eigvec, batch_shard, sw, n_it,
                 upd_step):
    codes, cmat, bmat, stat, eigvec, _ = fused_solve_stats_pallas(
        dictionary, eigvec, batch_shard, sw, n_it,
        variant=inference_alg, nonneg=nonneg, hard=hard_threshold,
        power_iters=power_iters, mxu=mxu,
        interpret=(jax.default_backend() != "tpu"
                   if interpret is None else interpret))
    global_b = batch_shard.shape[0] * data_size
    cmat = jax.lax.psum(cmat, axis_names)
    bmat = jax.lax.psum(bmat, axis_names)
    with matmul_precision():
      if uses_hessian:
        hessian = 0.99 * hessian + (
            jax.lax.psum(stat, axis_names) / global_b) / 100.0

      def body(_, d):
        grad = (cmat @ d - bmat) / global_b
        if uses_hessian:
          grad = grad / (hessian + lowest_code_val)[:, None]
        d = d - upd_step * grad
        if renormalize:
          d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        return d

      new_dict = jax.lax.fori_loop(0, upd_num_iters, body, dictionary)
    return new_dict, hessian, eigvec, codes

  return local_step


def build_dp_group_fused_local_step(data_axis_size, inference_alg,
                                    update_alg, *, group_assignments,
                                    alignment_penalty=0.0,
                                    hard_threshold=False,
                                    renormalize=True, upd_num_iters=1,
                                    lowest_code_val=0.001,
                                    power_iters=12,
                                    axis_names=("data",),
                                    interpret=None, mxu="highest"):
  """Subspace (group-sparse) counterpart of build_dp_fused_local_step.

  Each device runs ONE kernel per step -- warm grouped-Lipschitz
  refresh + the whole VMEM-resident group FISTA solve + its shard's
  gram-form statistics over the summed (b, s) codes
  (ops/pallas_train_step.fused_group_solve_stats_pallas) -- then one
  psum of (C, B, hessian-stat) over ICI and the subspace dictionary
  update runs replicated.  The anti-alignment regularizer depends only
  on the (replicated) dictionary, so it adds no cross-chip traffic
  (reference semantics: dict_update_rules/fully_connected/
  subspace_sc_cheap_quadratic_descent.py:62-89).

  Signature: local_step(dictionary, hessian, eigvec, batch_shard, sw,
  inf_num_iters, upd_stepsize) -> (dict, hessian, eigvec, codes).
  ``eigvec`` is the GROUPED Gram's warm eigenvector
  (min(G*M, n),) -- seed with top_gram_eigenpair(grouped_dictionary).
  """
  from vtc_tpu.ops.pallas_train_step import fused_group_solve_stats_pallas

  variant = inference_alg[9:]  # subspace_ista / subspace_fista
  uses_hessian = update_alg == "subspace_sc_cheap_quadratic_descent"
  data_size = int(data_axis_size)
  groups = tuple(tuple(int(m) for m in g) for g in group_assignments)
  code_size_hint = max(max(g) for g in groups) + 1
  gather_inds, valid_mask = subspace_ista_fista.pack_group_indices(
      groups, code_size_hint)

  def local_step(dictionary, hessian, eigvec, batch_shard, sw, n_it,
                 upd_step):
    codes, cmat, bmat, stat, eigvec, _ = fused_group_solve_stats_pallas(
        dictionary, eigvec, batch_shard, sw, n_it,
        group_assignments=groups, variant=variant,
        hard=hard_threshold, power_iters=power_iters,
        mxu=mxu,
        interpret=(jax.default_backend() != "tpu"
                   if interpret is None else interpret))
    global_b = batch_shard.shape[0] * data_size
    cmat = jax.lax.psum(cmat, axis_names)
    bmat = jax.lax.psum(bmat, axis_names)
    with matmul_precision():
      if uses_hessian:
        hessian = 0.99 * hessian + (
            jax.lax.psum(stat, axis_names) / global_b) / 100.0

      def body(_, d):
        grad = (cmat @ d - bmat) / global_b
        if alignment_penalty != 0:
          grad = grad + alignment_penalty * (
              alignment_regularization_gradients(
                  d, gather_inds, valid_mask, renormalize))
        if uses_hessian:
          grad = grad / (hessian + lowest_code_val)[:, None]
        d = d - upd_step * grad
        if renormalize:
          d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        return d

      new_dict = jax.lax.fori_loop(0, upd_num_iters, body, dictionary)
    return new_dict, hessian, eigvec, codes

  return local_step


def build_dp_conv_fused_local_step(data_axis_size, inference_alg,
                                   update_alg, *, kernel_stride,
                                   padding, nonneg=False,
                                   hard_threshold=False,
                                   renormalize=True,
                                   upd_num_iters=1,
                                   lowest_code_val=0.001,
                                   power_iters=12,
                                   axis_names=("data",),
                                   interpret=None, mxu="highest"):
  """Convolutional counterpart of build_dp_fused_local_step.

  Each device runs ONE stride-block-space kernel per step -- warm
  Lipschitz refresh + the whole VMEM-resident conv FISTA solve + its
  shard's unaveraged block-space update statistics
  (ops/pallas_conv_train.conv_solve_stats_pallas) -- then the only
  cross-chip traffic is one psum of the stats over ICI and the
  dictionary update runs replicated (reference dict_update_rules/
  convolutional/sc_cheap_quadratic_descent.py:64-79 semantics:
  Hessian scaling, THEN Frobenius-norm rescale, per-kernel renorm).
  With upd_num_iters == 1 the psum'd quantity is the gradient itself
  (exact at the solve dictionary, any mask); with more iterations the
  shards psum the gram-form stats (C_m, B_x) -- requires a
  stride-block-uniform mask -- and every iteration's gradient is the
  exact (D' C_m - B_x)/global_b recombination.

  Signature: local_step(dictionary, hessian, eigvec, batch_shard, sw,
  inf_num_iters, upd_stepsize) -> (dict, hessian, eigvec, codes).
  """
  from vtc_tpu.ops.pallas_conv_direct import (_geometry, _pack_weights,
                                              _unpack_dstk)
  from vtc_tpu.ops.pallas_conv_train import conv_solve_stats_pallas

  uses_hessian = update_alg == "sc_cheap_quadratic_descent"
  data_size = int(data_axis_size)
  upd_num_iters = int(upd_num_iters)
  gram_stats = upd_num_iters > 1

  def local_step(dictionary, hessian, eigvec, batch_shard, sw, n_it,
                 upd_step):
    interp = (jax.default_backend() != "tpu" if interpret is None
              else interpret)
    global_b = batch_shard.shape[0] * data_size
    if gram_stats:
      codes, bx, cm, stat, eigvec, _ = conv_solve_stats_pallas(
          dictionary, eigvec, batch_shard, sw, n_it,
          kernel_stride=kernel_stride, padding=padding,
          variant=inference_alg, nonneg=nonneg, hard=hard_threshold,
          power_iters=power_iters, gram_stats=True, interpret=interp,
          mxu=mxu)
      bx = jax.lax.psum(bx, axis_names)
      cm = jax.lax.psum(cm, axis_names)
      geo = _geometry(batch_shard.shape, dictionary.shape,
                      tuple(kernel_stride))
      grad_fn = lambda d: _unpack_dstk(
          (jnp.dot(_pack_weights(d, geo)[0], cm,
                   precision=jax.lax.Precision.HIGHEST) - bx)
          / global_b, geo, dictionary.shape)
    else:
      codes, grad_sum, stat, eigvec, _ = conv_solve_stats_pallas(
          dictionary, eigvec, batch_shard, sw, n_it,
          kernel_stride=kernel_stride, padding=padding,
          variant=inference_alg, nonneg=nonneg, hard=hard_threshold,
          power_iters=power_iters, interpret=interp,
          mxu=mxu)
      grad0 = jax.lax.psum(grad_sum, axis_names) / global_b
      grad_fn = lambda d: grad0
    with matmul_precision():
      if uses_hessian:
        hessian = 0.99 * hessian + (
            jax.lax.psum(stat, axis_names) / global_b) / 100.0
        scale = (hessian + lowest_code_val)[:, None, None, None]

      # mirrors dict_update_rules/convolutional/*._update's body
      # (Hessian scaling THEN Frobenius rescale, per-kernel renorm) --
      # that loop takes a codes/images pair, this one the psum'd
      # grad_fn; keep the two in sync
      def body(_, d):
        grad = grad_fn(d)
        if uses_hessian:
          grad = grad / scale
        grad = grad * (jnp.linalg.norm(d.ravel())
                       / jnp.maximum(jnp.linalg.norm(grad.ravel()),
                                     1e-30))
        d = d - upd_step * grad
        if renormalize:
          norms = jnp.sqrt(jnp.sum(d ** 2, axis=(1, 2, 3),
                                   keepdims=True))
          d = d / norms
        return d

      new_dict = jax.lax.fori_loop(0, upd_num_iters, body, dictionary)
    return new_dict, hessian, eigvec, codes

  return local_step


def build_shard_map_train_step(mesh, mode, inference_alg, update_alg,
                               **config):
  """Explicit shard_map data-parallel fused step (see module docstring).

  Signature of the returned compiled callable:
    step(dictionary, hessian, batch, sparsity_weight, inf_num_iters,
         upd_stepsize) -> (new_dictionary, new_hessian, codes)
  ``batch`` is the GLOBAL batch; it gets sharded over the 'data' axis
  (the leading dim must be divisible by the axis size).  Outputs:
  dictionary/hessian replicated, codes sharded like the batch.
  """
  from vtc_tpu.parallel.mesh import dp_axes
  axes = dp_axes(mesh)
  size = 1
  for a in axes:
    size *= mesh.shape[a]
  local_step = build_dp_local_step(
      size, mode, inference_alg, update_alg, axis_names=axes, **config)
  if mode == "fully-connected":
    batch_spec, codes_spec = P(axes, None), P(axes, None)
    dict_spec = P(None, None)
  else:
    batch_spec = P(axes, None, None, None)
    codes_spec = P(axes, None, None, None)
    dict_spec = P(None, None, None, None)

  sharded = jax.shard_map(
      local_step, mesh=mesh,
      in_specs=(dict_spec, P(None), batch_spec, P(), P(), P()),
      out_specs=(dict_spec, P(None), codes_spec),
      check_vma=False)
  return jax.jit(sharded)
