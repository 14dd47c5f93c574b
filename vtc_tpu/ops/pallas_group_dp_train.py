"""Whole DATA-PARALLEL subspace (group-sparse) training segments as one
Pallas kernel per chip.

The group-sparse counterpart of ops/pallas_dp_train: round 3's fused-DP
composition for the subspace family ran one group solve+stats kernel
launch per step with an XLA psum + update epilogue between launches
(parallel/data_parallel.build_dp_group_fused_local_step) -- paying the
per-step launch + epilogue HBM round-trips that cost the fc path ~40%
of single-chip speed before its whole-segment kernel (BENCH_NOTES
UPDATE 10).  This module removes that overhead for groups: each chip
runs its ENTIRE segment as ONE kernel, and the per-step cross-chip
reduction of the gram-form update statistics rides IN-KERNEL remote
DMAs (ops/pallas_collective deterministic slot all-reduce -- fixed-
order sum, so the replicated dictionary / Hessian EMA / eigenvector
stay bitwise identical across the mesh).

Per step on every chip (grid = (num_steps,)):
  grouped-dictionary build + grouped-Gram power refresh (identical on
    every chip -- depends only on the replicated dictionary;
    ops/pallas_train_step._make_group_kernel is the single-chip
    formulation)
  VMEM-resident group FISTA solve of the LOCAL batch shard
    (group-norm shrinkage via the static 0/1 expand matmuls)
  local gram-form stats over the SUMMED (b, s) codes:
    C = codes^T codes, B = codes^T X, hessian stat
  in-kernel all-to-all + fixed-order slot sum -> GLOBAL stats
  subspace update from the global stats: grad at any D' is
    (C D' - B) / global_b (+ the anti-alignment regularizer, which
    depends only on the replicated dictionary and so needs no
    communication), Hessian-EMA scaling, renormalization -- reference
    semantics dict_update_rules/fully_connected/
    subspace_sc_cheap_quadratic_descent.py:62-89,
    training/sparse_coding.py:142-168 (every step's update sees the
    GLOBAL batch statistics).

Same shard_map / axis restrictions and interpret-mode spare-thread
caveat as ops/pallas_dp_train (see that module's docstring).
"""
import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vtc_tpu.ops.pallas_collective import (butterfly_comm_shapes,
                                           comm_scratch_shapes,
                                           slot_allreduce, slot_exchange,
                                           staged_butterfly_allreduce)
from vtc_tpu.ops.pallas_dp_train import _is_pow2
from vtc_tpu.ops.pallas_common import (LANES as _LANES,
                                       SUBLANES as _SUBLANES, round_up)
from vtc_tpu.ops.pallas_train_step import (_dot, _dot_b, _dot_t,
                                           _dot_t_b, _make_group_prox,
                                           _make_iter_dot, _pin_hbm,
                                           _tdot, _group_vmem_bytes,
                                           group_expand_matrix,
                                           group_selection_matrix,
                                           roll_prox_window)

_GDP_VMEM_BUDGET_BYTES = 24 * 1024 * 1024
_GDP_VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def _pack_dims(s_pad, n_pad):
  """Packed comm slot, identical layout to pallas_dp_train: rows
  [0:s_pad] = [C | B], row block [s_pad:+8] carries the hessian stat
  in its first row."""
  return s_pad + _SUBLANES, s_pad + n_pad


def fused_group_dp_segment_supported(batch_shard_size, code_size,
                                     input_size, group_assignments,
                                     num_devices):
  """True when the whole-segment group-DP kernel covers this per-shard
  geometry: the single-chip group segment state plus the gram-form
  stats and the double-buffered comm slots fit the DP budget."""
  num_groups = len(group_assignments)
  max_gs = max(len(g) for g in group_assignments)
  gm = num_groups * max_gs
  s_pad = round_up(code_size, _LANES)
  n_pad = round_up(input_size, _LANES)
  b_pad = round_up(batch_shard_size, _SUBLANES)
  rows, cols = _pack_dims(s_pad, n_pad)
  base = _group_vmem_bytes(
      b_pad, s_pad, n_pad, round_up(gm, _LANES),
      round_up(num_groups, _LANES), gm > input_size)
  from vtc_tpu.ops.pallas_dp_train import _comm_slots
  comm = 4 * (s_pad * s_pad + s_pad * n_pad          # summed C, B
              + _comm_slots(num_devices) * rows * cols)  # comm slots
  return base + comm <= _GDP_VMEM_BUDGET_BYTES


def _make_group_dp_kernel(variant, hard, uses_hessian, renormalize,
                          upd_num_iters, power_iters, use_n_gram,
                          lowest_code_val, use_reg, axis_name,
                          num_devices, s_pad, n_pad, mxu="highest",
                          early_eps=None, roll_m=None,
                          gsel_identity=False):
  use_fista = variant == "fista"
  prep_gram, iter_dot = _make_iter_dot(mxu)
  bind_prox = _make_group_prox(mxu, hard, roll_m)
  dot_ = _dot_b if mxu == "bf16" else _dot
  dot_t_ = _dot_t_b if mxu == "bf16" else _dot_t
  has_stop_comm = early_eps is not None and num_devices > 1
  use_gsel = not gsel_identity
  use_expand = roll_m is None

  def _kernel(*refs):
    it = iter(refs)
    niter_ref, scalars_ref, d_ref, h_ref, v_ref = (
        next(it), next(it), next(it), next(it), next(it))
    gsel_hbm = next(it) if use_gsel else None
    expand_hbm = next(it) if use_expand else None
    comem_hbm = next(it) if use_reg else None
    x_ref, d_out, h_out, v_out, codes_out = (
        next(it), next(it), next(it), next(it), next(it))
    d_pin = next(it)
    gsel_vmem = next(it) if use_gsel else None
    expand_vmem = next(it) if use_expand else None
    comem_vmem = next(it) if use_reg else None
    sems = next(it)
    comm_refs = tuple(it)
    if has_stop_comm:
      scomm, ssend, srecv, sphase = comm_refs[-4:]
      comm_refs = comm_refs[:-4]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
      # segment-constant operands ride pl.ANY (see
      # pallas_train_step._pin_hbm): DMA into scratch once; d then
      # copies into its carry output block
      _pin_hbm(d_ref, d_pin, sems.at[0])
      d_out[:] = d_pin[:]
      if use_gsel:
        _pin_hbm(gsel_hbm, gsel_vmem, sems.at[1])
      if use_expand:
        _pin_hbm(expand_hbm, expand_vmem, sems.at[2])
      if use_reg:
        _pin_hbm(comem_hbm, comem_vmem, sems.at[3])
      h_out[:] = h_ref[:]
      v_out[:] = v_ref[:]
      if has_stop_comm:
        sphase[0] = 0

    num_iters = niter_ref[0]
    sw = scalars_ref[0]
    upd_step = scalars_ref[1]
    inv_global_b = scalars_ref[2]

    dictionary = d_out[:]
    gsel = gsel_vmem[:] if use_gsel else None
    expand = expand_vmem[:] if use_expand else None
    images = x_ref[0]
    grouped = (_dot(gsel, dictionary) if use_gsel
               else dictionary)                   # (GM_pad, n_pad)
    gram = _dot_t(grouped, grouped)               # (GM_pad, GM_pad)
    power_gram = _tdot(grouped, grouped) if use_n_gram else gram

    v = v_out[:]
    v = v / jnp.sqrt(jnp.sum(v * v))

    def power_body(_, vec):
      w = _dot(vec, power_gram)
      return w / jnp.sqrt(jnp.sum(w * w))

    v = jax.lax.fori_loop(0, power_iters, power_body, v)
    v_out[:] = v
    eta = 1.0 / jnp.sum(_dot(v, power_gram) * v)
    lam_eta = sw * eta

    corr = dot_t_(images, grouped)                # (b_pad, GM_pad)
    prox = bind_prox(expand, lam_eta, corr.shape)

    neg_eta_gram = prep_gram(-eta * gram)
    corr_eta = eta * corr
    init = jnp.zeros_like(corr)

    def fista_body(_, carry):
      z, old, t_k = carry
      codes = prox(z + iter_dot(z, neg_eta_gram) + corr_eta)
      if use_fista:
        t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t_k * t_k)) / 2.0
        beta = (t_k - 1.0) / t_next
        return codes + beta * (codes - old), codes, t_next
      return codes, codes, t_k

    if early_eps is None:
      _, grouped_codes, _ = jax.lax.fori_loop(
          0, num_iters, fista_body, (init, init, jnp.float32(1.0)))
    else:
      # reference stop rule on the GROUPED tensor, batch-GLOBAL under
      # DP (same in-kernel construction as ops/pallas_dp_train: the
      # shard |delta| sums all-reduce in a small (8, 128) comm family
      # with a running SMEM phase, so every chip takes the identical
      # trip count); mean over the REAL global b * G * M count
      # (padded slots are exact zeros every iteration)
      inv_gcount = scalars_ref[4]

      def stop_reduce(local):
        if num_devices == 1:
          return local
        payload = jnp.pad(local.reshape(1, 1),
                          ((0, _SUBLANES - 1), (0, _LANES - 1)))
        phase = jax.lax.rem(sphase[0], 2)
        sphase[0] = sphase[0] + 1
        total = slot_allreduce(
            scomm, ssend, srecv, payload, phase=phase,
            my_idx=jax.lax.axis_index(axis_name),
            num_devices=num_devices)
        return total[0, 0]

      def stop_cond(carry):
        j, _, _, _, _, stop = carry
        return jnp.logical_and(j < num_iters, jnp.logical_not(stop))

      def stop_body(carry):
        j, z, old, _, t_k, _ = carry
        z_next, codes, t_next = fista_body(None, (z, old, t_k))
        total = stop_reduce(jnp.sum(jnp.abs(codes - old)))
        avg_delta = (total * inv_gcount) / eta
        stop = jnp.logical_and(avg_delta < early_eps, j > 0)
        return j + 1, z_next, codes, codes, t_next, stop

      _, _, _, grouped_codes, _, _ = jax.lax.while_loop(
          stop_cond, stop_body,
          (jnp.int32(0), init, init, init, jnp.float32(1.0),
           jnp.bool_(False)))
    codes = (dot_(grouped_codes, gsel) if use_gsel
             else grouped_codes)                  # (b_pad, s_pad) summed
    codes_out[:] = codes

    # local gram-form stats (HIGHEST in every tier: they feed the
    # cancellation-prone C D' - B update)
    cmat = _tdot(codes, codes)                    # (s_pad, s_pad)
    bmat = _tdot(codes, images)                   # (s_pad, n_pad)
    stat = jnp.sum(codes * codes, axis=0, keepdims=True)

    if num_devices > 1:
      comm, send_sem, recv_sem = comm_refs
      phase = jax.lax.rem(step, 2)
      my_idx = jax.lax.axis_index(axis_name)
      if _is_pow2(num_devices):
        # O(log P) butterfly all-reduce (see ops/pallas_collective and
        # ops/pallas_dp_train -- same staging layout, slot 0)
        comm[0, 0:s_pad, 0:s_pad] = cmat
        comm[0, 0:s_pad, s_pad:s_pad + n_pad] = bmat
        comm[0, s_pad:s_pad + 1, 0:s_pad] = stat
        total = staged_butterfly_allreduce(
            comm, send_sem, recv_sem, phase=phase, my_idx=my_idx,
            num_devices=num_devices)
      else:
        comm[phase, my_idx, 0:s_pad, 0:s_pad] = cmat
        comm[phase, my_idx, 0:s_pad, s_pad:s_pad + n_pad] = bmat
        comm[phase, my_idx, s_pad:s_pad + 1, 0:s_pad] = stat
        slot_exchange(comm, send_sem, recv_sem, phase=phase,
                      my_idx=my_idx, num_devices=num_devices)
        total = comm[phase, 0]
        for slot in range(1, num_devices):
          total = total + comm[phase, slot]
      cmat = total[0:s_pad, 0:s_pad]
      bmat = total[0:s_pad, s_pad:s_pad + n_pad]
      stat = total[s_pad:s_pad + 1, 0:s_pad]

    if uses_hessian:
      hessian = 0.99 * h_out[:] + (stat * inv_global_b) / 100.0
      h_out[:] = hessian
      scale = jnp.transpose(hessian) + lowest_code_val

    def update_body(_, d):
      grad = (_dot(cmat, d) - bmat) * inv_global_b
      if use_reg:
        # anti-alignment regularizer, unit-norm form (see
        # ops/pallas_train_step._make_group_kernel); replicated-
        # dictionary-only, so no communication
        penalty = scalars_ref[3]
        cos = _dot_t(d, d)
        smat = comem_vmem[:] * jnp.sign(cos)
        reg = (_dot(smat, d)
               - jnp.sum(smat * cos, axis=1, keepdims=True) * d)
        grad = grad + penalty * reg
      if uses_hessian:
        grad = grad / scale
      d = d - upd_step * grad
      if renormalize:
        norms = jnp.sqrt(jnp.sum(d * d, axis=1, keepdims=True))
        d = d / jnp.maximum(norms, 1e-30)
      return d

    d_out[:] = jax.lax.fori_loop(0, upd_num_iters, update_body,
                                 dictionary)

  if use_reg:
    return _kernel

  return _kernel


def fused_group_dp_train_segment_pallas(
    dictionary, hessian, eigvec, batches, sparsity_weight,
    inf_num_iters, upd_stepsize, *, group_assignments, axis_name,
    axis_size, variant="fista",
    update_alg="subspace_sc_cheap_quadratic_descent", upd_num_iters=1,
    hard=False, renormalize=True, power_iters=12, lowest_code_val=0.001,
    alignment_penalty=0.0, interpret=False, mxu="highest",
    early_stopping_epsilon=None):
  """Run `batches.shape[0]` DP subspace train steps in ONE kernel
  launch per chip.  Call inside a shard_map over ``axis_name`` (the
  mesh's only non-trivial axis); ``batches`` is this chip's
  (k, b_shard, n) shard; ``eigvec`` the GROUPED Gram's warm
  eigenvector (dim min(G*M, n)).  Semantics == lax.scan of
  [fused_group_solve_stats_pallas -> psum -> replicated subspace
  update] (build_dp_group_fused_local_step) with the launch + epilogue
  overhead removed.

  Returns (new_dictionary, new_hessian, new_eigvec, last_codes_shard).
  """
  use_reg = float(alignment_penalty) != 0.0
  if use_reg:
    assert renormalize, (
        "the in-kernel anti-alignment regularizer uses the unit-norm "
        "gradient form; renormalize=False stays on the XLA path")
  k, b, n = batches.shape
  s = dictionary.shape[0]
  num_devices = int(axis_size)
  groups = tuple(tuple(int(m) for m in g) for g in group_assignments)
  num_groups = len(groups)
  max_gs = max(len(g) for g in groups)
  gm = num_groups * max_gs
  gsel = group_selection_matrix(groups, s)
  expand = group_expand_matrix(groups)
  use_n_gram = gm > n
  dim = n if use_n_gram else gm

  s_pad = round_up(s, _LANES)
  n_pad = round_up(n, _LANES)
  gm_pad = round_up(gm, _LANES)
  g_pad = round_up(num_groups, _LANES)
  dim_pad = round_up(dim, _LANES)
  b_pad = round_up(b, _SUBLANES)
  uses_hessian = update_alg == "subspace_sc_cheap_quadratic_descent"
  if not fused_group_dp_segment_supported(b, s, n, groups, num_devices):
    raise ValueError("shapes exceed the group DP segment kernel's VMEM "
                     "budget; use the per-step fused-DP path")

  d_in = jnp.pad(jnp.asarray(dictionary, jnp.float32),
                 ((0, s_pad - s), (0, n_pad - n)))
  h_in = jnp.pad(jnp.asarray(hessian, jnp.float32).reshape(1, s),
                 ((0, 0), (0, s_pad - s)))
  v_in = jnp.pad(jnp.asarray(eigvec, jnp.float32).reshape(1, dim),
                 ((0, 0), (0, dim_pad - dim)))
  gsel_in = jnp.pad(jnp.asarray(gsel),
                    ((0, gm_pad - gm), (0, s_pad - s)))
  expand_in = jnp.pad(jnp.asarray(expand, jnp.float32),
                      ((0, gm_pad - gm), (0, g_pad - num_groups)))
  x_in = jnp.pad(jnp.asarray(batches, jnp.float32),
                 ((0, 0), (0, b_pad - b), (0, n_pad - n)))

  scalars = jnp.stack([jnp.asarray(sparsity_weight, jnp.float32),
                       jnp.asarray(upd_stepsize, jnp.float32),
                       jnp.float32(1.0 / (b * num_devices)),
                       jnp.asarray(alignment_penalty, jnp.float32),
                       # global REAL grouped element count for the
                       # early-stop mean (b_global * G * M)
                       jnp.float32(1.0 / (b * num_devices * gm))])
  niter = jnp.asarray(inf_num_iters, jnp.int32).reshape(1)

  if use_reg:
    comem = np.zeros((s, s), np.float32)
    for g in groups:
      for gi_ in g:
        for gj_ in g:
          if gi_ != gj_:
            comem[gi_, gj_] += 1.0
    comem_in = jnp.pad(jnp.asarray(comem),
                       ((0, s_pad - s), (0, s_pad - s)))

  roll_m = roll_prox_window(groups)
  gsel_identity = bool(gm == s and np.array_equal(gsel, np.eye(s)))
  kernel = _make_group_dp_kernel(
      variant, bool(hard), uses_hessian, bool(renormalize),
      int(upd_num_iters), int(power_iters), use_n_gram,
      float(lowest_code_val), use_reg, axis_name, num_devices, s_pad,
      n_pad, mxu=str(mxu),
      early_eps=(None if early_stopping_epsilon is None
                 else float(early_stopping_epsilon)),
      roll_m=roll_m, gsel_identity=gsel_identity)
  use_gsel = not gsel_identity
  use_expand = roll_m is None
  any_spec = pl.BlockSpec(memory_space=pl.ANY)
  pin_specs, pin_args, pin_scratch = [], [], []
  if use_gsel:
    pin_specs.append(any_spec)
    pin_args.append(gsel_in)
    pin_scratch.append(pltpu.VMEM((gm_pad, s_pad), jnp.float32))
  if use_expand:
    pin_specs.append(any_spec)
    pin_args.append(expand_in)
    pin_scratch.append(pltpu.VMEM((gm_pad, g_pad), jnp.float32))
  if use_reg:
    pin_specs.append(any_spec)
    pin_args.append(comem_in)
    pin_scratch.append(pltpu.VMEM((s_pad, s_pad), jnp.float32))
  rows, cols = _pack_dims(s_pad, n_pad)
  const = lambda i, *_: (0, 0)
  cost = pl.CostEstimate(
      flops=2 * k * (gm_pad * s_pad * n_pad + gm_pad * gm_pad * n_pad
                     + b_pad * n_pad * gm_pad
                     + 30 * b_pad * gm_pad * gm_pad
                     + 2 * upd_num_iters * s_pad * s_pad * n_pad),
      bytes_accessed=4 * k * (b_pad * n_pad + b_pad * s_pad),
      transcendentals=0)
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=2,
      grid=(k,),
      in_specs=[
          any_spec,  # d: pinned at step 0
          pl.BlockSpec((1, s_pad), const),
          pl.BlockSpec((1, dim_pad), const),
      ] + pin_specs + [
          pl.BlockSpec((1, b_pad, n_pad), lambda i, *_: (i, 0, 0)),
      ],
      out_specs=[
          pl.BlockSpec((s_pad, n_pad), const),
          pl.BlockSpec((1, s_pad), const),
          pl.BlockSpec((1, dim_pad), const),
          pl.BlockSpec((b_pad, s_pad), const),
      ],
      scratch_shapes=([pltpu.VMEM((s_pad, n_pad), jnp.float32)]
                      + pin_scratch
                      + [pltpu.SemaphoreType.DMA((4,))]
                      + ((butterfly_comm_shapes(num_devices, (rows, cols))
                          if _is_pow2(num_devices)
                          else comm_scratch_shapes(num_devices,
                                                   (rows, cols)))
                         if num_devices > 1 else [])
                      + (comm_scratch_shapes(num_devices,
                                             (_SUBLANES, _LANES))
                         + [pltpu.SMEM((1,), jnp.int32)]
                         if (early_stopping_epsilon is not None
                             and num_devices > 1) else [])))
  d_new, h_new, v_new, codes = pl.pallas_call(
      kernel, grid_spec=grid_spec,
      out_shape=[
          jax.ShapeDtypeStruct((s_pad, n_pad), jnp.float32),
          jax.ShapeDtypeStruct((1, s_pad), jnp.float32),
          jax.ShapeDtypeStruct((1, dim_pad), jnp.float32),
          jax.ShapeDtypeStruct((b_pad, s_pad), jnp.float32),
      ],
      interpret=pltpu.InterpretParams() if interpret else False,
      cost_estimate=cost,
      compiler_params=None if interpret else pltpu.CompilerParams(
          vmem_limit_bytes=_GDP_VMEM_LIMIT_BYTES),
  )(niter, scalars, d_in, h_in, v_in, *pin_args, x_in)
  return (d_new[:s, :n], h_new[0, :s], v_new[0, :dim], codes[:b, :s])
