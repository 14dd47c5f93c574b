"""Whole DATA-PARALLEL conv training segments as one Pallas kernel per
chip.

Convolutional counterpart of ops/pallas_dp_train: round 3's conv DP ran
one stride-block solve+stats kernel launch per step with an XLA psum +
update epilogue between launches
(parallel/data_parallel.build_dp_conv_fused_local_step), paying the
per-step launch + epilogue HBM round-trips measured at ~40% of
single-chip speed on the fc family (BENCH_NOTES UPDATE 10).  Here each
chip runs its ENTIRE segment as ONE kernel in the stride-block-space
formulation of ops/pallas_conv_train, and the per-step cross-chip
reduction of the update statistics rides IN-KERNEL remote DMAs
(ops/pallas_collective deterministic slot all-reduce -- fixed-order
sum, so the replicated packed dictionary / Hessian EMA / eigenvector
stay bitwise identical across the mesh).

Per step on every chip (grid = (num_steps,), the LOCAL batch shard is
one tile -- per-chip shards are small by construction, gated by
`fused_conv_dp_segment_supported`):
  dall build + flat-kernel-Gram power refresh (identical on every
    chip -- replicated dictionary only)
  VMEM-resident conv FISTA solve of the LOCAL shard's image-block
    canvas (ops/pallas_conv_train._make_tile_solver)
  local block-space stats: with upd_num_iters == 1 the unaveraged
    masked-residual gradient G = (mask*(D Z) - X) Z^T (additive over
    shards, exact at the solve dictionary); with more iterations the
    gram-form pair C_m = (Z o m) Z^T, B_x = X Z^T (needs a
    stride-block-uniform mask, ops/pallas_conv_train
    .gram_stats_supported) -- plus the Hessian stat row
  in-kernel all-to-all + fixed-order slot sum -> GLOBAL stats
  replicated update from the global stats (Hessian scaling THEN
    Frobenius rescale, per-kernel renorm, optional real-support
    projection for zero-extended kernels) -- reference semantics
    dict_update_rules/convolutional/sc_steepest_descent.py:59-73,
    sc_cheap_quadratic_descent.py:64-79, training/sparse_coding.py:
    142-168 (every step's update sees the GLOBAL batch statistics).

Same shard_map / axis restrictions and interpret-mode spare-thread
caveat as ops/pallas_dp_train (see that module's docstring).
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vtc_tpu.ops.pallas_collective import (butterfly_comm_shapes,
                                           comm_scratch_shapes,
                                           slot_allreduce,
                                           slot_exchange,
                                           staged_butterfly_allreduce)
from vtc_tpu.ops.pallas_common import (LANES as _LANES,
                                       SUBLANES as _SUBLANES, round_up)
from vtc_tpu.ops.pallas_dp_train import _comm_slots, _is_pow2
from vtc_tpu.ops.pallas_train_step import _pin_hbm
from vtc_tpu.ops.pallas_conv_direct import (_VMEM_LIMIT,
                                            _block_mask_canvas,
                                            _geometry, _pack_weights,
                                            _to_canvas, _unpack_dstk)
from vtc_tpu.ops.pallas_conv_train import (_build_dall, _dot, _dot_t,
                                           _make_tile_solver,
                                           _placement_matrices,
                                           _power_refresh,
                                           _segment_canvases,
                                           _selection_matrices,
                                           _pick_tile,
                                           fused_conv_segment_supported,
                                           gram_stats_supported)


def _slot_layout(geo, gram):
  """(rows, cols, off_bx/gsum, off_stat): SUBLANE-aligned row sections
  of the packed comm slot.  gram: [C_m | B_x | stat]; else
  [G_sum | stat]."""
  s, cpx, r = geo["s"], geo["cpx"], geo["r"]
  cols = r * s
  if gram:
    off_bx = round_up(r * s, _SUBLANES)
    off_stat = off_bx + round_up(cpx, _SUBLANES)
  else:
    off_bx = 0
    off_stat = round_up(cpx, _SUBLANES)
  return off_stat + _SUBLANES, cols, off_bx, off_stat


def fused_conv_dp_segment_supported(img_shard_shape, dict_shape,
                                    kernel_stride, inference_alg,
                                    update_alg, num_devices, *,
                                    upd_num_iters=1, padding=None,
                                    early_stopping_epsilon=None):
  """True when the whole-segment conv-DP kernel covers this PER-SHARD
  geometry: the shard solves as a single batch tile, multi-iteration
  updates have exact gram-form stats, and the comm slots fit next to
  the solve working set.  Early stopping adds only the small
  (8, 128)-slot stop comm family (the shard is one tile by
  construction, so the batch-global stop test is always exact here)."""
  if not fused_conv_segment_supported(
      img_shard_shape, dict_shape, kernel_stride, inference_alg,
      update_alg, upd_num_iters=upd_num_iters, padding=padding):
    return False
  kernel_stride = tuple(int(x) for x in kernel_stride)
  geo = _geometry(img_shard_shape, dict_shape, kernel_stride)
  b = img_shard_shape[0]
  tile, num_tiles = _pick_tile(b, geo)
  if num_tiles != 1:
    return False  # whole shard must be one tile
  gram = int(upd_num_iters) > 1
  if gram and not gram_stats_supported(
      img_shard_shape, dict_shape, kernel_stride,
      None if padding is None else
      tuple(tuple(int(x) for x in p) for p in padding)):
    return False
  rows, cols, _, _ = _slot_layout(geo, gram)
  comm = 4 * _comm_slots(num_devices) * rows * cols
  if early_stopping_epsilon is not None and int(num_devices) > 1:
    comm += 4 * 2 * int(num_devices) * _SUBLANES * _LANES
  # the solve working set must still fit with the comm slots resident
  s, cpx, r = geo["s"], geo["cpx"], geo["r"]
  brows = 6 * s + 3 * cpx + r * max(s, cpx)
  fixed = 4 * (r * s) ** 2 if gram else 0
  return (4 * brows * b * geo["ells"] * 2.8 + fixed + comm
          <= int(_VMEM_LIMIT * 0.9))


def _make_conv_dp_kernel(variant, nonneg, hard, uses_hessian,
                         renormalize, upd_num_iters, power_iters,
                         lowest_code_val, geo, batch_tile, gram_update,
                         has_supp, axis_name, num_devices,
                         mxu="highest", early_eps=None):
  s, cpx, r = geo["s"], geo["cpx"], geo["r"]
  rolls = geo["rolls"]
  tl = batch_tile * geo["ells"]
  solve_tile = _make_tile_solver(variant, nonneg, hard, geo, tl,
                                 mxu=mxu, early_eps=early_eps)
  rows, cols, off_bx, off_stat = _slot_layout(geo, gram_update)
  # the local shard is ONE tile by construction (gated), so the
  # batch-GLOBAL reference stop test is exact with one small
  # fixed-order slot all-reduce of the shard |delta| sums per
  # iteration -- every chip takes the identical trip count (the conv
  # analogue of ops/pallas_dp_train's in-kernel stop).  The comm
  # family is only allocated when it can be used: at axis size 1 the
  # reduce short-circuits to the local sum.
  has_stop_comm = early_eps is not None and num_devices > 1

  def kernel(niter_ref, scalars_ref, dstk_hbm, h_ref, v_ref, p_hbm,
             sel_hbm, selt_hbm, mblk_hbm, zmask_hbm, xcv_ref, *rest):
    if has_supp:
      supp_hbm, rest = rest[0], rest[1:]
    if has_stop_comm:
      scomm, ssend, srecv, sphase = rest[-4:]
      rest = rest[:-4]
    if num_devices > 1:
      (d_out, h_out, v_out, codes_out, stack,
       *pins, comm, send_sem, recv_sem) = rest
    else:
      d_out, h_out, v_out, codes_out, stack, *pins = rest
    (p_ref, sel_ref, selt_ref, mblk_pin, zmask_pin,
     *pin_rest) = pins
    supp_ref = pin_rest[0] if has_supp else None
    d_pin, pin_sems = pin_rest[-2], pin_rest[-1]
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
      # segment-constant operands ride pl.ANY and pin into VMEM once
      # (pallas_train_step._pin_hbm) -- mblk is the big one
      _pin_hbm(dstk_hbm, d_pin, pin_sems.at[0])
      d_out[:] = d_pin[:]
      _pin_hbm(p_hbm, p_ref, pin_sems.at[1])
      _pin_hbm(sel_hbm, sel_ref, pin_sems.at[2])
      _pin_hbm(selt_hbm, selt_ref, pin_sems.at[3])
      _pin_hbm(mblk_hbm, mblk_pin, pin_sems.at[4])
      _pin_hbm(zmask_hbm, zmask_pin, pin_sems.at[5])
      if has_supp:
        _pin_hbm(supp_hbm, supp_ref, pin_sems.at[6])
      h_out[:] = h_ref[:]
      v_out[:] = v_ref[:]
      if has_stop_comm:
        sphase[0] = 0

    num_iters = niter_ref[0]
    sw = scalars_ref[0]
    upd_step = scalars_ref[1]
    inv_global_b = scalars_ref[2]

    dstk = d_out[:]
    dallv = _build_dall(dstk, p_ref, s, r)
    eta = _power_refresh(dallv, v_out, power_iters)

    if has_stop_comm:
      # dynamic trip counts: the exchange phase is a running SMEM
      # counter, not the iteration index (same argument as
      # ops/pallas_code_shard_train)
      def stop_reduce(local):
        payload = jnp.pad(local.reshape(1, 1),
                          ((0, _SUBLANES - 1), (0, _LANES - 1)))
        phase = jax.lax.rem(sphase[0], 2)
        sphase[0] = sphase[0] + 1
        total = slot_allreduce(
            scomm, ssend, srecv, payload, phase=phase,
            my_idx=jax.lax.axis_index(axis_name),
            num_devices=num_devices)
        return total[0, 0]
    else:
      stop_reduce = None

    xcv = xcv_ref[0]
    mblk = mblk_pin[:]
    zmask = zmask_pin[:]
    codes = solve_tile(
        dstk, dallv, xcv, mblk, zmask, eta, sw * eta, num_iters, stack,
        inv_count=None if early_eps is None else scalars_ref[3],
        stop_reduce=stop_reduce)
    codes_out[:] = codes

    for i, roll in enumerate(rolls):
      stack[i * s:(i + 1) * s, :] = pltpu.roll(codes, roll % tl, 1)
    zstack = stack[0:r * s, :]
    ones_row = jnp.ones((1, tl), jnp.float32)
    stat = _dot_t(ones_row, codes * codes)           # (1, s)

    # local UNAVERAGED block-space stats (HIGHEST in every tier: they
    # feed the cancellation-prone update, see pallas_conv_train notes)
    if gram_update:
      m_row = mblk[0:1, :]
      cm = _dot_t(zstack * m_row, zstack)            # (R*s, R*s)
      bx = _dot_t(xcv, zstack)                       # (cpx, R*s)
    else:
      img2 = _dot(dstk, zstack) * mblk
      gsum = _dot_t(img2 - xcv, zstack)              # (cpx, R*s)

    if num_devices > 1:
      phase = jax.lax.rem(step, 2)
      my_idx = jax.lax.axis_index(axis_name)
      if _is_pow2(num_devices):
        # O(log P) butterfly all-reduce (see ops/pallas_collective and
        # ops/pallas_dp_train -- staging in slot 0)
        if gram_update:
          comm[0, 0:r * s, :] = cm
          comm[0, off_bx:off_bx + cpx, :] = bx
        else:
          comm[0, 0:cpx, :] = gsum
        comm[0, off_stat:off_stat + 1, 0:s] = stat
        total = staged_butterfly_allreduce(
            comm, send_sem, recv_sem, phase=phase, my_idx=my_idx,
            num_devices=num_devices)
      else:
        if gram_update:
          comm[phase, my_idx, 0:r * s, :] = cm
          comm[phase, my_idx, off_bx:off_bx + cpx, :] = bx
        else:
          comm[phase, my_idx, 0:cpx, :] = gsum
        comm[phase, my_idx, off_stat:off_stat + 1, 0:s] = stat
        slot_exchange(comm, send_sem, recv_sem, phase=phase,
                      my_idx=my_idx, num_devices=num_devices)
        total = comm[phase, 0]
        for slot in range(1, num_devices):
          total = total + comm[phase, slot]
      if gram_update:
        cm = total[0:r * s, :]
        bx = total[off_bx:off_bx + cpx, :]
      else:
        gsum = total[0:cpx, :]
      stat = total[off_stat:off_stat + 1, 0:s]

    if uses_hessian:
      hessian = 0.99 * h_out[:] + (stat * inv_global_b) / 100.0
      h_out[:] = hessian
      recip = 1.0 / (hessian + lowest_code_val)      # (1, s)
      scale_row = _dot(recip, selt_ref[:])           # (1, R*s)

    if gram_update:
      grad_fn = lambda d: (_dot(d, cm) - bx) * inv_global_b
    else:
      g0 = gsum * inv_global_b
      grad_fn = lambda d: g0

    def update_body(_, d):
      grad = grad_fn(d)
      if has_supp:
        grad = grad * supp_ref[:]
      if uses_hessian:
        grad = grad * scale_row
      gn = jnp.sqrt(jnp.sum(grad * grad))
      dn = jnp.sqrt(jnp.sum(d * d))
      grad = grad * (dn / jnp.maximum(gn, 1e-30))
      d = d - upd_step * grad
      if renormalize:
        colsq = jnp.sum(d * d, axis=0, keepdims=True)
        norms2 = _dot(colsq, sel_ref[:])
        inv = jax.lax.rsqrt(jnp.maximum(norms2, 1e-30))
        d = d * _dot(inv, selt_ref[:])
      return d

    d_out[:] = jax.lax.fori_loop(0, upd_num_iters, update_body, dstk)

  return kernel


def fused_conv_dp_train_segment_pallas(
    dictionary, hessian, eigvec, batches, sparsity_weight,
    inf_num_iters, upd_stepsize, *, kernel_stride, padding, axis_name,
    axis_size, variant="fista", update_alg="sc_cheap_quadratic_descent",
    upd_num_iters=1, nonneg=False, hard=False, renormalize=True,
    power_iters=12, lowest_code_val=0.001, interpret=False,
    mxu="highest", early_stopping_epsilon=None):
  """Run `batches.shape[0]` DP conv train steps in ONE kernel launch
  per chip.  Call inside a shard_map over ``axis_name`` (the mesh's
  only non-trivial axis); ``batches`` is this chip's
  (k, b_shard, c, H, W) shard.  Semantics == lax.scan of
  [conv_solve_stats_pallas -> psum -> replicated update]
  (build_dp_conv_fused_local_step) with the launch + epilogue overhead
  removed.

  Returns (new_dictionary (s, c, kh, kw), new_hessian, new_eigvec,
  last_codes_shard (b_shard, s, ch, cw)).
  """
  kernel_stride = tuple(int(x) for x in kernel_stride)
  padding_static = (None if padding is None else
                    tuple(tuple(int(x) for x in p) for p in padding))
  return _fused_conv_dp_impl(
      jnp.asarray(dictionary, jnp.float32),
      jnp.asarray(hessian, jnp.float32),
      jnp.asarray(eigvec, jnp.float32),
      jnp.asarray(batches, jnp.float32),
      jnp.asarray(sparsity_weight, jnp.float32),
      jnp.asarray(inf_num_iters, jnp.int32),
      jnp.asarray(upd_stepsize, jnp.float32),
      kernel_stride=kernel_stride, padding=padding_static,
      axis_name=str(axis_name), axis_size=int(axis_size),
      variant=variant, update_alg=update_alg,
      upd_num_iters=int(upd_num_iters), nonneg=bool(nonneg),
      hard=bool(hard), renormalize=bool(renormalize),
      power_iters=int(power_iters),
      lowest_code_val=float(lowest_code_val), interpret=bool(interpret),
      mxu=str(mxu),
      early_eps=(None if early_stopping_epsilon is None
                 else float(early_stopping_epsilon)))


def _fused_conv_dp_impl(dictionary, hessian, eigvec, batches,
                        sparsity_weight, inf_num_iters, upd_stepsize, *,
                        kernel_stride, padding, axis_name, axis_size,
                        variant, update_alg, upd_num_iters, nonneg,
                        hard, renormalize, power_iters, lowest_code_val,
                        interpret, mxu, early_eps=None):
  k, b = batches.shape[0], batches.shape[1]
  img_shape = batches.shape[1:]
  num_devices = int(axis_size)
  geo = _geometry(img_shape, dictionary.shape, kernel_stride)
  s, cpx = geo["s"], geo["cpx"]
  gram_update = upd_num_iters > 1
  if not fused_conv_dp_segment_supported(
      img_shape, dictionary.shape, kernel_stride, variant, update_alg,
      num_devices, upd_num_iters=upd_num_iters, padding=padding,
      early_stopping_epsilon=early_eps):
    raise ValueError("shapes exceed the conv DP segment kernel's "
                     "budget; use the per-step fused-DP path")
  b_pad = b  # single tile per shard (gated above)
  tl = b_pad * geo["ells"]
  uses_hessian = update_alg == "sc_cheap_quadratic_descent"

  from vtc_tpu.ops.precision import matmul_precision
  with matmul_precision():
    mask_img, mblk_cv = _block_mask_canvas(img_shape, padding, geo)
    dstk0, _ = _pack_weights(dictionary, geo)
    xcv_all = _segment_canvases(batches, geo, b_pad, mask_img)

  zmask_np = np.zeros((1, geo["rc"], geo["wc"]), np.float32)
  zmask_np[0, :geo["code_h"], :geo["code_w"]] = 1.0
  zmask_cv = _to_canvas(jnp.asarray(zmask_np)[None], 1, geo, 1)
  sel, selt = _selection_matrices(geo)
  pmats = _placement_matrices(geo)

  h_in = hessian.reshape(1, s)
  v_in = eigvec.reshape(1, s)
  # GLOBAL real element count for the early-stop mean (the slot
  # all-reduce sums shard |delta|s over the mesh)
  scalars = jnp.stack([sparsity_weight, upd_stepsize,
                       jnp.float32(1.0 / (b * num_devices)),
                       jnp.float32(1.0 / (b * num_devices * s
                                          * geo["code_h"]
                                          * geo["code_w"]))])
  niter = inf_num_iters.reshape(1)

  has_supp = bool(geo["ekh"] or geo["ekw"])
  if has_supp:
    supp0, _ = _pack_weights(jnp.ones(dictionary.shape, jnp.float32),
                             geo)

  kernel = _make_conv_dp_kernel(
      variant, nonneg, hard, uses_hessian, renormalize, upd_num_iters,
      power_iters, lowest_code_val, geo, b_pad, gram_update, has_supp,
      axis_name, num_devices, mxu=mxu, early_eps=early_eps)
  has_stop_comm = early_eps is not None and num_devices > 1
  rows, cols, _, _ = _slot_layout(geo, gram_update)
  bcast = lambda shape: pl.BlockSpec(shape,
                                     lambda i, *_: (0,) * len(shape))
  d_new, h_new, v_new, codes = pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=2,
          grid=(k,),
          in_specs=[
              pl.BlockSpec(memory_space=pl.ANY),  # dstk (pinned)
              bcast((1, s)),
              bcast((1, s)),
              pl.BlockSpec(memory_space=pl.ANY),  # pmats (pinned)
              pl.BlockSpec(memory_space=pl.ANY),  # sel (pinned)
              pl.BlockSpec(memory_space=pl.ANY),  # selT (pinned)
              pl.BlockSpec(memory_space=pl.ANY),  # mblk (pinned)
              pl.BlockSpec(memory_space=pl.ANY),  # zmask (pinned)
              pl.BlockSpec((1, cpx, tl), lambda i, *_: (i, 0, 0)),
          ] + ([pl.BlockSpec(memory_space=pl.ANY)]
               if has_supp else []),
          out_specs=[
              bcast(dstk0.shape),
              bcast((1, s)),
              bcast((1, s)),
              bcast((s, tl)),
          ],
          scratch_shapes=[
              pltpu.VMEM((geo["r"] * max(s, cpx), tl), jnp.float32),
              pltpu.VMEM(pmats.shape, jnp.float32),     # pmats pin
              pltpu.VMEM(sel.shape, jnp.float32),       # sel pin
              pltpu.VMEM(selt.shape, jnp.float32),      # selT pin
              pltpu.VMEM((cpx, tl), jnp.float32),       # mblk pin
              pltpu.VMEM((1, tl), jnp.float32),         # zmask pin
          ] + ([pltpu.VMEM(dstk0.shape, jnp.float32)]
               if has_supp else []) + [
              pltpu.VMEM(dstk0.shape, jnp.float32),     # d pin landing
              pltpu.SemaphoreType.DMA((7,)),
          ] + ((butterfly_comm_shapes(num_devices, (rows, cols))
                if _is_pow2(num_devices)
                else comm_scratch_shapes(num_devices, (rows, cols)))
               if num_devices > 1 else [])
            + (comm_scratch_shapes(num_devices, (_SUBLANES, _LANES))
               + [pltpu.SMEM((1,), jnp.int32)]
               if has_stop_comm else [])),
      out_shape=[
          jax.ShapeDtypeStruct(dstk0.shape, jnp.float32),
          jax.ShapeDtypeStruct((1, s), jnp.float32),
          jax.ShapeDtypeStruct((1, s), jnp.float32),
          jax.ShapeDtypeStruct((s, b_pad * geo["ells"]), jnp.float32),
      ],
      interpret=pltpu.InterpretParams() if interpret else False,
      compiler_params=(None if interpret else pltpu.CompilerParams(
          vmem_limit_bytes=_VMEM_LIMIT)),
      cost_estimate=pl.CostEstimate(
          flops=k * 2 * 2 * s * geo["r"] * cpx * b_pad * geo["ell"]
          * 30,
          bytes_accessed=4 * k * (2 * cpx * b_pad * geo["ell"]),
          transcendentals=0),
  )(niter, scalars, jnp.asarray(dstk0), h_in, v_in, jnp.asarray(pmats),
    jnp.asarray(sel), jnp.asarray(selt), jnp.tile(mblk_cv, (1, b_pad)),
    jnp.tile(zmask_cv, (1, b_pad)), xcv_all,
    *((jnp.asarray(supp0),) if has_supp else ()))

  new_dict = _unpack_dstk(d_new, geo, dictionary.shape)
  canv = codes.reshape(s, b_pad, geo["ells"])[:, :, :geo["ell"]].reshape(
      s, b_pad, geo["rc"], geo["wc"]).transpose(1, 0, 2, 3)
  last_codes = canv[:b, :, :geo["code_h"], :geo["code_w"]]
  return new_dict, h_new[0], v_new[0], last_codes
