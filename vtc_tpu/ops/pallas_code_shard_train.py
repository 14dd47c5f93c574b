"""Whole CODE-SHARDED (tensor-parallel) training segments as one Pallas
kernel per chip -- the scaling axis for beyond-VMEM dictionaries.

SURVEY §2.2 names code-dimension sharding as the TP analogue for very
large (heavily overcomplete) dictionaries: each chip owns a ROW SHARD
of the dictionary, solves against it, and the only cross-chip quantity
is the partial reconstruction.  Until now that sharding existed only in
the GSPMD pjit step (parallel/data_parallel.build_pjit_train_step);
dictionaries past the fused kernel's VMEM gate fell back to the XLA
scan.  This kernel runs the ENTIRE segment on-core per chip with the
dictionary shard VMEM-resident:

  grid = (num_steps,), per step on every chip (batch sharded over the
  optional 'data' axis, dictionary rows sharded s -> C x s_l over the
  'code' axis):
    power refresh on the n x n Gram D^T D: per iteration the partial
      w_l = (v D_l^T) D_l is all-reduced over the CODE axis
      (ops/pallas_collective slot all-reduce, fixed-order sum -> v and
      eta bitwise identical on every chip)
    FISTA in RESIDUAL form (no s x s Gram is ever built -- that Gram
      is exactly what breaks the VMEM budget for large s): per
      iteration the partial reconstruction r_l = z_l D_l is
      all-reduced over the code axis to the replicated r, then
      codes_l = shrink(z_l - eta ((r - X) D_l^T), lam eta); momentum
      stays local.  Math == fully_connected/ista_fista.py:100-146 on
      the unsharded dictionary (the reference's two-matmul iteration,
      re-associated over shards).  With group assignments the shrink is
      the group-norm prox of fully_connected/subspace_ista_fista.py
      :149-156 computed over SHARD-LOCAL groups (the eligibility gate
      requires a disjoint partition with every group wholly inside one
      row shard, so group norms never cross chips; for such partitions
      the grouped dictionary is a row permutation of D and the grouped
      Gram's spectrum equals the n x n Gram's, making the shared power
      refresh exact).
    update: resid = allreduce_code(codes_l D'_l) - X (one exchange per
      update iteration), then the row-shard gradient codes_l^T resid
      is all-reduced over the DATA axis (when present), scaled by
      1/global_b, Hessian-EMA scaled, and renormalized -- row
      operations never cross code shards (reference
      sc_steepest_descent.py:37-43, sc_cheap_quadratic_descent.py:44-49,
      subspace_sc_cheap_quadratic_descent.py:62-89,
      training/sparse_coding.py:154).  The subspace anti-alignment
      regularizer involves only within-group row pairs, which the
      layout gate keeps shard-local -- no extra communication.

Cross-chip traffic per step and chip: (power_iters + 1) small (8, n)
exchanges + (inf_num_iters + upd_num_iters) exchanges of the (b, n)
partial reconstruction over the code axis, plus (with a data axis)
upd_num_iters (s_l, n) gradient exchanges + one Hessian-stat exchange
over the data axis -- the TP-matmul psum SURVEY §2.2 calls for plus the
DP stats psum, both riding ICI in-kernel.

axis_size == 1 degenerates to a single-chip whole-segment solver for
dictionaries too large for ops/pallas_train_step's gram-form kernel
(s x s Gram >> VMEM) -- the residual form needs only O(b*s + s*n)
VMEM, so e.g. s=2048 trains fused on one chip.

The double-buffer phase for the reconstruction exchanges is a running
counter in SMEM (the FISTA trip count is a dynamic scalar, so phases
can't be computed statically); the power and data-axis exchanges
alternate on static per-step schedules in their own buffer families.
See ops/pallas_collective for the phase-safety argument.

On a multi-axis mesh the peer device ids are ``base + pos * stride``
along the reduced axis: the caller passes the row-major strides of the
'code' and 'data' axes (ops/pallas_collective slot_exchange's
``device_for``).
"""
import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vtc_tpu.ops.pallas_collective import (comm_scratch_shapes,
                                           slot_allreduce)
from vtc_tpu.ops.pallas_common import (LANES as _LANES,
                                       SUBLANES as _SUBLANES, round_up)
from vtc_tpu.ops.pallas_train_step import (_dot, _dot_t,
                                           _make_group_prox, _pin_hbm,
                                           _tdot)

_CS_VMEM_BUDGET_BYTES = 24 * 1024 * 1024
_CS_VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def _make_tier_dots(mxu):
  """Both-operands-vary tier forms for the residual-form matmuls
  (mirrors ops/pallas_ica_train._make_ns_dot): (dot, dot_t) at the
  requested tier.  Update-path matmuls always stay HIGHEST."""
  if mxu == "highest":
    return _dot, _dot_t
  from vtc_tpu.ops.pallas_train_step import (_dot_b, _dot_t_b, _split3,
                                             _split_hi_lo)
  if mxu == "bf16":
    return _dot_b, _dot_t_b
  if mxu == "bf16x3":
    def dot3(a, b):
      a_hi, a_lo = _split_hi_lo(a)
      b_hi, b_lo = _split_hi_lo(b)
      return (_dot_b(a_hi, b_hi) + _dot_b(a_lo, b_hi)
              + _dot_b(a_hi, b_lo))

    def dot3_t(a, b):
      a_hi, a_lo = _split_hi_lo(a)
      b_hi, b_lo = _split_hi_lo(b)
      return (_dot_t_b(a_hi, b_hi) + _dot_t_b(a_lo, b_hi)
              + _dot_t_b(a_hi, b_lo))

    return dot3, dot3_t
  assert mxu == "bf16x5", mxu

  def dot5(a, b):
    a1, a2, a3 = _split3(a)
    b1, b2, b3 = _split3(b)
    return (_dot_b(a1, b1) + _dot_b(a2, b1) + _dot_b(a1, b2)
            + _dot_b(a3, b1) + _dot_b(a1, b3))

  def dot5_t(a, b):
    a1, a2, a3 = _split3(a)
    b1, b2, b3 = _split3(b)
    return (_dot_t_b(a1, b1) + _dot_t_b(a2, b1) + _dot_t_b(a1, b2)
            + _dot_t_b(a3, b1) + _dot_t_b(a1, b3))

  return dot5, dot5_t


def _cs_vmem_bytes(b_pad, sl_pad, n_pad, num_devices, data_devices=1,
                   gl_pad=0, use_reg=False):
  # pinned-operand accounting: pallas_train_step._vmem_bytes NOTE
  buffers = (
      2 * sl_pad * n_pad       # dictionary shard in + out
      + 2 * b_pad * n_pad      # X double buffer
      + 5 * b_pad * sl_pad     # corr, z, old, codes, codes out
      + 2 * b_pad * n_pad      # replicated recon + resid
      + 2 * num_devices * b_pad * n_pad     # recon comm slots
      + 2 * num_devices * _SUBLANES * n_pad)  # power comm slots
  if data_devices > 1:
    # data-axis stats comm slots + the gradient transient
    buffers += (2 * data_devices * sl_pad * n_pad + sl_pad * n_pad)
  if gl_pad:
    buffers += sl_pad * gl_pad + b_pad * gl_pad  # expand, group norms
  if use_reg:
    buffers += 2 * sl_pad * sl_pad               # comem, cosines
  return 4 * buffers


def code_shard_segment_supported(batch_size, shard_code_size,
                                 input_size, num_devices,
                                 data_devices=1, local_group_max=0,
                                 use_reg=False):
  """True when the code-sharded segment kernel fits this per-shard
  geometry.  ``batch_size`` is the per-DATA-shard batch,
  ``shard_code_size`` the per-CODE-shard dictionary rows,
  ``local_group_max`` the largest per-shard group count (0 = fc)."""
  return _cs_vmem_bytes(
      round_up(batch_size, _SUBLANES), round_up(shard_code_size, _LANES),
      round_up(input_size, _LANES), int(num_devices), int(data_devices),
      round_up(local_group_max, _LANES) if local_group_max else 0,
      bool(use_reg)) <= _CS_VMEM_BUDGET_BYTES


def code_shard_group_arrays(group_assignments, code_size, num_devices):
  """Shard-local group matrices for the code-sharded group kernel, or
  None when the layout is ineligible.

  Eligible layouts: the groups form a disjoint PARTITION of
  range(code_size) (every dictionary row in exactly one group -- the
  reference's grouped scatter-add then reduces to identity placement,
  subspace_ista_fista.py:184-190) and no group straddles a row-shard
  boundary (group norms and within-group alignment pairs stay
  shard-local).

  Returns (expand, comem): expand (P, s_l, g_max) 0/1 membership of
  local rows in local groups; comem (P, s_l, s_l) within-group
  co-membership counts for the anti-alignment regularizer
  (subspace_sc_cheap_quadratic_descent.py:62-80).
  """
  if code_size % num_devices != 0:
    return None
  s_l = code_size // num_devices
  members_all = sorted(m for g in group_assignments for m in g)
  if members_all != list(range(code_size)):
    return None  # not a disjoint partition
  per_shard = [[] for _ in range(num_devices)]
  for g in group_assignments:
    shards = {int(m) // s_l for m in g}
    if len(shards) != 1:
      return None  # group straddles a shard boundary
    shard = shards.pop()
    per_shard[shard].append([int(m) - shard * s_l for m in g])
  g_max = max(len(pg) for pg in per_shard)
  expand = np.zeros((num_devices, s_l, g_max), np.float32)
  comem = np.zeros((num_devices, s_l, s_l), np.float32)
  for shard, pgs in enumerate(per_shard):
    for g_idx, members in enumerate(pgs):
      for m in members:
        expand[shard, m, g_idx] = 1.0
      for a in members:
        for b in members:
          if a != b:
            comem[shard, a, b] += 1.0
  return expand, comem


def roll_window_from_expand_arrays(expand_all):
  """Static lane-rotate window for the code-shard group prox, or None.

  Valid only when EVERY shard's (s_l, g_max) membership block is the
  uniform contiguous pattern expand[j, j // M] == 1 -- i.e. the groups
  tile the original code axis as equal-size M-aligned blocks (M a
  power of two).  Unlike the packed-GM kernels (roll_prox_window),
  this kernel shards the ORIGINAL code axis, where group members may
  be arbitrary rows; the rotate tree is wrong there, so anything but
  the exact block pattern keeps the membership matmuls."""
  e = np.asarray(expand_all)
  if e.ndim != 3:
    return None
  _, sl, g = e.shape
  if g == 0 or sl % g:
    return None
  m = sl // g
  if m & (m - 1):
    return None
  want = np.zeros((sl, g), e.dtype)
  for j in range(sl):
    want[j, j // m] = 1.0
  return m if all(np.array_equal(e[p], want) for p in range(e.shape[0])) \
      else None


def _make_cs_kernel(variant, nonneg, hard, uses_hessian, renormalize,
                    upd_num_iters, power_iters, lowest_code_val,
                    code_axis_name, code_size, data_axis_name, data_size,
                    code_stride, data_stride, use_groups, use_reg,
                    mxu="highest", early_eps=None, roll_m=None):
  use_fista = variant == "fista"
  tdot_, tdot_t = _make_tier_dots(mxu)
  if use_groups:
    bind_prox = _make_group_prox(mxu, hard, roll_m)
  has_data = data_size > 1
  # data-axis exchanges per step (static): one per update iteration
  # plus the Hessian stat
  g_per_step = upd_num_iters + (1 if uses_hessian else 0)

  def kernel(*refs):
    it = list(refs)
    niter_ref, scalars_ref, d_ref, h_ref, v_ref = it[:5]
    it = it[5:]
    expand_ref = it.pop(0) if use_groups else None
    comem_ref = it.pop(0) if use_reg else None
    x_ref, d_out, h_out, v_out, codes_out = it[:5]
    scratch = it[5:]
    d_pin = scratch.pop(0)
    expand_pin = scratch.pop(0) if use_groups else None
    comem_pin = scratch.pop(0) if use_reg else None
    pin_sems = scratch.pop(0)
    rcomm, rsend, rrecv, vcomm, vsend, vrecv = scratch[:6]
    scratch = scratch[6:]
    if has_data:
      gcomm, gsend, grecv = scratch[:3]
      scratch = scratch[3:]
    if early_eps is not None and code_size > 1:
      sccomm, scsend, screcv = scratch[:3]
      scratch = scratch[3:]
    if early_eps is not None and has_data:
      sdcomm, sdsend, sdrecv = scratch[:3]
      scratch = scratch[3:]
    rphase = scratch[0]
    sphase = scratch[1] if early_eps is not None else None

    step = pl.program_id(0)
    my_code = (jax.lax.axis_index(code_axis_name) if code_size > 1
               else jnp.int32(0))
    my_data = (jax.lax.axis_index(data_axis_name) if has_data
               else jnp.int32(0))
    # row-major logical device ids along each reduced axis
    # (ops/pallas_collective slot_exchange device_for)
    dev_code = lambda pos: my_data * data_stride + pos * code_stride
    dev_data = lambda pos: pos * data_stride + my_code * code_stride

    @pl.when(step == 0)
    def _():
      # segment-constant operands ride pl.ANY (see
      # pallas_train_step._pin_hbm): one DMA each at step 0 instead of
      # a per-cell pipeline re-fetch
      _pin_hbm(d_ref, d_pin, pin_sems.at[0])
      d_out[:] = d_pin[:]
      if use_groups:
        _pin_hbm(expand_ref, expand_pin, pin_sems.at[1])
      if use_reg:
        _pin_hbm(comem_ref, comem_pin, pin_sems.at[2])
      h_out[:] = h_ref[:]
      v_out[:] = v_ref[:]
      rphase[0] = 0
      if early_eps is not None:
        sphase[0] = 0

    num_iters = niter_ref[0]
    sw = scalars_ref[0]
    upd_step = scalars_ref[1]
    inv_global_b = scalars_ref[2]

    d_shard = d_out[:]                            # (sl_pad, n_pad)
    images = x_ref[0]                             # (b_pad, n_pad)

    # ---- warm Lipschitz refresh on the n x n Gram (static phases:
    # power_iters + 1 exchanges per step in the vcomm family) ----
    def vreduce(row, j):
      payload = jnp.concatenate(
          [row, jnp.zeros((_SUBLANES - 1, row.shape[-1]), jnp.float32)],
          axis=0)
      phase = jax.lax.rem(step * (power_iters + 1) + j, 2)
      total = slot_allreduce(vcomm, vsend, vrecv, payload, phase=phase,
                             my_idx=my_code, num_devices=code_size,
                             device_for=dev_code)
      return total[0:1]

    def gram_apply(vec, j):
      """allreduce((vec D_l^T) D_l) == vec @ (D^T D)."""
      return vreduce(_dot(_dot_t(vec, d_shard), d_shard), j)

    v = v_out[:]
    v = v / jnp.sqrt(jnp.sum(v * v))
    for j in range(power_iters):
      w = gram_apply(v, j)
      v = w / jnp.sqrt(jnp.sum(w * w))
    v_out[:] = v
    gv = gram_apply(v, power_iters)
    eta = 1.0 / jnp.sum(gv * v)
    lam_eta = sw * eta

    if use_groups:
      expand = expand_pin[:]                      # (sl_pad, gl_pad)
      # group-norm shrinkage over SHARD-LOCAL groups (reference
      # subspace_ista_fista.py:149-156; zero-norm guard included).
      # roll_m is only set when the caller verified the groups tile the
      # ORIGINAL code axis as contiguous M-aligned blocks (this kernel
      # shards the original axis, not the packed GM layout) -- see
      # roll_window_from_expand_arrays.
      threshold = bind_prox(expand, lam_eta,
                            (images.shape[0], d_shard.shape[0]))
    else:
      def threshold(x):
        if hard:
          if nonneg:
            return jnp.where(x < lam_eta, 0.0, x)
          return jnp.where(jnp.abs(x) < lam_eta, 0.0, x)
        if nonneg:
          return jnp.maximum(x - lam_eta, 0.0)
        return x - jnp.clip(x, -lam_eta, lam_eta)

    def rreduce(partial):
      phase = jax.lax.rem(rphase[0], 2)
      rphase[0] = rphase[0] + 1
      return slot_allreduce(rcomm, rsend, rrecv, partial, phase=phase,
                            my_idx=my_code, num_devices=code_size,
                            device_for=dev_code)

    def greduce(payload, j):
      phase = jax.lax.rem(step * g_per_step + j, 2)
      return slot_allreduce(gcomm, gsend, grecv, payload, phase=phase,
                            my_idx=my_data, num_devices=data_size,
                            device_for=dev_data)

    # ---- FISTA in residual form (never builds the s x s Gram) ----
    init = jnp.zeros((images.shape[0], d_shard.shape[0]), jnp.float32)

    def fista_body(carry):
      k, z, old, t_k = carry
      recon = rreduce(tdot_(z, d_shard))          # (b_pad, n_pad)
      grad = tdot_t(recon - images, d_shard)      # (b_pad, sl_pad)
      codes = threshold(z - eta * grad)
      if use_fista:
        t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t_k * t_k)) / 2.0
        beta = (t_k - 1.0) / t_next
        return k + 1, codes + beta * (codes - old), codes, t_next
      return k + 1, codes, codes, t_k

    if early_eps is None:
      # while_loop (not fori) so the rphase side effects sequence with
      # the dynamic trip count
      _, _, codes, _ = jax.lax.while_loop(
          lambda c: c[0] < num_iters, lambda c: fista_body(c),
          (jnp.int32(0), init, init, jnp.float32(1.0)))
    else:
      # reference stop rule, batch-GLOBAL under the full mesh: the
      # local sum |codes - old| (this chip's row shard x batch shard)
      # reduces over the CODE axis then the DATA axis in two small
      # (8, 128) comm families (fixed-order sums -> identical global
      # mean and trip count on every chip); one persistent SMEM phase
      # counter advances per iteration
      inv_gcount = scalars_ref[4]

      def stop_reduce(local):
        phase = jax.lax.rem(sphase[0], 2)
        sphase[0] = sphase[0] + 1
        total = local
        if code_size > 1:
          payload = jnp.pad(total.reshape(1, 1),
                            ((0, _SUBLANES - 1), (0, _LANES - 1)))
          total = slot_allreduce(
              sccomm, scsend, screcv, payload, phase=phase,
              my_idx=my_code, num_devices=code_size,
              device_for=dev_code)[0, 0]
        if has_data:
          payload = jnp.pad(total.reshape(1, 1),
                            ((0, _SUBLANES - 1), (0, _LANES - 1)))
          total = slot_allreduce(
              sdcomm, sdsend, sdrecv, payload, phase=phase,
              my_idx=my_data, num_devices=data_size,
              device_for=dev_data)[0, 0]
        return total

      def stop_cond(carry):
        j, _, _, _, _, stop = carry
        return jnp.logical_and(j < num_iters, jnp.logical_not(stop))

      def stop_body(carry):
        j, z, old, _, t_k, _ = carry
        j_next, z_next, codes, t_next = fista_body((j, z, old, t_k))
        total = stop_reduce(jnp.sum(jnp.abs(codes - old)))
        avg_delta = (total * inv_gcount) / eta
        stop = jnp.logical_and(avg_delta < early_eps, j > 0)
        return j_next, z_next, codes, codes, t_next, stop

      _, _, _, codes, _, _ = jax.lax.while_loop(
          stop_cond, lambda c: stop_body(c),
          (jnp.int32(0), init, init, init, jnp.float32(1.0),
           jnp.bool_(False)))
    codes_out[:] = codes

    if uses_hessian:
      stat = jnp.sum(codes * codes, axis=0, keepdims=True)  # (1, sl)
      if has_data:
        # ride the grad-slot family: stat transposed into column 0
        payload = jnp.pad(
            jnp.transpose(stat),
            ((0, 0), (0, d_shard.shape[1] - 1)))
        stat = jnp.transpose(greduce(payload, 0)[:, 0:1])
      hessian = 0.99 * h_out[:] + (stat * inv_global_b) / 100.0
      h_out[:] = hessian
      scale = jnp.transpose(hessian) + lowest_code_val  # (sl_pad, 1)

    def update_body(carry):
      j, d = carry
      # HIGHEST even in the opt-in tiers: the update residual is a
      # cancellation-prone small difference feeding the dictionary
      # gradient (same policy as the gram-form kernels' C/B stats,
      # see ops/pallas_train_step._make_tiled_kernel)
      resid = rreduce(_dot(codes, d)) - images    # replicated over code
      grad = _tdot(codes, resid)                  # (sl_pad, n_pad) LOCAL
      if has_data:
        grad = greduce(grad, (1 if uses_hessian else 0) + j)
      grad = grad * inv_global_b
      if use_reg:
        # within-group anti-alignment regularizer, unit-norm form (see
        # ops/pallas_train_step._make_group_kernel); the layout gate
        # keeps every within-group pair shard-local, so no comm
        penalty = scalars_ref[3]
        cos = _dot_t(d, d)                        # (sl_pad, sl_pad)
        smat = comem_pin[:] * jnp.sign(cos)
        reg = (_dot(smat, d)
               - jnp.sum(smat * cos, axis=1, keepdims=True) * d)
        grad = grad + penalty * reg
      if uses_hessian:
        grad = grad / scale
      d = d - upd_step * grad
      if renormalize:
        norms = jnp.sqrt(jnp.sum(d * d, axis=1, keepdims=True))
        d = d / jnp.maximum(norms, 1e-30)
      return j + 1, d

    _, d_new = jax.lax.while_loop(
        lambda c: c[0] < upd_num_iters,
        lambda c: update_body(c),
        (jnp.int32(0), d_shard))
    d_out[:] = d_new

  return kernel


def fused_code_sharded_train_segment_pallas(
    dict_shard, hessian_shard, eigvec, batches, sparsity_weight,
    inf_num_iters, upd_stepsize, *, axis_name, axis_size,
    data_axis_name=None, data_axis_size=1, code_stride=1, data_stride=0,
    expand_local=None, comem_local=None, alignment_penalty=0.0,
    variant="fista", update_alg="sc_cheap_quadratic_descent",
    upd_num_iters=1, nonneg=False, hard=False, renormalize=True,
    power_iters=12, lowest_code_val=0.001, interpret=False,
    mxu="highest", early_stopping_epsilon=None, stop_count=None,
    roll_window=None):
  """Run `batches.shape[0]` code-sharded train steps in ONE kernel
  launch per chip.  Call inside a shard_map over ``axis_name`` (plus
  optionally ``data_axis_name``); ``dict_shard`` is this chip's (s_l, n)
  dictionary-row shard, ``hessian_shard`` its (s_l,) Hessian rows,
  ``eigvec`` the REPLICATED (n,) eigenvector of the n x n Gram D^T D
  (seed with lipschitz.top_gram_eigenpair on D^T, or any vector with
  power_iters=12), ``batches`` this chip's (k, b_local, n) batch shard
  (replicated over the code axis, sharded over the data axis).

  For the group-sparse family pass ``expand_local`` (s_l, g_max) and --
  with a nonzero ``alignment_penalty`` -- ``comem_local`` (s_l, s_l)
  from code_shard_group_arrays; ``variant``/``update_alg`` then follow
  the subspace names.  On a multi-axis mesh pass the row-major device
  strides of the code/data axes (``code_stride``/``data_stride``).

  Returns (new_dict_shard, new_hessian_shard, new_eigvec,
  last_codes_shard (b_local, s_l)).  Stacking the shards reproduces the
  unsharded trainer's trajectory up to float reduction order
  (tests/test_pallas_code_shard_train.py).
  """
  k, b, n = batches.shape
  sl = dict_shard.shape[0]
  num_devices = int(axis_size)
  data_size = int(data_axis_size)
  use_groups = expand_local is not None
  use_reg = float(alignment_penalty) != 0.0
  if use_reg:
    assert use_groups and comem_local is not None
    assert renormalize, (
        "the in-kernel anti-alignment regularizer uses the unit-norm "
        "gradient form; renormalize=False stays on the XLA path")
  sl_pad = round_up(sl, _LANES)
  n_pad = round_up(n, _LANES)
  b_pad = round_up(b, _SUBLANES)
  uses_hessian = update_alg in ("sc_cheap_quadratic_descent",
                                "subspace_sc_cheap_quadratic_descent")
  gl_pad = round_up(expand_local.shape[1], _LANES) if use_groups else 0
  if not code_shard_segment_supported(
      b, sl, n, num_devices, data_size, gl_pad, use_reg):
    raise ValueError("shapes exceed the code-sharded segment kernel's "
                     "VMEM budget")

  d_in = jnp.pad(jnp.asarray(dict_shard, jnp.float32),
                 ((0, sl_pad - sl), (0, n_pad - n)))
  h_in = jnp.pad(jnp.asarray(hessian_shard, jnp.float32).reshape(1, sl),
                 ((0, 0), (0, sl_pad - sl)))
  v_in = jnp.pad(jnp.asarray(eigvec, jnp.float32).reshape(1, n),
                 ((0, 0), (0, n_pad - n)))
  x_in = jnp.pad(jnp.asarray(batches, jnp.float32),
                 ((0, 0), (0, b_pad - b), (0, n_pad - n)))
  extra_in = []
  extra_specs = []
  const = lambda i, *_: (0, 0)
  if use_groups:
    gl = expand_local.shape[1]
    extra_in.append(jnp.pad(jnp.asarray(expand_local, jnp.float32),
                            ((0, sl_pad - sl), (0, gl_pad - gl))))
    extra_specs.append(pl.BlockSpec(memory_space=pl.ANY))
  if use_reg:
    extra_in.append(jnp.pad(jnp.asarray(comem_local, jnp.float32),
                            ((0, sl_pad - sl), (0, sl_pad - sl))))
    extra_specs.append(pl.BlockSpec(memory_space=pl.ANY))

  # early-stop mean denominator: the REAL global element count
  # (fc: global_b * s_total; groups: the caller passes the grouped
  # G * M-based count to match the reference's grouped-tensor mean)
  stop_elems = (int(stop_count) if stop_count is not None
                else b * data_size * sl * num_devices)
  scalars = jnp.stack([jnp.asarray(sparsity_weight, jnp.float32),
                       jnp.asarray(upd_stepsize, jnp.float32),
                       jnp.float32(1.0 / (b * data_size)),
                       jnp.asarray(alignment_penalty, jnp.float32),
                       jnp.float32(1.0 / stop_elems)])
  niter = jnp.asarray(inf_num_iters, jnp.int32).reshape(1)

  kernel = _make_cs_kernel(
      variant, bool(nonneg), bool(hard), uses_hessian, bool(renormalize),
      int(upd_num_iters), int(power_iters), float(lowest_code_val),
      axis_name, num_devices, data_axis_name, data_size,
      int(code_stride), int(data_stride), use_groups, use_reg,
      mxu=str(mxu),
      early_eps=(None if early_stopping_epsilon is None
                 else float(early_stopping_epsilon)),
      roll_m=roll_window)
  cost = pl.CostEstimate(
      flops=2 * k * (40 * b_pad * sl_pad * n_pad),
      bytes_accessed=4 * k * (b_pad * n_pad + b_pad * sl_pad),
      transcendentals=0)
  scratch = [pltpu.VMEM((sl_pad, n_pad), jnp.float32)]  # d pin
  if use_groups:
    scratch += [pltpu.VMEM((sl_pad, gl_pad), jnp.float32)]
  if use_reg:
    scratch += [pltpu.VMEM((sl_pad, sl_pad), jnp.float32)]
  scratch += [pltpu.SemaphoreType.DMA((3,))]
  scratch += (comm_scratch_shapes(num_devices, (b_pad, n_pad))
              + comm_scratch_shapes(num_devices, (_SUBLANES, n_pad)))
  if data_size > 1:
    scratch += comm_scratch_shapes(data_size, (sl_pad, n_pad))
  if early_stopping_epsilon is not None and num_devices > 1:
    scratch += comm_scratch_shapes(num_devices, (_SUBLANES, _LANES))
  if early_stopping_epsilon is not None and data_size > 1:
    scratch += comm_scratch_shapes(data_size, (_SUBLANES, _LANES))
  scratch += [pltpu.SMEM((1,), jnp.int32)]
  if early_stopping_epsilon is not None:
    scratch += [pltpu.SMEM((1,), jnp.int32)]
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=2,
      grid=(k,),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),  # d: pinned at step 0
          pl.BlockSpec((1, sl_pad), const),
          pl.BlockSpec((1, n_pad), const),
      ] + extra_specs + [
          pl.BlockSpec((1, b_pad, n_pad), lambda i, *_: (i, 0, 0)),
      ],
      out_specs=[
          pl.BlockSpec((sl_pad, n_pad), const),
          pl.BlockSpec((1, sl_pad), const),
          pl.BlockSpec((1, n_pad), const),
          pl.BlockSpec((b_pad, sl_pad), const),
      ],
      scratch_shapes=scratch)
  d_new, h_new, v_new, codes = pl.pallas_call(
      kernel, grid_spec=grid_spec,
      out_shape=[
          jax.ShapeDtypeStruct((sl_pad, n_pad), jnp.float32),
          jax.ShapeDtypeStruct((1, sl_pad), jnp.float32),
          jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
          jax.ShapeDtypeStruct((b_pad, sl_pad), jnp.float32),
      ],
      interpret=pltpu.InterpretParams() if interpret else False,
      cost_estimate=cost,
      compiler_params=None if interpret else pltpu.CompilerParams(
          vmem_limit_bytes=_CS_VMEM_LIMIT_BYTES),
  )(niter, scalars, d_in, h_in, v_in, *extra_in, x_in)
  return (d_new[:sl, :n], h_new[0, :sl], v_new[0, :n], codes[:b, :sl])
