"""Whole DATA-PARALLEL training segments as one Pallas kernel per chip.

The round-2 fused-DP composition ran one solve+stats kernel launch per
step with an XLA psum + update epilogue between launches
(parallel/data_parallel.build_dp_fused_local_step).  Per-chip speed was
~60% of the single-chip whole-segment kernel -- the gap being per-step
kernel launch + epilogue HBM round-trips, NOT the psum itself
(BENCH_NOTES UPDATE 10).  This module removes that overhead: each chip
runs its ENTIRE segment as ONE kernel, and the per-step cross-chip
reduction that DP semantics require (reference trainer equivalence:
every step's dictionary update must see the GLOBAL batch statistics,
training/sparse_coding.py:142-168) happens IN-KERNEL over ICI with
async remote DMAs:

  grid = (num_steps,), per step on every chip:
    gram/power refresh + VMEM-resident FISTA solve of the LOCAL shard
      (identical math to ops/pallas_train_step._make_kernel)
    local stats C = codes^T codes, B = codes^T X, hessian stat
    in-kernel all-reduce of the packed (C|B|stat) payload ->
      global stats, IDENTICAL bitwise on every chip (unlike a ring
      all-reduce, whose per-chip accumulation order differs), so the
      replicated dictionary / Hessian EMA / eigenvector never drift
      apart across the mesh.  Power-of-2 axis sizes take the BUTTERFLY
      scheme (log2(P) pairwise exchange+add rounds, O(log P) comm
      VMEM -- admits pod-scale P; see ops/pallas_collective for the
      determinism and race-safety arguments); other sizes keep the
      all-to-all (each chip writes its slot into comm[phase, my_idx]
      on every peer, fixed-order slot sum; phase = step % 2 double
      buffering -- step t+2's writes can't land before step t's reads
      finish, because a chip only reaches step t+2 after receiving
      every peer's step-t+1 slot, which peers send only after reading
      all of step t)
    Hessian EMA + `upd_num_iters` dictionary descent iterations from
      the global gram-form stats: grad at any D' is exactly
      (C D' - B) / global_b -- the same update the single-chip tiled
      kernel computes (reference sc_cheap_quadratic_descent.py:44-49)

With axis_size == 1 the communication vanishes and this IS the
single-chip whole-segment kernel in gram-stats form.

Must be called inside a shard_map whose dp axis is the mesh's ONLY
non-trivial axis (logical RDMA device ids are computed from
jax.lax.axis_index).  Multi-slice 'dcn' meshes and code-sharded meshes
stay on the per-step-psum path.

Tested on the virtual CPU mesh via Pallas TPU interpret mode (which
simulates remote DMAs and semaphores): == the single-chip fused segment
kernel on the concatenated global batch, and bitwise identical state
across chips (tests/test_pallas_dp_train.py).  Interpret-mode caveat:
the simulation needs one SPARE host device thread -- the CPU client's
thread pool is sized to the virtual device count, and a mesh spanning
ALL of them starves the interpreter's blocking semaphore waits
(measured: an 8-device mesh over 8 virtual devices deadlocks; over 9
it runs).  Callers gate the interpret path to
axis_size < len(jax.devices()).
"""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vtc_tpu.ops.pallas_collective import (butterfly_comm_shapes,
                                           comm_scratch_shapes,
                                           slot_allreduce, slot_exchange,
                                           staged_butterfly_allreduce)
from vtc_tpu.ops.pallas_common import (LANES as _LANES,
                                       SUBLANES as _SUBLANES, round_up)
from vtc_tpu.ops.pallas_train_step import (_VMEM_BUDGET_BYTES, _dot,
                                           _dot_t, _dot_t_b, _make_iter_dot,
                                           _pin_hbm, _tdot)

# comm slots + the fixed kernel state must fit comfortably under the
# raised 64 MB scoped-VMEM limit; same ~2x self-budget convention as
# pallas_train_step (its 12 MB budget maps to a 32 MB limit)
_DP_VMEM_BUDGET_BYTES = 24 * 1024 * 1024
_DP_VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def _pack_dims(s_pad, n_pad):
  """Packed comm slot: rows [0:s_pad] = [C | B], row block [s_pad:+8]
  carries the hessian stat in its first row."""
  return s_pad + _SUBLANES, s_pad + n_pad


def _is_pow2(p):
  return p >= 2 and (p & (p - 1)) == 0


def _comm_slots(num_devices):
  """Resident comm slots for the stats all-reduce: the butterfly
  scheme (power-of-2 P) needs 1 staging + 2 phases x log2(P) recv
  slots -- O(log P), which is what lets the whole-segment DP path
  admit pod-scale P (the all-to-all's 2 P slots capped it at P <= 6
  for the flagship geometry, BENCH_NOTES UPDATE 38)."""
  p = int(num_devices)
  if _is_pow2(p):
    return 1 + 2 * (p.bit_length() - 1)
  return 2 * p  # all-to-all double-buffered slots (non-pow2 fallback)


def _dp_vmem_bytes(b_pad, s_pad, n_pad, use_n_gram, num_devices):
  rows, cols = _pack_dims(s_pad, n_pad)
  # pinned-operand accounting: pallas_train_step._vmem_bytes NOTE
  buffers = (
      2 * s_pad * n_pad        # dictionary in + out
      + s_pad * s_pad          # gram
      + (n_pad * n_pad if use_n_gram else 0)
      + 2 * b_pad * n_pad      # X double buffer
      + 4 * b_pad * s_pad      # corr, z, old, codes
      + b_pad * s_pad          # codes out block
      + b_pad * n_pad          # update residual
      + s_pad * s_pad + s_pad * n_pad   # summed global C, B
      + _comm_slots(num_devices) * rows * cols)  # comm scratch
  return 4 * buffers


def fused_dp_segment_supported(batch_shard_size, code_size, input_size,
                               num_devices):
  """True when the whole-segment DP kernel covers this per-shard
  geometry: the shard solve fits one VMEM tile and the comm slots fit
  the DP budget."""
  s_pad = round_up(code_size, _LANES)
  n_pad = round_up(input_size, _LANES)
  b_pad = round_up(batch_shard_size, _SUBLANES)
  return _dp_vmem_bytes(b_pad, s_pad, n_pad, code_size > input_size,
                        int(num_devices)) <= _DP_VMEM_BUDGET_BYTES


def _make_dp_kernel(variant, nonneg, hard, uses_hessian, renormalize,
                    upd_num_iters, power_iters, use_n_gram,
                    lowest_code_val, axis_name, num_devices, s_pad,
                    n_pad, mxu="highest", early_eps=None):
  use_fista = variant == "fista"
  prep_gram, iter_dot = _make_iter_dot(mxu)
  dot_t_ = _dot_t_b if mxu == "bf16" else _dot_t
  # at axis size 1 stop_reduce short-circuits and never touches the
  # comm family, so the slots/semaphores/phase counter are only
  # allocated when they can be used (matches pallas_group_dp_train)
  has_stop_comm = early_eps is not None and num_devices > 1

  def kernel(niter_ref, scalars_ref, d_ref, h_ref, v_ref, x_ref,
             d_out, h_out, v_out, codes_out, d_pin, d_sem, comm,
             send_sem, recv_sem, *stop_refs):
    if has_stop_comm:
      scomm, ssend, srecv, sphase = stop_refs
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
      # d rides pl.ANY (segment-constant; pallas_train_step._pin_hbm):
      # DMA into scratch once, VPU copy into the carry output block --
      # the pipeline otherwise re-fetches the block EVERY cell
      _pin_hbm(d_ref, d_pin, d_sem)
      d_out[:] = d_pin[:]
      h_out[:] = h_ref[:]
      v_out[:] = v_ref[:]
      if has_stop_comm:
        sphase[0] = 0

    num_iters = niter_ref[0]
    sw = scalars_ref[0]
    upd_step = scalars_ref[1]
    inv_global_b = scalars_ref[2]

    dictionary = d_out[:]
    images = x_ref[0]
    gram = _dot_t(dictionary, dictionary)
    power_gram = _tdot(dictionary, dictionary) if use_n_gram else gram

    v = v_out[:]
    v = v / jnp.sqrt(jnp.sum(v * v))

    def power_body(_, vec):
      w = _dot(vec, power_gram)
      return w / jnp.sqrt(jnp.sum(w * w))

    v = jax.lax.fori_loop(0, power_iters, power_body, v)
    v_out[:] = v
    eta = 1.0 / jnp.sum(_dot(v, power_gram) * v)
    lam_eta = sw * eta

    corr = dot_t_(images, dictionary)

    def threshold(x):
      if hard:
        if nonneg:
          return jnp.where(x < lam_eta, 0.0, x)
        return jnp.where(jnp.abs(x) < lam_eta, 0.0, x)
      if nonneg:
        return jnp.maximum(x - lam_eta, 0.0)
      return x - jnp.clip(x, -lam_eta, lam_eta)

    neg_eta_gram = prep_gram(-eta * gram)
    corr_eta = eta * corr
    init = jnp.zeros_like(corr)

    def fista_body(_, carry):
      z, old, t_k = carry
      codes = threshold(z + iter_dot(z, neg_eta_gram) + corr_eta)
      if use_fista:
        t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t_k * t_k)) / 2.0
        beta = (t_k - 1.0) / t_next
        return codes + beta * (codes - old), codes, t_next
      return codes, codes, t_k

    if early_eps is None:
      _, codes, _ = jax.lax.fori_loop(
          0, num_iters, fista_body, (init, init, jnp.float32(1.0)))
    else:
      # reference stop rule (fc/ista_fista.py:135-144), batch-GLOBAL
      # under DP: the per-iteration shard-local sum |codes - old| is
      # all-reduced over the mesh (fixed-order slot sum in its own
      # small (8, 128) comm family), so every chip evaluates the
      # identical global mean and takes the identical trip count --
      # the DP analogue of the single-tile gate on the single-chip
      # kernel's in-kernel stop test (pallas_train_step._make_kernel).
      # The exchange phase is a running SMEM counter (dynamic trip
      # counts, same argument as ops/pallas_code_shard_train).
      inv_gcount = scalars_ref[3]

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

      _, _, _, codes, _, _ = jax.lax.while_loop(
          stop_cond, stop_body,
          (jnp.int32(0), init, init, init, jnp.float32(1.0),
           jnp.bool_(False)))
    codes_out[:] = codes

    # local gram-form stats (HIGHEST in every tier: they feed the
    # cancellation-prone C D' - B update, see pallas_train_step notes)
    cmat = _tdot(codes, codes)                     # (s_pad, s_pad)
    bmat = _tdot(codes, images)                    # (s_pad, n_pad)
    stat = jnp.sum(codes * codes, axis=0, keepdims=True)

    if num_devices > 1:
      phase = jax.lax.rem(step, 2)
      my_idx = jax.lax.axis_index(axis_name)
      if _is_pow2(num_devices):
        # butterfly all-reduce: stage the packed payload into slot 0,
        # log2(P) pairwise exchange+add rounds -- O(log P) comm VMEM,
        # bitwise identical on every chip (fixed index-block
        # association tree + IEEE-commutative pair sums; see
        # ops/pallas_collective)
        comm[0, 0:s_pad, 0:s_pad] = cmat
        comm[0, 0:s_pad, s_pad:s_pad + n_pad] = bmat
        comm[0, s_pad:s_pad + 1, 0:s_pad] = stat
        total = staged_butterfly_allreduce(
            comm, send_sem, recv_sem, phase=phase, my_idx=my_idx,
            num_devices=num_devices)
      else:
        # non-power-of-2 fallback: stage my packed slot region-wise,
        # all-to-all it, then sum the slots in FIXED index order
        # (bitwise identical on every chip)
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
      if uses_hessian:
        grad = grad / scale
      d = d - upd_step * grad
      if renormalize:
        norms = jnp.sqrt(jnp.sum(d * d, axis=1, keepdims=True))
        d = d / jnp.maximum(norms, 1e-30)
      return d

    d_out[:] = jax.lax.fori_loop(0, upd_num_iters, update_body,
                                 dictionary)

  return kernel


def fused_dp_train_segment_pallas(dictionary, hessian, eigvec, batches,
                                  sparsity_weight, inf_num_iters,
                                  upd_stepsize, *, axis_name,
                                  axis_size, variant="fista",
                                  update_alg="sc_cheap_quadratic_descent",
                                  upd_num_iters=1, nonneg=False,
                                  hard=False, renormalize=True,
                                  power_iters=12, lowest_code_val=0.001,
                                  interpret=False, mxu="highest",
                                  early_stopping_epsilon=None):
  """Run `batches.shape[0]` DP train steps in ONE kernel launch per
  chip.  Call inside a shard_map over ``axis_name`` (the only
  non-trivial mesh axis); ``batches`` is this chip's (k, b_shard, n)
  shard.  Semantics == lax.scan of [fused_solve_stats_pallas -> psum ->
  replicated update] (build_dp_fused_local_step) with the launch and
  epilogue overhead removed; the update sees GLOBAL per-step stats, so
  the trajectory matches the single-chip segment on the concatenated
  global batch up to float reduction order.

  Returns (new_dictionary, new_hessian, new_eigvec, last_codes_shard).
  """
  k, b, n = batches.shape
  s = dictionary.shape[0]
  num_devices = int(axis_size)
  use_n_gram = s > n
  dim = n if use_n_gram else s
  s_pad = round_up(s, _LANES)
  n_pad = round_up(n, _LANES)
  dim_pad = round_up(dim, _LANES)
  b_pad = round_up(b, _SUBLANES)
  uses_hessian = update_alg == "sc_cheap_quadratic_descent"
  if not fused_dp_segment_supported(b, s, n, num_devices):
    raise ValueError("shapes exceed the DP segment kernel's VMEM "
                     "budget; use the per-step fused-DP path")

  d_in = jnp.pad(jnp.asarray(dictionary, jnp.float32),
                 ((0, s_pad - s), (0, n_pad - n)))
  h_in = jnp.pad(jnp.asarray(hessian, jnp.float32).reshape(1, s),
                 ((0, 0), (0, s_pad - s)))
  v_in = jnp.pad(jnp.asarray(eigvec, jnp.float32).reshape(1, dim),
                 ((0, 0), (0, dim_pad - dim)))
  x_in = jnp.pad(jnp.asarray(batches, jnp.float32),
                 ((0, 0), (0, b_pad - b), (0, n_pad - n)))

  scalars = jnp.stack([jnp.asarray(sparsity_weight, jnp.float32),
                       jnp.asarray(upd_stepsize, jnp.float32),
                       jnp.float32(1.0 / (b * num_devices)),
                       # global REAL element count for the stop test
                       # (padded entries are exact zeros each iter)
                       jnp.float32(1.0 / (b * num_devices * s))])
  niter = jnp.asarray(inf_num_iters, jnp.int32).reshape(1)

  kernel = _make_dp_kernel(
      variant, bool(nonneg), bool(hard), uses_hessian, bool(renormalize),
      int(upd_num_iters), int(power_iters), use_n_gram,
      float(lowest_code_val), axis_name, num_devices, s_pad, n_pad,
      mxu=str(mxu),
      early_eps=(None if early_stopping_epsilon is None
                 else float(early_stopping_epsilon)))
  rows, cols = _pack_dims(s_pad, n_pad)
  const = lambda i, *_: (0, 0)
  cost = pl.CostEstimate(
      flops=2 * k * (s_pad * n_pad * s_pad + b_pad * s_pad * n_pad
                     + 30 * b_pad * s_pad * s_pad
                     + 2 * upd_num_iters * s_pad * s_pad * n_pad),
      bytes_accessed=4 * k * (b_pad * n_pad + b_pad * s_pad),
      transcendentals=0)
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=2,
      grid=(k,),
      in_specs=[
          pl.BlockSpec(memory_space=pl.ANY),  # d: pinned at step 0
          pl.BlockSpec((1, s_pad), const),
          pl.BlockSpec((1, dim_pad), const),
          pl.BlockSpec((1, b_pad, n_pad), lambda i, *_: (i, 0, 0)),
      ],
      out_specs=[
          pl.BlockSpec((s_pad, n_pad), const),
          pl.BlockSpec((1, s_pad), const),
          pl.BlockSpec((1, dim_pad), const),
          pl.BlockSpec((b_pad, s_pad), const),
      ],
      scratch_shapes=([pltpu.VMEM((s_pad, n_pad), jnp.float32),
                       pltpu.SemaphoreType.DMA(())]
                      + (butterfly_comm_shapes(num_devices, (rows, cols))
                         if _is_pow2(num_devices)
                         else comm_scratch_shapes(num_devices,
                                                  (rows, cols)))
                      + (comm_scratch_shapes(num_devices,
                                             (_SUBLANES, _LANES))
                         + [pltpu.SMEM((1,), jnp.int32)]
                         if (early_stopping_epsilon is not None
                             and num_devices > 1)
                         else [])))
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
          vmem_limit_bytes=_DP_VMEM_LIMIT_BYTES),
  )(niter, scalars, d_in, h_in, v_in, x_in)
  return (d_new[:s, :n], h_new[0, :s], v_new[0, :dim], codes[:b, :s])
