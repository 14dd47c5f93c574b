"""Whole ICA training segments as ONE fused Pallas TPU kernel.

The scanned ICA trainer's hot loop (training/ica._segment_runner_tracked)
is `Newton-Schulz inverse refresh -> codes = X @ D^{-1} -> natural-
gradient statistic -> dictionary update` per batch, as an XLA lax.scan
of separate ops -- so the dictionary and the tracked inverse round-trip
HBM at every op boundary of every step, and each of the ~14 small
(n, n) matmuls pays its own dispatch.  This kernel runs the ENTIRE
segment on-core, the ICA analogue of ops/pallas_train_step:

  grid = (num_steps,)  -- sequential grid cells; the dictionary D and
                          the tracked inverse X live in VMEM-resident
                          output blocks carried across steps; batches
                          stream HBM->VMEM double-buffered.
  per grid step (update-path matmuls HIGHEST, refresh/codes at the
  opt-in tier):
      X    <- X (2I - D X)            refine_iters times (Newton-Schulz)
      r    =  max|D X - I|            (per-step guard residual, emitted)
      c    =  batch @ X
      S    =  c^T sign(c) / b
      D    <- D + eta (S - I) D       upd_num_iters times

Semantics are identical to the composed XLA path
(invertible_linear.newton_refine_inverse + ica_natural_gradient._update
-- reference semantics: training/ica.py:217 computes the explicit
per-batch inverse, dict_update_rules/fully_connected/
ica_natural_gradient.py:6-35 the ascent update); trajectory equivalence
is tested in tests/test_pallas_ica_train.py.  The divergence guard of
invertible_linear.refine_inverse_guarded is preserved by emitting the
segment-max of the per-step post-refinement residuals (NaN-safe): the
caller checks it against the guard tolerance and reruns the segment
on the guarded XLA path (LU fallback and all) in the rare divergence
regime -- see training/ica._fused_segment_runner.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vtc_tpu.ops.pallas_collective import (allreduce_comm_shapes,
                                           value_allreduce)
from vtc_tpu.ops.pallas_common import (LANES as _LANES,
                                       SUBLANES as _SUBLANES, round_up)
from vtc_tpu.ops.pallas_train_step import (_dot, _tdot, _dot_b,
                                           _pin_hbm, _split_hi_lo,
                                           _split3)

_VMEM_BUDGET_BYTES = 12 * 1024 * 1024
# the DP segment variant carries 2 x P x (n, n) comm slots on top of
# the fixed state; same raised-limit convention as ops/pallas_dp_train
_DP_VMEM_BUDGET_BYTES = 24 * 1024 * 1024
_DP_VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def _make_ns_dot(mxu):
  """Tier form of the refresh/codes matmuls (both operands vary, so
  this mirrors the XLA precision ladder rather than the constant-
  operand iteration tiers of pallas_train_step._make_iter_dot):
  'highest' 6-pass f32, 'bf16x5' 5-pass exact-split (near-parity),
  'bf16x3' 3-pass (== the XLA 'tensorfloat32' tier the scanned ICA
  trainer uses), 'bf16' single pass."""
  if mxu == "bf16":
    return _dot_b
  if mxu == "bf16x3":
    def dot3(a, b):
      a_hi, a_lo = _split_hi_lo(a)
      b_hi, b_lo = _split_hi_lo(b)
      return (_dot_b(a_hi, b_hi) + _dot_b(a_lo, b_hi)
              + _dot_b(a_hi, b_lo))

    return dot3
  if mxu == "bf16x5":
    def dot5(a, b):
      a1, a2, a3 = _split3(a)
      b1, b2, b3 = _split3(b)
      return (_dot_b(a1, b1) + _dot_b(a2, b1) + _dot_b(a1, b2)
              + _dot_b(a3, b1) + _dot_b(a1, b3))

    return dot5
  assert mxu == "highest", mxu  # no silent fall-through on typos
  return _dot


def fused_ica_segment_supported(n, batch_size):
  """True when the fused ICA segment kernel handles this geometry: the
  square dictionary must tile the MXU exactly (padding a tracked
  INVERSE is not identity-safe), and state + one streamed batch must
  fit VMEM."""
  if n % _LANES != 0 or n % _SUBLANES != 0:
    return False
  b_pad = round_up(batch_size, _SUBLANES)
  # D, X, eye/stat/temps (~5 n^2 transients) + batch + codes; the
  # (2, n, n) pin landing replaces the two double-buffered pipeline
  # inputs it supersedes (pallas_train_step._vmem_bytes NOTE)
  vmem = (7 * n * n + 2 * b_pad * n) * 4
  return vmem <= _VMEM_BUDGET_BYTES


def _make_ica_kernel(refine_iters, upd_num_iters, mxu, boost_tol=None,
                     axis_name=None, num_devices=1):
  """Whole-segment ICA kernel.  With ``num_devices > 1`` the signature
  gains (comm, send_sem, recv_sem) scratch and the per-step natural-
  gradient statistic is all-reduced IN-KERNEL over ICI with the
  deterministic slot all-reduce (ops/pallas_collective) before the
  replicated update -- the DP semantics of training/ica
  ._segment_runner_dp (psum of per-shard codes^T sign(codes) /
  global_b) with the per-step launch + epilogue overhead removed.  The
  Newton-Schulz refresh depends only on the replicated dictionary, so
  every chip computes the identical inverse and guard residual."""
  ns_dot = _make_ns_dot(mxu)

  def kernel(scalars_ref, d_ref, xi_ref, x_ref, d_out, xi_out, res_out,
             pin_vmem, pin_sems, *comm_refs):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
      # d and xi ride pl.ANY (segment-constant inputs; see
      # pallas_train_step._pin_hbm) -- one DMA each into VMEM scratch
      # at step 0 (instead of a per-cell pipeline fetch), then a VPU
      # copy into the carry output blocks
      _pin_hbm(d_ref, pin_vmem.at[0], pin_sems.at[0])
      _pin_hbm(xi_ref, pin_vmem.at[1], pin_sems.at[1])
      d_out[:] = pin_vmem[0]
      xi_out[:] = pin_vmem[1]

    @pl.when(step == 0)
    def _():
      res_out[:] = jnp.zeros((1, 1), jnp.float32)

    stepsize = scalars_ref[0]
    inv_b = scalars_ref[1]
    d = d_out[:]
    n_pad = d.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    eye = jnp.where(rows == cols, jnp.float32(1.0), jnp.float32(0.0))
    eye2 = 2.0 * eye

    def ns_body(_, xi):
      return ns_dot(xi, eye2 - ns_dot(d, xi))

    xi = jax.lax.fori_loop(0, refine_iters, ns_body, xi_out[:])
    # guard residual at parity precision, as in refine_inverse_guarded
    res = jnp.max(jnp.abs(_dot(d, xi) - eye))
    if boost_tol is not None:
      # residual-ADAPTIVE depth (invertible_linear boost semantics):
      # above the tier's boost tol, two extra refinements run and the
      # residual is recomputed.  A NaN residual skips the boost (NaN >
      # tol is False) and goes straight to the caller's guard.
      def boosted(args):
        xb = ns_body(0, ns_body(0, args[0]))
        return xb, jnp.max(jnp.abs(_dot(d, xb) - eye))

      xi, res = jax.lax.cond(res > boost_tol, boosted, lambda a: a,
                             (xi, res))
    xi_out[:] = xi
    # a running MAX over the segment's steps (the caller's rollback
    # granularity is the whole segment, so per-step values buy nothing,
    # and a (1, 1) VMEM-resident block is Mosaic-tileable where a
    # per-step (k, 1) output is not).  NaNs propagate through maximum
    # here (jnp.maximum keeps NaN), so a diverged step stays visible.
    res_out[:] = jnp.maximum(res_out[:], res.reshape(1, 1))

    codes = ns_dot(x_ref[0], xi)
    # natural-gradient statistic + update stay HIGHEST in every tier
    # (same policy as the sparse-coding kernels / _TIERS)
    stat = _tdot(codes, jnp.sign(codes))
    if num_devices > 1:
      # fixed-order slot sum -> bitwise-identical global stat on every
      # chip, so the replicated dictionary never drifts across the mesh
      comm, send_sem, recv_sem = comm_refs
      stat = value_allreduce(
          comm, send_sem, recv_sem, stat, phase=jax.lax.rem(step, 2),
          my_idx=jax.lax.axis_index(axis_name),
          num_devices=num_devices)
    m = stat * inv_b - eye

    def upd_body(_, dd):
      return dd + stepsize * _dot(m, dd)

    d_out[:] = jax.lax.fori_loop(0, upd_num_iters, upd_body, d)

  return kernel


def _make_ica_stats_kernel(refine_iters, mxu, boost_tol=None):
  """Per-step DP variant: NS refresh + codes + the shard's UNAVERAGED
  natural-gradient statistic (no update -- the caller psums the stat
  and updates replicated)."""
  ns_dot = _make_ns_dot(mxu)

  def kernel(d_ref, xi_ref, x_ref, xi_out, stat_out, res_out):
    d = d_ref[:]
    n_pad = d.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    eye = jnp.where(rows == cols, jnp.float32(1.0), jnp.float32(0.0))
    eye2 = 2.0 * eye

    def ns_body(_, xi):
      return ns_dot(xi, eye2 - ns_dot(d, xi))

    xi = jax.lax.fori_loop(0, refine_iters, ns_body, xi_ref[:])
    res = jnp.max(jnp.abs(_dot(d, xi) - eye))
    if boost_tol is not None:
      def boosted(args):
        xb = ns_body(0, ns_body(0, args[0]))
        return xb, jnp.max(jnp.abs(_dot(d, xb) - eye))

      xi, res = jax.lax.cond(res > boost_tol, boosted, lambda a: a,
                             (xi, res))
    xi_out[:] = xi
    res_out[:] = res.reshape(1, 1)
    codes = ns_dot(x_ref[:], xi)
    stat_out[:] = _tdot(codes, jnp.sign(codes))

  return kernel


@functools.partial(
    jax.jit, static_argnames=("refine_iters", "mxu", "boost_tol",
                              "interpret"))
def ica_solve_stats_pallas(dictionary, inverse_estimate, batch, *,
                           refine_iters=5, mxu="highest",
                           boost_tol=None, interpret=False):
  """One fused kernel: warm Newton-Schulz inverse refresh + codes +
  this batch (shard)'s UNAVERAGED natural-gradient statistic
  codes^T sign(codes).

  Returns (new_inverse, stat_sum (n, n), residual).  DP contract
  (same shape as fused_solve_stats_pallas's): psum stat_sum over the
  shards / global_b is exactly the single-device batch-mean statistic,
  so the caller updates replicated via
  ica_natural_gradient._update_from_stat; the refresh depends only on
  the replicated dictionary, so every shard computes the identical
  inverse and residual (no psum needed for either).
  """
  b, n = batch.shape
  assert dictionary.shape == (n, n) and inverse_estimate.shape == (n, n)
  assert n % _LANES == 0, n
  b_pad = round_up(b, _SUBLANES)
  x_in = jnp.pad(jnp.asarray(batch, jnp.float32),
                 ((0, b_pad - b), (0, 0)))
  kernel = _make_ica_stats_kernel(int(refine_iters), str(mxu),
                                  boost_tol)
  zero = lambda i: (0, 0)
  out = pl.pallas_call(
      kernel,
      grid=(1,),
      in_specs=[
          pl.BlockSpec((n, n), zero),
          pl.BlockSpec((n, n), zero),
          pl.BlockSpec((b_pad, n), zero),
      ],
      out_specs=[
          pl.BlockSpec((n, n), zero),
          pl.BlockSpec((n, n), zero),
          pl.BlockSpec((1, 1), zero),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((n, n), jnp.float32),
          jax.ShapeDtypeStruct((n, n), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
      ],
      interpret=interpret,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=32 * 1024 * 1024) if not interpret else None,
  )(jnp.asarray(dictionary, jnp.float32),
    jnp.asarray(inverse_estimate, jnp.float32), x_in)
  xi_fin, stat, res = out
  return xi_fin, stat, res[0, 0]


@functools.partial(
    jax.jit, static_argnames=("refine_iters", "upd_num_iters", "mxu",
                              "boost_tol", "interpret"))
def fused_ica_train_segment_pallas(dictionary, inverse_estimate,
                                   batches, stepsize, *,
                                   refine_iters=5, upd_num_iters=1,
                                   mxu="highest", boost_tol=None,
                                   interpret=False):
  """Run a whole ICA training segment in one kernel launch.

  batches: (k, b, n); dictionary / inverse_estimate: (n, n) with
  n a multiple of 128 (`fused_ica_segment_supported`).

  Returns (final_dictionary, final_inverse, max_residual) where
  max_residual is the MAX over the segment's steps of each step's
  post-refinement max|D X - I| -- the same quantity
  invertible_linear.refine_inverse_guarded gates per step (NaN-safe:
  a diverged step's NaN residual survives the running max).  Callers
  MUST check it against the guard tolerance and rerun the segment on
  the guarded XLA path if it exceeded (rare divergence regime); see
  training/ica._fused_segment_runner.
  """
  k, b, n = batches.shape
  assert dictionary.shape == (n, n) and inverse_estimate.shape == (n, n)
  assert n % _LANES == 0, n
  b_pad = round_up(b, _SUBLANES)
  x_in = jnp.pad(jnp.asarray(batches, jnp.float32),
                 ((0, 0), (0, b_pad - b), (0, 0)))
  scalars = jnp.stack([jnp.asarray(stepsize, jnp.float32),
                       jnp.float32(1.0 / b)])

  kernel = _make_ica_kernel(int(refine_iters), int(upd_num_iters),
                            str(mxu), boost_tol)
  const = lambda *_: (0, 0)
  out = pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=1,
          grid=(k,),
          in_specs=[
              pl.BlockSpec(memory_space=pl.ANY),  # d: pinned at step 0
              pl.BlockSpec(memory_space=pl.ANY),  # xi: pinned at step 0
              pl.BlockSpec((1, b_pad, n), lambda i, *_: (i, 0, 0)),
          ],
          out_specs=[
              pl.BlockSpec((n, n), const),
              pl.BlockSpec((n, n), const),
              pl.BlockSpec((1, 1), const),
          ],
          scratch_shapes=[pltpu.VMEM((2, n, n), jnp.float32),
                          pltpu.SemaphoreType.DMA((2,))]),
      out_shape=[
          jax.ShapeDtypeStruct((n, n), jnp.float32),
          jax.ShapeDtypeStruct((n, n), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
      ],
      interpret=interpret,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=32 * 1024 * 1024) if not interpret else None,
  )(scalars, jnp.asarray(dictionary, jnp.float32),
    jnp.asarray(inverse_estimate, jnp.float32), x_in)
  d_fin, xi_fin, res = out
  return d_fin, xi_fin, res[0, 0]


def fused_ica_dp_segment_supported(n, batch_shard_size, num_devices):
  """True when the whole-segment DP ICA kernel covers this per-shard
  geometry: the single-chip state must fit plus the (n, n) comm slots
  (butterfly O(log P) for power-of-2 P, all-to-all 2 P otherwise)."""
  if not fused_ica_segment_supported(n, batch_shard_size):
    return False
  b_pad = round_up(batch_shard_size, _SUBLANES)
  from vtc_tpu.ops.pallas_dp_train import _comm_slots
  vmem = (7 * n * n + 2 * b_pad * n
          + _comm_slots(num_devices) * n * n) * 4
  return vmem <= _DP_VMEM_BUDGET_BYTES


def fused_ica_dp_train_segment_pallas(dictionary, inverse_estimate,
                                      batches, stepsize, *, axis_name,
                                      axis_size, refine_iters=5,
                                      upd_num_iters=1, mxu="highest",
                                      boost_tol=None, interpret=False):
  """Run a whole DATA-PARALLEL ICA training segment as ONE kernel
  launch per chip: Newton-Schulz refresh + codes of the LOCAL batch
  shard + the per-step natural-gradient statistic all-reduced IN-KERNEL
  over ICI (deterministic slot sum -> bitwise-identical replicated
  state on every chip), then the replicated ascent update.  Call
  inside a shard_map whose ``axis_name`` is the mesh's only non-trivial
  axis; ``batches`` is this chip's (k, b_shard, n) shard.  Semantics ==
  lax.scan of [ica_solve_stats_pallas -> stat psum -> replicated
  update] (training/ica._segment_runner_dp fused=True) with the
  per-step launch + epilogue overhead removed; reference update
  semantics dict_update_rules/fully_connected/ica_natural_gradient
  .py:6-35 on the GLOBAL batch-mean statistic.

  Returns (final_dictionary, final_inverse, max_residual) with the
  same caller-side divergence-guard contract as
  `fused_ica_train_segment_pallas`.
  """
  k, b, n = batches.shape
  num_devices = int(axis_size)
  assert dictionary.shape == (n, n) and inverse_estimate.shape == (n, n)
  assert n % _LANES == 0, n
  if not fused_ica_dp_segment_supported(n, b, num_devices):
    raise ValueError("shapes exceed the DP ICA segment kernel's VMEM "
                     "budget; use the per-step fused-DP path")
  b_pad = round_up(b, _SUBLANES)
  x_in = jnp.pad(jnp.asarray(batches, jnp.float32),
                 ((0, 0), (0, b_pad - b), (0, 0)))
  scalars = jnp.stack([jnp.asarray(stepsize, jnp.float32),
                       jnp.float32(1.0 / (b * num_devices))])

  kernel = _make_ica_kernel(int(refine_iters), int(upd_num_iters),
                            str(mxu), boost_tol, axis_name=axis_name,
                            num_devices=num_devices)
  const = lambda *_: (0, 0)
  out = pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=1,
          grid=(k,),
          in_specs=[
              pl.BlockSpec(memory_space=pl.ANY),  # d: pinned at step 0
              pl.BlockSpec(memory_space=pl.ANY),  # xi: pinned at step 0
              pl.BlockSpec((1, b_pad, n), lambda i, *_: (i, 0, 0)),
          ],
          out_specs=[
              pl.BlockSpec((n, n), const),
              pl.BlockSpec((n, n), const),
              pl.BlockSpec((1, 1), const),
          ],
          scratch_shapes=([pltpu.VMEM((2, n, n), jnp.float32),
                           pltpu.SemaphoreType.DMA((2,))]
                          + (allreduce_comm_shapes(num_devices, (n, n))
                             if num_devices > 1 else []))),
      out_shape=[
          jax.ShapeDtypeStruct((n, n), jnp.float32),
          jax.ShapeDtypeStruct((n, n), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
      ],
      interpret=pltpu.InterpretParams() if interpret else False,
      compiler_params=None if interpret else pltpu.CompilerParams(
          vmem_limit_bytes=_DP_VMEM_LIMIT_BYTES),
  )(scalars, jnp.asarray(dictionary, jnp.float32),
    jnp.asarray(inverse_estimate, jnp.float32), x_in)
  d_fin, xi_fin, res = out
  return d_fin, xi_fin, res[0, 0]
