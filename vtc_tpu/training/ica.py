"""ICA dictionary learning trainer.

API parity with reference training/ica.py:12-240: fully-connected only,
square (critically sampled) dictionary, ``ica_natural_gradient`` updates,
iteration-indexed update schedule with a mandatory 0 entry, optional
checkpoint / visualization schedules with pSNR logging.

TPU-native: the per-batch work (exact linear inference + natural-gradient
update) is one fused jitted step.  Inference uses a linear solve of the
current dictionary (the reference explicitly inverts it every batch,
training/ica.py:217 -> invertible_linear.py:26).  Unlike the reference,
``all_params`` is never mutated (the reference pops
'reshaped_kernel_size', training/ica.py:169).
"""
import functools
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from vtc_tpu.analysis_transforms.fully_connected import invertible_linear
from vtc_tpu.dict_update_rules.fully_connected import ica_natural_gradient
from vtc_tpu.training.sparse_coding import iterate_batches
from vtc_tpu.utils import checkpoint as ckpt_util
from vtc_tpu.utils import plotting as plot_utils


@functools.partial(jax.jit, static_argnames=("num_iters",))
def _fused_step(dictionary, batch, stepsize, num_iters):
  codes = invertible_linear._solve_nonortho(batch, dictionary)
  new_dict = ica_natural_gradient._update(
      dictionary, codes, stepsize, num_iters)
  return new_dict, codes


def train_dictionary(image_dataset, init_dictionary, all_params):
  """Train an ICA dictionary; returns the final dictionary.

  all_params: 'num_epochs', 'dictionary_update_algorithm'
  ('ica_natural_gradient'), 'dict_update_param_schedule' (0 mandatory,
  values {'stepsize', 'num_iters'}), optional 'checkpoint_schedule',
  'training_visualization_schedule', 'logging_folder_fullpath',
  'stdout_print_interval', 'reshaped_kernel_size'.
  """
  assert 0 in all_params["dict_update_param_schedule"]
  init_dictionary = jnp.asarray(np.asarray(init_dictionary), jnp.float32)
  assert init_dictionary.shape[0] == init_dictionary.shape[1], (
      "ICA requires a square (critically sampled) dictionary")
  num_epochs = all_params["num_epochs"]
  assert all_params["dictionary_update_algorithm"] == (
      "ica_natural_gradient")
  schedule = all_params["dict_update_param_schedule"]

  logging_path = all_params.get("logging_folder_fullpath")
  ckpt_sched = all_params.get("checkpoint_schedule")
  vis_sched = all_params.get("training_visualization_schedule")
  print_interval = all_params.get("stdout_print_interval", 1000)
  kernel_reshaping = all_params.get("reshaped_kernel_size")
  tb_writer = None
  if ckpt_sched is not None or vis_sched is not None:
    assert logging_path is not None
    logging_path = Path(logging_path)
    logging_path.mkdir(parents=True, exist_ok=True)
    import yaml
    with open(logging_path / "training_params.yaml", "w") as f:
      yaml.dump({k: (sorted(v) if isinstance(v, set) else v)
                 for k, v in all_params.items()
                 if k not in ("checkpoint_schedule",
                              "training_visualization_schedule")},
                f)
  if vis_sched is not None:
    from torch.utils.tensorboard import SummaryWriter
    tb_writer = SummaryWriter(str(logging_path))

  dictionary = init_dictionary
  stepsize = num_iters = None
  start_time = time.time()
  total_iter = 0
  for epoch_idx in range(num_epochs):
    for batch in iterate_batches(image_dataset):
      if total_iter % print_interval == 0:
        print("Iteration", total_iter, "complete")
        print("Time elapsed: {:.1f} seconds".format(
            time.time() - start_time))
        print("-----")
      if total_iter in schedule:
        stepsize = float(schedule[total_iter]["stepsize"])
        num_iters = int(schedule[total_iter]["num_iters"])

      if ckpt_sched is not None and total_iter in ckpt_sched:
        ckpt_util.save_dictionary_checkpoint(
            logging_path, total_iter, np.asarray(dictionary))
      if vis_sched is not None and total_iter in vis_sched:
        codes = invertible_linear.run(batch, dictionary)
        _log_progress(tb_writer, batch, codes, dictionary,
                      kernel_reshaping, total_iter)

      dictionary, _ = _fused_step(dictionary, batch,
                                  jnp.float32(stepsize), num_iters)
      total_iter += 1
    print("Epoch", epoch_idx, "finished")
  if tb_writer is not None:
    tb_writer.flush()
  return dictionary


def _segment_runner(upd_num_iters):
  """jit scanning the fused ICA step (solve + natural gradient) over
  the batch axis with zero Python in the loop."""

  def run(dictionary, batches, stepsize):
    def body(d, batch):
      codes = invertible_linear._solve_nonortho(batch, d)
      return ica_natural_gradient._update(
          d, codes, stepsize, upd_num_iters), ()

    dictionary, _ = jax.lax.scan(body, dictionary, batches)
    return dictionary

  return jax.jit(run)


# training-speed tiers for the scanned ICA hot loop (the Newton-Schulz
# refinements + the codes matmul): tier -> (jax matmul precision for
# those matmuls, divergence-guard residual_tol).  'tensorfloat32' is
# the MXU's native 3-pass bf16x3 product.  The guard tolerance rises
# with the tier because the refined inverse floors at the tier's
# product accuracy instead of fp level (a HIGHEST-precision residual
# check against a 1e-3 tol would otherwise take the LU fallback every
# step, silently negating the tier).  The guard still catches true
# divergence (residual >= 1) in every tier.
#   tier -> (matmul precision, guard residual_tol, BOOST tol).
# The boost tol drives residual-ADAPTIVE refinement depth (BENCH_NOTES
# UPDATE 30d): the default 3 Newton-Schulz refreshes reach the fp
# floor on healthy problems; when the post-refinement residual sits
# above the boost tol (ill-conditioned dictionaries raise the floor),
# two extra refinements run automatically -- so the small default is
# never a silent accuracy downgrade.  Each tier's boost tol sits just
# above that tier's own residual floor (a lower value would fire the
# boost every step and negate the tier).
_TIERS = {
    "highest": ("highest", 1e-3, 1e-6),
    # 5-pass exact-split near-parity tier (BENCH_NOTES UPDATE 29):
    # only the fused Pallas segment kernel implements it (XLA has no
    # 5-pass precision enum), so the XLA fallback runs 'highest'
    # (conservative; the fallback is the rare divergence path).  The
    # guard tolerance sits above the tier's ~1e-4-scale residual floor.
    "bf16x5": ("highest", 3e-3, 1e-4),
    "bf16x3": ("tensorfloat32", 1e-2, 3e-3),
    "bf16": ("bfloat16", 0.3, 0.25),
}


def _segment_runner_tracked(upd_num_iters, refine_iters=3,
                            mxu="highest"):
  """Scanned ICA step with warm Newton-Schulz inverse tracking: the
  per-batch LU solve (latency-bound on TPU) becomes ``refine_iters``
  MXU matmul refinements of the carried D^{-1} estimate plus one codes
  matmul.  Exact-parity grade at the default tier: the natural
  gradient moves D by O(stepsize) per batch and each refinement
  SQUARES the residual, so 3 refinements take even a 2e-1 incoming
  drift to fp level (measured: fp-floor residuals at 20x the bench
  stepsize, BENCH_NOTES UPDATE 30d); the per-step residual guard falls
  back to the exact LU inverse if refinement is ever insufficient or
  diverges (see invertible_linear.refine_inverse_guarded) -- unlike a
  fixed iteration count, under-refinement here is DETECTED, not
  assumed away.  ``mxu`` is the opt-in
  training-speed tier for the refinement + codes matmuls (the
  natural-gradient statistic and update stay at parity precision in
  every tier); see _TIERS."""
  from vtc_tpu.ops.precision import matmul_precision

  precision, guard_tol, boost_tol = _TIERS[mxu]

  def run(dictionary, dinv, batches, stepsize):
    def body(carry, batch):
      d, x = carry
      x = invertible_linear.refine_inverse_guarded(
          d, x, refine_iters, residual_tol=guard_tol,
          precision=precision, boost_tol=boost_tol)
      with matmul_precision(precision):
        codes = batch @ x
      d = ica_natural_gradient._update(d, codes, stepsize, upd_num_iters)
      return (d, x), ()

    (dictionary, dinv), _ = jax.lax.scan(
        body, (dictionary, dinv), batches)
    return dictionary, dinv

  return jax.jit(run)


def _fused_segment_runner(upd_num_iters, refine_iters=3, mxu="highest",
                          interpret=False):
  """Whole-segment fused Pallas ICA runner (ops/pallas_ica_train): D
  and the tracked inverse stay VMEM-resident across the segment;
  returns (dictionary, dinv, max_residual).  The divergence guard of
  the XLA path is preserved by the CALLER: max_residual is the
  segment-max of the per-step post-refinement max|D X - I| (the exact
  quantity refine_inverse_guarded gates on, NaN-safe), checked lazily
  at host-sync points with rollback to the guarded XLA path -- see
  train_dictionary_scanned."""
  from vtc_tpu.ops.pallas_ica_train import fused_ica_train_segment_pallas

  boost_tol = _TIERS[mxu][2]

  def run(dictionary, dinv, batches, stepsize):
    return fused_ica_train_segment_pallas(
        dictionary, dinv, batches, stepsize,
        refine_iters=refine_iters, upd_num_iters=upd_num_iters,
        mxu=mxu, boost_tol=boost_tol, interpret=interpret)

  return run


def _rdma_segment_runner_dp(upd_num_iters, mesh, axis_name, axis_size,
                            refine_iters=3, mxu="highest",
                            interpret=False):
  """Multi-chip ICA segment as ONE whole-segment Pallas kernel PER
  CHIP: the per-step natural-gradient-statistic all-reduce rides
  in-kernel remote DMAs (ops/pallas_ica_train
  .fused_ica_dp_train_segment_pallas), removing the per-step launch +
  epilogue overhead of the fused=True per-step path -- the ICA
  analogue of compiled_epoch._dp_rdma_segment_runner.  Returns
  (dict, dinv, max_residual) with the same lazy divergence-guard
  contract as the single-chip fused runner."""
  from jax.sharding import PartitionSpec as P

  from vtc_tpu.ops.pallas_ica_train import (
      fused_ica_dp_train_segment_pallas)

  boost_tol = _TIERS[mxu][2]

  def run(dictionary, dinv, batches, stepsize):
    return fused_ica_dp_train_segment_pallas(
        dictionary, dinv, batches, stepsize, axis_name=axis_name,
        axis_size=axis_size, refine_iters=refine_iters,
        upd_num_iters=upd_num_iters, mxu=mxu, boost_tol=boost_tol,
        interpret=interpret)

  rep = P()
  sharded = jax.shard_map(
      run, mesh=mesh, in_specs=(rep, rep, P(None, axis_name, None), rep),
      out_specs=(rep, rep, rep), check_vma=False)
  return jax.jit(sharded)


def _segment_runner_dp(upd_num_iters, mesh, warm_inverse,
                       refine_iters=3, mxu="highest", fused=False,
                       interpret=False):
  """Multi-chip ICA segment: lax.scan of [per-shard codes -> one psum
  of the natural-gradient statistic codes^T sign(codes) -> replicated
  update] inside one shard_map.  The statistic is a batch MEAN, so
  psum of per-shard sums / global_b is exactly the single-device value
  (up to float reduction order); the inverse tracking (or the LU
  solve) depends only on the replicated dictionary and runs
  replicated.

  ``fused=True`` is the fused-DP composition: each shard runs the
  refresh + codes + statistic as ONE Pallas kernel per step
  (ops/pallas_ica_train.ica_solve_stats_pallas) and the only
  cross-chip traffic stays the one stat psum.  The runner then returns
  (dict, dinv, max_residual) -- the segment-max of the per-step
  post-refinement residuals (identical on every shard) -- for the
  caller's lazy divergence guard, exactly as in the single-chip fused
  path."""
  from jax.sharding import PartitionSpec as P

  from vtc_tpu.ops.precision import matmul_precision
  from vtc_tpu.parallel.mesh import dp_axes

  axes = dp_axes(mesh)
  size = 1
  for a in axes:
    size *= mesh.shape[a]

  precision, guard_tol, boost_tol = _TIERS[mxu]

  if fused:
    from vtc_tpu.ops.pallas_ica_train import ica_solve_stats_pallas

    def run(dictionary, dinv, batches, stepsize):
      def body(carry, batch_shard):
        d, x, rmax = carry
        x, stat_sum, res = ica_solve_stats_pallas(
            d, x, batch_shard, refine_iters=refine_iters, mxu=mxu,
            boost_tol=boost_tol, interpret=interpret)
        global_b = batch_shard.shape[0] * size
        with matmul_precision():
          stat = jax.lax.psum(stat_sum, axes) / global_b
        d = ica_natural_gradient._update_from_stat(
            d, stat, stepsize, upd_num_iters)
        return (d, x, jnp.maximum(rmax, res)), ()

      (dictionary, dinv, rmax), _ = jax.lax.scan(
          body, (dictionary, dinv, jnp.float32(0.0)), batches)
      return dictionary, dinv, rmax

    rep = P()
    sharded = jax.shard_map(
        run, mesh=mesh, in_specs=(rep, rep, P(None, axes, None), rep),
        out_specs=(rep, rep, rep), check_vma=False)
    return jax.jit(sharded)

  def run(dictionary, dinv, batches, stepsize):
    def body(carry, batch_shard):
      d, x = carry
      if warm_inverse:
        x = invertible_linear.refine_inverse_guarded(
            d, x, refine_iters, residual_tol=guard_tol,
            precision=precision, boost_tol=boost_tol)
        with matmul_precision(precision):
          codes = batch_shard @ x
      else:
        codes = invertible_linear._solve_nonortho(batch_shard, d)
      global_b = batch_shard.shape[0] * size
      with matmul_precision():
        stat = jax.lax.psum(codes.T @ jnp.sign(codes), axes) / global_b
      d = ica_natural_gradient._update_from_stat(
          d, stat, stepsize, upd_num_iters)
      return (d, x), ()

    (dictionary, dinv), _ = jax.lax.scan(
        body, (dictionary, dinv), batches)
    return dictionary, dinv

  rep = P()
  sharded = jax.shard_map(
      run, mesh=mesh, in_specs=(rep, rep, P(None, axes, None), rep),
      out_specs=(rep, rep), check_vma=False)
  return jax.jit(sharded)


def train_dictionary_scanned(training_batches, init_dictionary,
                             all_params):
  """Production fast path for ICA: whole training segments as one
  compiled ``lax.scan`` (the ICA analogue of
  compiled_epoch.train_dictionary_scanned).  Same ``all_params`` schema
  as train_dictionary; ``training_batches`` is a stacked (k, b, n)
  array; returns the final dictionary.

  Multi-chip: all_params['data_parallel'] = a jax.sharding.Mesh (or
  True for the full default mesh) shards each batch over the mesh's
  data axes; the only cross-chip traffic is one psum of the
  natural-gradient statistic per step (see _segment_runner_dp).

  all_params['refine_iters'] (default 3) sets the warm Newton-Schulz
  refreshes per step; each SQUARES the inverse residual, the per-step
  guard detects any insufficiency (exact-LU fallback), and 2 is
  another ~+15% for gentle schedules (BENCH_NOTES UPDATE 30d).

  all_params['train_precision'] ('highest' default | 'bf16x5' |
  'bf16x3' | 'bf16') is the same opt-in training-speed flag as the
  sparse-coding scanned trainer: it tiers the warm-inverse refinement
  + codes matmuls (_TIERS); statistic/update matmuls stay parity
  precision.

  On TPU, eligible configs (warm inverse, geometry passing
  `pallas_ica_train.fused_ica_segment_supported`) auto-run each
  segment as ONE whole-segment fused Pallas kernel with the dictionary
  and tracked inverse VMEM-resident (ops/pallas_ica_train); under
  data_parallel the per-shard refresh + codes + statistic run as one
  kernel per step with a single stat psum (fused-DP composition); the
  divergence guard is preserved via a segment-max residual output
  checked lazily at host-sync points with rollback to the guarded XLA
  path.
  all_params['use_fused'] = False disables it; True forces it
  (interpret mode off-TPU, used by the hermetic tests).
  """
  assert 0 in all_params["dict_update_param_schedule"]
  assert all_params["dictionary_update_algorithm"] == (
      "ica_natural_gradient")
  dictionary = jnp.asarray(np.asarray(init_dictionary), jnp.float32)
  assert dictionary.shape[0] == dictionary.shape[1]
  schedule = all_params["dict_update_param_schedule"]
  num_epochs = all_params["num_epochs"]
  ckpt_sched = all_params.get("checkpoint_schedule") or set()
  vis_sched = all_params.get("training_visualization_schedule") or set()
  logging_path = all_params.get("logging_folder_fullpath")
  kernel_reshaping = all_params.get("reshaped_kernel_size")
  tb_writer = None
  if ckpt_sched or vis_sched:
    assert logging_path is not None
    logging_path = Path(logging_path)
    logging_path.mkdir(parents=True, exist_ok=True)
  if vis_sched:
    from torch.utils.tensorboard import SummaryWriter
    tb_writer = SummaryWriter(str(logging_path))

  from vtc_tpu.training.sparse_coding import as_device_array
  training_batches = as_device_array(training_batches, jnp.float32)
  k = training_batches.shape[0]
  total_iters = num_epochs * k
  boundaries = sorted(
      ({0, total_iters} | set(schedule) | set(ckpt_sched)
       | set(vis_sched) | {e * k for e in range(num_epochs + 1)}))
  boundaries = [x for x in boundaries if 0 <= x <= total_iters]

  # warm inverse tracking (default): seed D^{-1} exactly once, then
  # refresh with 5 Newton-Schulz matmul iterations per batch instead
  # of a per-batch LU solve (residual r -> r^32: fp-level even when an
  # aggressive schedule moves the dictionary tens of percent per batch;
  # ten (n, n) matmuls still cost ~2 us vs ~100+ us for the LU).  A
  # per-step residual check falls back to the exact LU inverse should
  # refinement ever diverge (||I - D X|| >= 1 regime), so a bad
  # inverse can never propagate.  all_params['warm_inverse']=False
  # restores the literal per-batch solve.
  warm_inverse = bool(all_params.get("warm_inverse", True))
  dinv = (invertible_linear.exact_inverse(dictionary)
          if warm_inverse else None)

  # opt-in training-speed tier, same flag as the sparse-coding scanned
  # trainer (compiled_epoch.train_dictionary_scanned): tiers the
  # Newton-Schulz refinements + codes matmul (see _TIERS); the
  # natural-gradient statistic/update stay parity precision.  Requires
  # warm inverse tracking (the LU-solve path has no matmul to tier).
  mxu = str(all_params.get("train_precision", "highest"))
  assert mxu in _TIERS, (
      "train_precision must be 'highest', 'bf16x5', 'bf16x3', or "
      "'bf16', got "
      f"{mxu!r}")
  assert mxu == "highest" or warm_inverse, (
      "train_precision tiers require warm_inverse=True (the exact "
      "per-batch LU solve has no hot matmul to tier)")

  data_parallel = all_params.get("data_parallel", False)
  dp_mesh = None
  if data_parallel:
    from vtc_tpu import parallel as vtc_parallel
    dp_mesh = (data_parallel if hasattr(data_parallel, "shape")
               else vtc_parallel.make_mesh())
    if dinv is None:
      # the DP runner carries the inverse slot either way; unused when
      # warm_inverse is off (codes come from the per-shard LU solve)
      dinv = jnp.zeros_like(dictionary)

  # whole-segment fused Pallas path (ops/pallas_ica_train): D + the
  # tracked inverse stay VMEM-resident across each compiled segment.
  # The per-step divergence guard is preserved OPTIMISTICALLY: the
  # kernel emits every step's post-refinement residual, and the checks
  # drain lazily at the host-sync points the trainer already has
  # (checkpoints / visualization / training end) so the hot loop stays
  # sync-free; a failed check rolls back to the diverged chunk's input
  # state and reruns from there on the per-step-guarded XLA path.
  from vtc_tpu.ops.pallas_ica_train import fused_ica_segment_supported
  guard_tol = _TIERS[mxu][1]
  # Newton-Schulz refreshes per step (all_params['refine_iters']).
  # Each refresh SQUARES the residual, so 3 takes even a ~2e-1 drift
  # to fp level; the per-step guard residual DETECTS any config where
  # that is insufficient and the trainer falls back to the exact path
  # (measured: fp-floor residuals at 20x the bench stepsize; refine=2
  # is another +15% for configs whose drift allows it -- BENCH_NOTES
  # UPDATE 30d).
  refine = int(all_params.get("refine_iters", 3))
  uf = all_params.get("use_fused")  # None = auto (TPU), True = force
  fused_geom_ok = fused_ica_segment_supported(
      dictionary.shape[0], training_batches.shape[1])
  if uf is True and not (warm_inverse and fused_geom_ok):
    import warnings
    warnings.warn(
        "use_fused=True but the fused ICA kernel does not support this "
        "configuration (needs lipschitz-free warm_inverse and an "
        "MXU-aligned square dictionary; see "
        "pallas_ica_train.fused_ica_segment_supported) -- running the "
        "XLA path instead", stacklevel=2)
  fused_on = (warm_inverse and fused_geom_ok
              and (uf is True
                   or (uf is None and jax.default_backend() == "tpu")))
  use_fused = fused_on and not data_parallel
  use_fused_dp = fused_on and bool(data_parallel)
  fused_interpret = jax.default_backend() != "tpu"
  # whole-segment DP kernel (in-kernel RDMA stat all-reduce): needs the
  # sharded data axis to be the mesh's ONLY non-trivial axis (logical
  # RDMA device ids == the axis index), comm slots within the VMEM
  # budget, and -- off-TPU -- a spare host device thread for the
  # interpreter (see ops/pallas_dp_train)
  use_rdma_dp = False
  rdma_axis = None
  rdma_size = 1
  if use_fused_dp:
    from vtc_tpu.ops.pallas_ica_train import fused_ica_dp_segment_supported
    from vtc_tpu.parallel.mesh import dp_axes
    axes = dp_axes(dp_mesh)
    nontrivial = [a for a in dp_mesh.axis_names if dp_mesh.shape[a] > 1]
    if (len(axes) >= 1 and "dcn" not in dp_mesh.axis_names
        and (nontrivial == [axes[0]] or not nontrivial)):
      rdma_axis = axes[0]
      rdma_size = dp_mesh.shape[rdma_axis]
      global_b = training_batches.shape[1]
      use_rdma_dp = (
          global_b % rdma_size == 0
          and fused_ica_dp_segment_supported(
              dictionary.shape[0], global_b // rdma_size, rdma_size)
          and (jax.default_backend() == "tpu"
               or rdma_size < len(jax.devices())))
  pending = []  # optimistic fused chunks awaiting their guard check

  def _drain_guard():
    nonlocal dictionary, dinv
    bad = None
    for i, ent in enumerate(pending):
      # NOT (res < tol): NaN residuals must count as diverged
      if not bool(np.all(np.asarray(ent["res"]) < guard_tol)):
        bad = i
        break
    if bad is not None:
      ent = pending[bad]
      dictionary, dinv = ent["d_in"], ent["dinv_in"]
      for ent2 in pending[bad:]:  # everything after is stale too
        fb = (_segment_runner_dp(ent2["upd_niters"], dp_mesh,
                                 warm_inverse, refine_iters=refine,
                                 mxu=mxu)
              if dp_mesh is not None
              else _segment_runner_tracked(ent2["upd_niters"],
                                           refine_iters=refine,
                                           mxu=mxu))
        dictionary, dinv = fb(
            dictionary, dinv,
            training_batches[ent2["pos"]:ent2["pos"] + ent2["chunk"]],
            jnp.float32(ent2["stepsize"]))
    pending.clear()

  stepsize = upd_niters = None
  runners = {}
  start = time.time()
  for seg_start, seg_end in zip(boundaries[:-1], boundaries[1:]):
    if seg_start in schedule:
      stepsize = float(schedule[seg_start]["stepsize"])
      upd_niters = int(schedule[seg_start]["num_iters"])
    if seg_start in ckpt_sched:
      _drain_guard()
      ckpt_util.save_dictionary_checkpoint(
          logging_path, seg_start, np.asarray(dictionary))
    if seg_start in vis_sched:
      _drain_guard()
      epoch0 = seg_start // k
      batch = training_batches[seg_start - epoch0 * k]
      codes = invertible_linear.run(batch, dictionary)
      _log_progress(tb_writer, batch, codes, dictionary,
                    kernel_reshaping, seg_start)
    if seg_end == seg_start:
      continue
    epoch = seg_start // k
    lo, hi = seg_start - epoch * k, seg_end - epoch * k
    assert 0 <= lo < hi <= k
    pos = lo
    while pos < hi:  # power-of-two chunks: O(log k) compiled shapes
      chunk = 1 << ((hi - pos).bit_length() - 1)
      key = (upd_niters, chunk)
      if key not in runners:
        if dp_mesh is not None and use_rdma_dp:
          runners[key] = _rdma_segment_runner_dp(
              upd_niters, dp_mesh, rdma_axis, rdma_size,
              refine_iters=refine, mxu=mxu, interpret=fused_interpret)
        elif dp_mesh is not None:
          runners[key] = _segment_runner_dp(
              upd_niters, dp_mesh, warm_inverse, refine_iters=refine,
              mxu=mxu, fused=use_fused_dp, interpret=fused_interpret)
        elif use_fused:
          runners[key] = _fused_segment_runner(
              upd_niters, refine_iters=refine, mxu=mxu,
              interpret=fused_interpret)
        else:
          runners[key] = (_segment_runner_tracked(
              upd_niters, refine_iters=refine, mxu=mxu)
                          if warm_inverse
                          else _segment_runner(upd_niters))
      if use_fused or use_fused_dp:
        ent = {"pos": pos, "chunk": chunk, "d_in": dictionary,
               "dinv_in": dinv, "stepsize": stepsize,
               "upd_niters": upd_niters}
        dictionary, dinv, ent["res"] = runners[key](
            dictionary, dinv, training_batches[pos:pos + chunk],
            jnp.float32(stepsize))
        pending.append(ent)
      elif warm_inverse or dp_mesh is not None:
        dictionary, dinv = runners[key](
            dictionary, dinv, training_batches[pos:pos + chunk],
            jnp.float32(stepsize))
      else:
        dictionary = runners[key](
            dictionary, training_batches[pos:pos + chunk],
            jnp.float32(stepsize))
      pos += chunk
  _drain_guard()
  if total_iters in ckpt_sched:
    ckpt_util.save_dictionary_checkpoint(
        logging_path, total_iters, np.asarray(dictionary))
  if total_iters in vis_sched:
    batch = training_batches[k - 1]
    codes = invertible_linear.run(batch, dictionary)
    _log_progress(tb_writer, batch, codes, dictionary, kernel_reshaping,
                  total_iters)
  if tb_writer is not None:
    tb_writer.flush()
  print("scanned ICA training done in {:.2f}s ({} iterations)".format(
      time.time() - start, total_iters))
  return dictionary


def _log_progress(tb_writer, batch, codes, dictionary, reshaping, step):
  """pSNR scalar + dictionary tile images (reference ica.py:75-114)."""
  import io

  from PIL import Image
  from matplotlib import pyplot as plt

  batch_np = np.asarray(batch)
  recons = np.asarray(codes) @ np.asarray(dictionary)
  sig_mag = np.max(batch_np) - np.min(batch_np)
  psnrs = [plot_utils.compute_pSNR(batch_np[i], recons[i],
                                   manual_sig_mag=sig_mag)
           for i in range(recons.shape[0])]
  psnrs = [p for p in psnrs if p != np.inf]
  tb_writer.add_scalar("Average pSNR of reconstructions",
                       float(np.mean(psnrs)), step)
  for renorm, tag in ((True, "renormalized"), (False, "no renorm")):
    figs = plot_utils.display_dictionary(
        np.asarray(dictionary), renormalize=renorm, reshaping=reshaping,
        plot_title="Current dictionary ({}), iter {}".format(tag, step))
    for fig_idx, fig in enumerate(figs):
      buf = io.BytesIO()
      fig.savefig(buf, format="png")
      plt.close(fig)
      buf.seek(0)
      tb_writer.add_image(
          "Current dictionary ({}), fig {} of {}".format(
              tag, fig_idx + 1, len(figs)),
          np.array(Image.open(buf))[:, :, :3], global_step=step,
          dataformats="HWC")
