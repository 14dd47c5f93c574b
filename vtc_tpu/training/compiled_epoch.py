"""Production fast path: whole training segments as one compiled scan.

``train_dictionary`` (vtc_tpu.training.sparse_coding) dispatches one
fused step per batch from Python -- fine when per-call overhead is
negligible, but the TPU-native production shape is a ``lax.scan`` over
HBM-resident batches with zero Python in the loop (this is also what
bench.py measures).  ``train_dictionary_scanned`` provides that as a
first-class API with the SAME ``all_params`` schema and identical
semantics: the epoch is split into segments at every scheduled event
(parameter change, checkpoint, visualization, reset/prune), each segment
runs as one compiled scan, and events execute host-side at the exact
iteration they are scheduled for.

Requirements vs the flexible trainer: datasets must be stacked arrays
(k, b, n) / (k, b, c, h, w) (use data.jax_pipeline.DevicePatchPipeline.
sample_epoch or np.reshape).  Early-stopped inference
(all_params['early_stopping_epsilon'], reference solver rule
fc/ista_fista.py:135-144) is supported everywhere: the fc whole-segment
Pallas kernel runs the stop test IN-KERNEL (lax.while_loop per step,
batch-global mean over the VMEM-resident batch); every other
single-chip config scans the exact XLA while_loop step; and under
data_parallel the DP scan step keeps the reference's batch-GLOBAL
criterion with one scalar pmean of the shard-local mean |delta| per
iteration inside the while predicate (build_dp_local_step) -- all
shards stop at the same iteration, codes == the single-device solve on
the concatenated batch.

Segment execution picks the fastest eligible backend automatically:

  * whole-segment Pallas kernels (ops/pallas_train_step.py) on TPU for
    fully-connected configs with warm Lipschitz tracking -- the entire
    segment is ONE kernel launch with the dictionary / Hessian EMA /
    eigenvector VMEM-resident across steps (single-tile, batch-tiled,
    and subspace/group variants);
  * a lax.scan of the fused XLA step otherwise;
  * with all_params['data_parallel'] (True or a Mesh), a lax.scan of
    the psum-reduced data-parallel step inside one shard_map
    (multi-chip; supports multi-slice 'dcn' meshes).
"""
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from vtc_tpu.training import sparse_coding as sc

# Debug hook for the HBM-streaming path: when a test sets this to a
# list, the trainer appends ("prefetch", pos) when it issues the
# one-ahead chunk transfer and ("hit"|"miss", pos) when a chunk is
# staged -- a "hit" means the buffer came from the prefetch slot
# (transfer issued during the PREVIOUS chunk's compute window), a
# "miss" means a synchronous stage.  Timing evidence that the overlap
# pays on the real device is in BENCH_NOTES (streaming A/B).
stream_trace = None


@jax.jit
def _reshuffle(batches, key):
  """Sample-level epoch re-permutation on device (torch-DataLoader
  shuffle semantics).  MODULE-level jit on purpose: defined inside the
  trainer it would be a fresh closure per call, and re-tracing this
  1M-row permutation program costs ~15 s through this runtime's
  remote-compile relay on every training run."""
  k, b = batches.shape[0], batches.shape[1]
  flat = batches.reshape((k * b,) + batches.shape[2:])
  perm = jax.random.permutation(key, flat.shape[0])
  return flat[perm].reshape(batches.shape)


def _segment_runner(raw_step, upd_num_iters, warm_power, lip_matrix_fn):
  """jit scanning the fused step over the batch axis.

  With warm_power, the Lipschitz eigenvector rides the scan carry and
  is refreshed with 2 power iterations per batch on the mode's Gram
  matrix.  From an exact eigenpair seed, 2 iterations/step track the
  per-batch eigvalsh to ~1e-6 relative -- identical to 12/step in
  steady state (measured over 300 training steps at the flagship
  config; see tests/test_warm_power.py and BENCH_NOTES.md) -- while
  the refresh is latency-bound sequential matvec work, so fewer
  iterations buy step time directly."""
  from vtc_tpu.ops import lipschitz as lip

  def run(dictionary, hessian, eigvec, batches, sw, n_it, upd_step):
    def body(carry, batch):
      d, h, v = carry
      if warm_power:
        eigval, v = lip.power_iterate(lip_matrix_fn(d), v, num_iters=2)
        inf_step = 1.0 / eigval
      else:
        inf_step = jnp.float32(0.0)  # raw_step computes it internally
      d, h, _ = raw_step(d, h, batch, sw, n_it, upd_step,
                         upd_num_iters, inf_step)
      return (d, h, v), ()

    (dictionary, hessian, eigvec), _ = jax.lax.scan(
        body, (dictionary, hessian, eigvec), batches)
    return dictionary, hessian, eigvec

  return jax.jit(run)


def _fused_segment_runner(variant, update_alg, upd_niters, nonneg, hard,
                          renormalize, mxu="highest", early_eps=None):
  """Whole segment as ONE Pallas kernel launch (ops/pallas_train_step):
  dictionary/Hessian/eigenvector ride VMEM across all steps, batches
  stream HBM->VMEM with double buffering.  Same float32 semantics as
  _segment_runner with warm_power + the 'gram' formulation.
  power_iters=2 is safe HERE because the trainer always seeds the
  eigvec with an exact eigenpair (seed_eigvec) and re-seeds after
  dictionary jumps; the public kernel default stays at 12.
  ``mxu`` selects the opt-in training-speed tier
  (all_params['train_precision']: 'highest' | 'bf16x3' recommended
  speed tier | 'bf16' screening tier)."""
  from vtc_tpu.ops.pallas_train_step import fused_train_segment_pallas

  def run(dictionary, hessian, eigvec, batches, sw, n_it, upd_step):
    dictionary, hessian, eigvec, _ = fused_train_segment_pallas(
        dictionary, hessian, eigvec, batches, sw, n_it, upd_step,
        variant=variant, update_alg=update_alg,
        upd_num_iters=upd_niters, nonneg=nonneg, hard=hard,
        renormalize=renormalize, power_iters=2, mxu=mxu,
        early_stopping_epsilon=early_eps)
    return dictionary, hessian, eigvec

  return run


def _fused_conv_segment_runner(variant, update_alg, upd_niters, nonneg,
                               hard, renormalize, kernel_stride,
                               padding, mxu="highest", early_eps=None):
  """Convolutional counterpart of _fused_segment_runner: the whole
  segment runs as one Pallas kernel in stride-block space
  (ops/pallas_conv_train), with the packed dictionary / Hessian /
  eigenvector VMEM-resident across steps and per-step image-block
  canvases streamed with double buffering.  In-kernel early stopping
  (``early_eps``) needs the whole batch as one tile
  (fused_conv_segment_supported gates)."""
  from vtc_tpu.ops.pallas_conv_train import (
      fused_conv_train_segment_pallas)

  def run(dictionary, hessian, eigvec, batches, sw, n_it, upd_step):
    dictionary, hessian, eigvec, _ = fused_conv_train_segment_pallas(
        dictionary, hessian, eigvec, batches, sw, n_it, upd_step,
        kernel_stride=kernel_stride, padding=padding, variant=variant,
        update_alg=update_alg, upd_num_iters=upd_niters, nonneg=nonneg,
        hard=hard, renormalize=renormalize, power_iters=2, mxu=mxu,
        early_stopping_epsilon=early_eps)
    return dictionary, hessian, eigvec

  return run


def _fused_group_segment_runner(variant, update_alg, upd_niters, hard,
                                renormalize, group_assignments,
                                alignment_penalty=0.0, mxu="highest",
                                early_eps=None):
  """Subspace counterpart of _fused_segment_runner (the anti-alignment
  regularizer and the in-kernel early-stop while_loop run in-kernel
  too; see ops/pallas_train_step.fused_group_train_segment_pallas)."""
  from vtc_tpu.ops.pallas_train_step import (
      fused_group_train_segment_pallas)

  def run(dictionary, hessian, eigvec, batches, sw, n_it, upd_step):
    dictionary, hessian, eigvec, _ = fused_group_train_segment_pallas(
        dictionary, hessian, eigvec, batches, sw, n_it, upd_step,
        group_assignments=group_assignments, variant=variant,
        update_alg=update_alg, upd_num_iters=upd_niters, hard=hard,
        renormalize=renormalize, power_iters=2,
        alignment_penalty=float(alignment_penalty), mxu=mxu,
        early_stopping_epsilon=early_eps)
    return dictionary, hessian, eigvec

  return run


def _dp_fused_segment_runner(local_step, mesh, conv_mode=False):
  """Multi-chip segment with the fused Pallas solver: lax.scan of
  [one solve+stats kernel per shard -> one psum of the update stats
  over ICI -> replicated update] inside one shard_map.  The warm
  Lipschitz eigenvector rides the scan carry (replicated -- every
  shard refreshes it identically from the replicated dictionary), so
  multi-chip DP keeps the same warm-tracking stepsize semantics and
  per-chip kernel speed as the single-chip fused path.  fc stats are
  gram-form (C, B, stat); conv stats are the block-space gradient sum
  (see parallel.build_dp_fused_local_step /
  build_dp_conv_fused_local_step)."""
  from jax.sharding import PartitionSpec as P

  from vtc_tpu.parallel.mesh import dp_axes

  def run(dictionary, hessian, eigvec, batches, sw, n_it, upd_step):
    def body(carry, batch_shard):
      d, h, v = carry
      d, h, v, _ = local_step(d, h, v, batch_shard, sw, n_it, upd_step)
      return (d, h, v), ()

    (dictionary, hessian, eigvec), _ = jax.lax.scan(
        body, (dictionary, hessian, eigvec), batches)
    return dictionary, hessian, eigvec

  rep = P()
  axes = dp_axes(mesh)
  batch_spec = (P(None, axes, None, None, None) if conv_mode
                else P(None, axes, None))
  sharded = jax.shard_map(
      run, mesh=mesh,
      in_specs=(rep, rep, rep, batch_spec, rep, rep, rep),
      out_specs=(rep, rep, rep), check_vma=False)
  return jax.jit(sharded)


def _dp_rdma_segment_runner(mesh, axis_name, axis_size, variant,
                            update_alg, upd_niters, nonneg, hard,
                            renormalize, mxu="highest", early_eps=None):
  """Multi-chip segment as ONE whole-segment Pallas kernel PER CHIP:
  the per-step cross-chip reduction of the gram-form update stats runs
  IN-KERNEL over ICI (async remote DMAs, fixed-order slot sum -- see
  ops/pallas_dp_train), removing the per-step launch + epilogue
  overhead that cost the per-step fused-DP path ~40% of single-chip
  speed (BENCH_NOTES UPDATE 10).  Semantics == the per-step path:
  every step's replicated update sees the GLOBAL batch statistics,
  warm Lipschitz tracking included.  Off-TPU the kernel runs in TPU
  interpret mode, which simulates the remote DMAs (how the 8-CPU mesh
  tests and the driver dryrun execute it)."""
  from jax.sharding import PartitionSpec as P

  from vtc_tpu.ops.pallas_dp_train import fused_dp_train_segment_pallas

  def run(dictionary, hessian, eigvec, batches, sw, n_it, upd_step):
    d, h, v, _ = fused_dp_train_segment_pallas(
        dictionary, hessian, eigvec, batches, sw, n_it, upd_step,
        axis_name=axis_name, axis_size=axis_size, variant=variant,
        update_alg=update_alg, upd_num_iters=upd_niters, nonneg=nonneg,
        hard=hard, renormalize=renormalize, power_iters=2,
        interpret=jax.default_backend() != "tpu", mxu=mxu,
        early_stopping_epsilon=early_eps)
    return d, h, v

  rep = P()
  sharded = jax.shard_map(
      run, mesh=mesh,
      in_specs=(rep, rep, rep, P(None, axis_name, None), rep, rep, rep),
      out_specs=(rep, rep, rep), check_vma=False)
  return jax.jit(sharded)


def _dp_rdma_conv_segment_runner(mesh, axis_name, axis_size, variant,
                                 update_alg, upd_niters, nonneg, hard,
                                 renormalize, kernel_stride, padding,
                                 mxu="highest", early_eps=None):
  """Convolutional counterpart of _dp_rdma_segment_runner: each chip
  runs its ENTIRE segment as one stride-block-space Pallas kernel with
  the per-step update-stats all-reduce riding in-kernel remote DMAs
  (ops/pallas_conv_dp_train).  Early stopping (``early_eps``) runs the
  batch-GLOBAL reference stop test in-kernel too (one small slot
  all-reduce of the shard |delta| sums per iteration)."""
  from jax.sharding import PartitionSpec as P

  from vtc_tpu.ops.pallas_conv_dp_train import (
      fused_conv_dp_train_segment_pallas)

  def run(dictionary, hessian, eigvec, batches, sw, n_it, upd_step):
    d, h, v, _ = fused_conv_dp_train_segment_pallas(
        dictionary, hessian, eigvec, batches, sw, n_it, upd_step,
        kernel_stride=kernel_stride, padding=padding,
        axis_name=axis_name, axis_size=axis_size, variant=variant,
        update_alg=update_alg, upd_num_iters=upd_niters, nonneg=nonneg,
        hard=hard, renormalize=renormalize, power_iters=2,
        interpret=jax.default_backend() != "tpu", mxu=mxu,
        early_stopping_epsilon=early_eps)
    return d, h, v

  rep = P()
  sharded = jax.shard_map(
      run, mesh=mesh,
      in_specs=(rep, rep, rep,
                P(None, axis_name, None, None, None), rep, rep, rep),
      out_specs=(rep, rep, rep), check_vma=False)
  return jax.jit(sharded)


def _dp_rdma_group_segment_runner(mesh, axis_name, axis_size, variant,
                                  update_alg, upd_niters, hard,
                                  renormalize, group_assignments,
                                  alignment_penalty=0.0,
                                  mxu="highest", early_eps=None):
  """Subspace (group-sparse) counterpart of _dp_rdma_segment_runner:
  each chip runs its ENTIRE segment as one Pallas kernel with the
  per-step gram-form stats all-reduce riding in-kernel remote DMAs
  (ops/pallas_group_dp_train).  The grouped-Gram warm eigenvector
  rides replicated; the anti-alignment regularizer runs in-kernel on
  the replicated dictionary."""
  from jax.sharding import PartitionSpec as P

  from vtc_tpu.ops.pallas_group_dp_train import (
      fused_group_dp_train_segment_pallas)

  def run(dictionary, hessian, eigvec, batches, sw, n_it, upd_step):
    d, h, v, _ = fused_group_dp_train_segment_pallas(
        dictionary, hessian, eigvec, batches, sw, n_it, upd_step,
        group_assignments=group_assignments, axis_name=axis_name,
        axis_size=axis_size, variant=variant, update_alg=update_alg,
        upd_num_iters=upd_niters, hard=hard, renormalize=renormalize,
        power_iters=2, alignment_penalty=alignment_penalty,
        interpret=jax.default_backend() != "tpu", mxu=mxu,
        early_stopping_epsilon=early_eps)
    return d, h, v

  rep = P()
  sharded = jax.shard_map(
      run, mesh=mesh,
      in_specs=(rep, rep, rep, P(None, axis_name, None), rep, rep, rep),
      out_specs=(rep, rep, rep), check_vma=False)
  return jax.jit(sharded)


def _code_shard_segment_runner(mesh, cs_size, data_size, variant,
                               update_alg, upd_niters, nonneg, hard,
                               renormalize, group_arrays=None,
                               alignment_penalty=0.0, mxu="highest",
                               early_eps=None, stop_count=None):
  """Tensor-parallel segment for beyond-VMEM dictionaries: dictionary
  ROWS sharded over the mesh's 'code' axis, each chip runs its whole
  segment as ONE Pallas kernel in residual form (never building the
  s x s Gram), and the per-iteration partial-reconstruction psum rides
  in-kernel remote DMAs (ops/pallas_code_shard_train).  Batches shard
  over the 'data' axis (replicated when it is trivial); with a
  nontrivial data axis the per-step update gradient + Hessian stat
  all-reduce over it in-kernel too (TP x DP on one fused path).  The
  dictionary update is otherwise fully local per row shard.  The eigvec
  carry is the n x n Gram's (dim n -- requires s > n, gated by the
  caller).  ``group_arrays`` (from code_shard_group_arrays) selects the
  group-sparse variant: per-shard membership/co-membership blocks are
  indexed by the chip's code-axis position inside the shard_map."""
  from jax.sharding import PartitionSpec as P

  from vtc_tpu.ops.pallas_code_shard_train import (
      fused_code_sharded_train_segment_pallas)

  # row-major logical-device strides of the mesh axes (the in-kernel
  # collectives address peers as base + pos * stride)
  strides = {}
  acc = 1
  for a in reversed(list(mesh.axis_names)):
    strides[a] = acc
    acc *= mesh.shape[a]
  expand_all = comem_all = None
  cs_roll_window = None
  if group_arrays is not None:
    from vtc_tpu.ops.pallas_code_shard_train import (
        roll_window_from_expand_arrays)
    # static check on the host-side membership blocks: contiguous
    # M-aligned block groups take the lane-rotate prox in-kernel
    cs_roll_window = roll_window_from_expand_arrays(group_arrays[0])
    expand_all = jnp.asarray(group_arrays[0])
    if alignment_penalty != 0.0:
      comem_all = jnp.asarray(group_arrays[1])

  def run(d_shard, h_shard, eigvec, batches, sw, n_it, upd_step):
    kw = {}
    if expand_all is not None:
      idx = jax.lax.axis_index("code")
      kw["expand_local"] = jax.lax.dynamic_index_in_dim(
          expand_all, idx, keepdims=False)
      if comem_all is not None:
        kw["comem_local"] = jax.lax.dynamic_index_in_dim(
            comem_all, idx, keepdims=False)
      kw["alignment_penalty"] = alignment_penalty
    d_shard, h_shard, eigvec, _ = (
        fused_code_sharded_train_segment_pallas(
            d_shard, h_shard, eigvec, batches, sw, n_it, upd_step,
            axis_name="code", axis_size=cs_size,
            data_axis_name="data" if data_size > 1 else None,
            data_axis_size=data_size, code_stride=strides["code"],
            data_stride=strides.get("data", 0), variant=variant,
            update_alg=update_alg, upd_num_iters=upd_niters,
            nonneg=nonneg, hard=hard, renormalize=renormalize,
            power_iters=2,
            interpret=jax.default_backend() != "tpu", mxu=mxu,
            early_stopping_epsilon=early_eps, stop_count=stop_count,
            roll_window=cs_roll_window, **kw))
    return d_shard, h_shard, eigvec

  rep = P()
  sharded = jax.shard_map(
      run, mesh=mesh,
      in_specs=(P("code", None), P("code"), rep,
                P(None, "data", None), rep, rep, rep),
      out_specs=(P("code", None), P("code"), rep), check_vma=False)
  return jax.jit(sharded)


def _dp_segment_runner(local_step, mesh, conv_mode):
  """Multi-chip segment: lax.scan of the psum-reduced DP local step
  INSIDE one shard_map -- each device owns its batch shard for the
  whole segment, dictionary/Hessian stay replicated, and the only
  cross-chip traffic is the per-step psum of gradients/statistics over
  ICI.  The eigvec carry is threaded untouched for signature parity
  with the single-chip runner."""
  from jax.sharding import PartitionSpec as P

  from vtc_tpu.parallel.mesh import dp_axes

  def run(dictionary, hessian, eigvec, batches, sw, n_it, upd_step):
    def body(carry, batch_shard):
      d, h = carry
      d, h, _ = local_step(d, h, batch_shard, sw, n_it, upd_step)
      return (d, h), ()

    (dictionary, hessian), _ = jax.lax.scan(
        body, (dictionary, hessian), batches)
    return dictionary, hessian, eigvec

  rep = P()
  axes = dp_axes(mesh)
  batch_spec = (P(None, axes, None, None, None) if conv_mode
                else P(None, axes, None))
  sharded = jax.shard_map(
      run, mesh=mesh,
      in_specs=(rep, rep, rep, batch_spec, rep, rep, rep),
      out_specs=(rep, rep, rep), check_vma=False)
  return jax.jit(sharded)


def train_dictionary_scanned(training_batches, validation_batches,
                             init_dictionary, all_params):
  """Train with compiled multi-batch segments.  Same ``all_params``
  schema as sparse_coding.train_dictionary (early stopping included --
  see the module docstring); returns the final dictionary.

  training_batches: (k, b, n) or (k, b, c, h, w) array; each epoch runs
  over axis 0.  With all_params['shuffle_each_epoch']=True (default
  False) the samples are re-permuted ON DEVICE at every epoch boundary
  (one gather per epoch; the torch-DataLoader semantics reference users
  expect).  all_params['shuffle_seed'] controls the permutation stream.

  Datasets larger than device memory: pass a HOST (numpy) array plus
  all_params['hbm_chunk_steps'] = C.  Segments then stream to the
  device in C-step chunks with one-chunk-ahead asynchronous
  device_put double buffering (device footprint ~2 chunks; the
  transfer of chunk i+1 hides behind chunk i's compute).  The
  trajectory is IDENTICAL to the resident path -- including the
  per-epoch shuffle, which uses the same jax.random permutation
  applied host-side (tests/test_compiled_epoch.py).

  On TPU, eligible configs auto-select whole-segment fused Pallas
  kernels (fc/subspace: ops/pallas_train_step; convolutional:
  ops/pallas_conv_train -- `fused_conv_segment_supported` gates the
  geometry).

  all_params['train_precision'] selects the OPT-IN training-speed tier
  for the fused kernels' FISTA-iteration matmuls:
    'highest' (default) -- the 1e-4 parity contract;
    'bf16x5' (near-parity) -- 5-pass exact-split iteration matmuls,
      ~1.3e-4 codes vs the float64 oracle (3x tighter than bf16x3 but
      just outside the strict 1e-4 bar); fc +9%, subspace +2%
      (BENCH_NOTES UPDATE 29);
    'bf16x3' (RECOMMENDED speed tier) -- 3-pass split, ~1e-4 code
      accuracy, training trajectories track f32 (measured -4.3% final
      LASSO vs f32 at 2000 steps); all three families;
    'bf16' (screening tier) -- single pass, ~1e-1 code accuracy; all
      three families; measured to bias strongly-converged training
      toward denser codes (BENCH_NOTES UPDATE 20).
  Gram builds, the Lipschitz refresh, and every update-path matmul
  stay full precision in every tier.  The tier applies ONLY to the
  fused Pallas kernels -- configs that resolve to the XLA scan paths
  always run parity precision.

  With all_params['data_parallel'], eligible configs run the fused-DP
  composition (one solve+stats kernel per shard + one stats psum per
  step); others scan the psum-per-op DP step.  The train_precision
  tier composes (per-shard solves run the tier, stats stay f32).
  """
  assert 0 in all_params["inference_param_schedule"]
  assert 0 in all_params["dict_update_param_schedule"]
  assert all_params.get("train_precision", "highest") in (
      "highest", "bf16x5", "bf16x3", "bf16"), (
      "train_precision must be 'highest', 'bf16x5', 'bf16x3', or "
      f"'bf16', got {all_params.get('train_precision')!r}")
  mode = all_params["mode"]
  num_epochs = all_params["num_epochs"]
  inference_alg = all_params["code_inference_algorithm"]
  update_alg = all_params["dictionary_update_algorithm"]
  inf_sched = all_params["inference_param_schedule"]
  upd_sched = all_params["dict_update_param_schedule"]
  kernel_stride = tuple(all_params["strides"]) if (
      mode == "convolutional") else None
  padding = all_params.get("padding") if mode == "convolutional" else None
  group_assignments = all_params.get("group_assignments")
  ckpt_sched = all_params.get("checkpoint_schedule") or set()
  vis_sched = all_params.get("training_visualization_schedule") or set()
  rp_sched = all_params.get("dict_element_rp_schedule") or {}
  logging_path = all_params.get("logging_folder_fullpath")
  if ckpt_sched or vis_sched:
    assert logging_path is not None
    logging_path = Path(logging_path)
    logging_path.mkdir(parents=True, exist_ok=True)
  tb_writer = None
  if vis_sched:
    from torch.utils.tensorboard import SummaryWriter
    tb_writer = SummaryWriter(str(logging_path))

  # HBM streaming: with all_params['hbm_chunk_steps'] = C and a HOST
  # (numpy) training array, the epoch is NOT made device-resident up
  # front -- segments are fed to the compiled runners in C-step chunks
  # with one-chunk-ahead async device_put double buffering, capping
  # device memory at ~2 chunks while the transfer of chunk i+1 hides
  # behind the compute of chunk i.  For datasets larger than HBM this
  # is the production path (the reference's DataLoader mode streams
  # per batch, training/sparse_coding.py:511-512).
  stream_steps = all_params.get("hbm_chunk_steps")
  if stream_steps is not None:
    stream_steps = int(stream_steps)
    training_batches = np.asarray(training_batches)
  else:
    training_batches = sc.as_device_array(training_batches)
  k = training_batches.shape[0]
  b_per = training_batches.shape[1]
  total_iters = num_epochs * k
  shuffle_each_epoch = bool(all_params.get("shuffle_each_epoch", False))
  shuffle_key = jax.random.PRNGKey(
      int(all_params.get("shuffle_seed", 0)))

  # iteration indices at which python must regain control
  boundaries = sorted(
      {0, total_iters}
      | set(inf_sched) | set(upd_sched) | set(ckpt_sched)
      | set(vis_sched) | set(rp_sched))
  boundaries = [x for x in boundaries if 0 <= x <= total_iters]
  # epoch edges too (the scan slices are per-epoch contiguous)
  boundaries = sorted(set(boundaries) | {e * k
                                         for e in range(num_epochs + 1)})

  # 'power_warm' (default): the Lipschitz eigenvector rides the scan
  # carry instead of a cold per-batch eigensolve -- the production
  # configuration (same numbers as bench.py).  Any explicit
  # lipschitz_method reverts to in-step recomputation.
  lipschitz_method = all_params.get("lipschitz_method", "power_warm")
  # multi-chip: all_params['data_parallel'] = True (full mesh) or a
  # jax.sharding.Mesh; segments scan the psum-reduced DP step inside
  # one shard_map (stepsize then comes from the in-step cold solve)
  data_parallel = all_params.get("data_parallel", False)
  early_eps = all_params.get("early_stopping_epsilon")
  if early_eps is not None:
    early_eps = float(early_eps)
  dp_mesh = None
  dp_fused = False
  dp_rdma = False
  dp_rdma_group = False
  dp_rdma_conv = False
  code_sharded = False
  resolved_formulation = all_params.get(
      "fc_formulation",
      "pallas" if jax.default_backend() == "tpu" else "gram")
  if data_parallel:
    from vtc_tpu import parallel as vtc_parallel
    from vtc_tpu.parallel.mesh import dp_axes
    dp_mesh = (data_parallel if hasattr(data_parallel, "shape")
               else vtc_parallel.make_mesh())
    dp_size = 1
    for a in dp_axes(dp_mesh):
      dp_size *= dp_mesh.shape[a]
    # code-axis sharding (TP, SURVEY §2.2): with a 'code' axis > 1,
    # dictionary ROWS shard across chips and each chip runs whole
    # segments in residual form (the s x s Gram is never built, so
    # beyond-VMEM dictionaries stay on a fused path); the per-iteration
    # partial-reconstruction psum rides in-kernel remote DMAs
    # (ops/pallas_code_shard_train).  A nontrivial 'data' axis composes
    # TP x DP on the same kernel: batches shard over it and the
    # per-step update gradient + Hessian stat all-reduce over it
    # in-kernel.  The group-sparse family rides the same kernel when
    # the groups form a shard-aligned disjoint partition
    # (code_shard_group_arrays).
    cs_size = dict(dp_mesh.shape).get("code", 1)
    cs_data_size = dict(dp_mesh.shape).get("data", 1)
    s_total = init_dictionary.shape[0]
    n_input = training_batches.shape[-1]
    cs_group_arrays = None
    cs_penalty = float(all_params.get("subspace_alignment_penalty",
                                      0.0))
    # early stopping under DP: the whole-segment RDMA and code-shard
    # kernels carry the batch-GLOBAL stop test IN-KERNEL (small slot
    # all-reduces of the shard |delta| sums per iteration); configs
    # their gates decline run the exact XLA while_loop DP step (one
    # pmean per iteration inside the predicate -- build_dp_local_step)
    cs_common = (
        mode == "fully-connected"
        and cs_size > 1
        and "dcn" not in dp_mesh.axis_names
        and "data" in dp_mesh.axis_names
        and lipschitz_method == "power_warm"
        and resolved_formulation == "pallas"
        # the warm eigvec carry is the n x n Gram's (dim n)
        and s_total % cs_size == 0 and s_total > n_input
        and training_batches.shape[1] % cs_data_size == 0
        # interpret mode needs a spare host device thread (see
        # ops/pallas_dp_train)
        and (jax.default_backend() == "tpu"
             or cs_size * cs_data_size < len(jax.devices())))
    if (cs_common and group_assignments is None
        and inference_alg in ("ista", "fista")
        and update_alg in ("sc_steepest_descent",
                           "sc_cheap_quadratic_descent")):
      from vtc_tpu.ops.pallas_code_shard_train import (
          code_shard_segment_supported)
      code_sharded = code_shard_segment_supported(
          training_batches.shape[1] // cs_data_size,
          s_total // cs_size, n_input, cs_size, cs_data_size)
    elif (cs_common and group_assignments is not None
          and inference_alg in ("subspace_ista", "subspace_fista")
          and update_alg in ("subspace_sc_steepest_descent",
                             "subspace_sc_cheap_quadratic_descent")
          and not all_params.get("nonnegative_only", False)
          and (cs_penalty == 0.0
               or bool(all_params.get("renormalize_dictionary",
                                      True)))):
      from vtc_tpu.ops.pallas_code_shard_train import (
          code_shard_group_arrays, code_shard_segment_supported)
      cs_group_arrays = code_shard_group_arrays(
          group_assignments, s_total, cs_size)
      if cs_group_arrays is not None:
        code_sharded = code_shard_segment_supported(
            training_batches.shape[1] // cs_data_size,
            s_total // cs_size, n_input, cs_size, cs_data_size,
            local_group_max=cs_group_arrays[0].shape[2],
            use_reg=cs_penalty != 0.0)
    # fused-DP composition: each shard runs the whole-solve Pallas
    # kernel, psums gram-form stats once per step, and updates
    # replicated -- keeping warm Lipschitz tracking across the mesh
    # (see parallel.build_dp_fused_local_step)
    from vtc_tpu.ops.pallas_train_step import fused_solve_stats_supported
    global_b = training_batches.shape[1]
    dp_fused_common = (
        not code_sharded
        and early_eps is None
        and lipschitz_method == "power_warm"
        and group_assignments is None
        and inference_alg in ("ista", "fista")
        and update_alg in ("sc_steepest_descent",
                           "sc_cheap_quadratic_descent")
        and global_b % dp_size == 0)
    if mode == "fully-connected":
      dp_fused = (
          dp_fused_common
          and resolved_formulation == "pallas"
          and fused_solve_stats_supported(
              global_b // dp_size, init_dictionary.shape[0],
              training_batches.shape[-1]))
      # whole-segment DP kernel (in-kernel RDMA stats all-reduce):
      # needs 'data' to be the mesh's only non-trivial axis so logical
      # RDMA device ids == the data axis index (ops/pallas_dp_train)
      if dp_fused:
        from vtc_tpu.ops.pallas_dp_train import fused_dp_segment_supported
        others = [a for a in dp_mesh.axis_names if a != "data"]
        dp_rdma = (
            "dcn" not in dp_mesh.axis_names
            and all(dp_mesh.shape[a] == 1 for a in others)
            # off-TPU the kernel runs in TPU interpret mode, whose
            # blocking semaphore waits need one spare host-client
            # thread (the CPU client's pool is sized to the device
            # count; a mesh over ALL virtual devices deadlocks)
            and (jax.default_backend() == "tpu"
                 or dp_size < len(jax.devices()))
            and fused_dp_segment_supported(
                global_b // dp_size, init_dictionary.shape[0],
                training_batches.shape[-1], dp_size))
      # early stopping under DP, fused: the fc whole-segment RDMA
      # kernel carries the batch-GLOBAL stop test in-kernel (one small
      # slot all-reduce of the shard |delta| sums per iteration --
      # every chip takes the identical trip count); ineligible configs
      # keep the exact XLA while_loop DP step (one pmean per iteration
      # in the predicate, build_dp_local_step)
      elif (early_eps is not None and not code_sharded
            and lipschitz_method == "power_warm"
            and inference_alg in ("ista", "fista")
            and update_alg in ("sc_steepest_descent",
                               "sc_cheap_quadratic_descent")
            and resolved_formulation == "pallas"
            and global_b % dp_size == 0):
        from vtc_tpu.ops.pallas_dp_train import fused_dp_segment_supported
        others = [a for a in dp_mesh.axis_names if a != "data"]
        dp_rdma = (
            "dcn" not in dp_mesh.axis_names
            and all(dp_mesh.shape[a] == 1 for a in others)
            and (jax.default_backend() == "tpu"
                 or dp_size < len(jax.devices()))
            and fused_dp_segment_supported(
                global_b // dp_size, init_dictionary.shape[0],
                training_batches.shape[-1], dp_size))
    else:
      from vtc_tpu.ops.pallas_conv_train import (
          conv_solve_stats_supported)
      dp_fused = (
          dp_fused_common
          and all_params.get("conv_formulation", "auto") in ("auto",
                                                             "pallas")
          and conv_solve_stats_supported(
              (global_b // dp_size,) + training_batches.shape[2:],
              init_dictionary.shape, kernel_stride, inference_alg,
              update_alg))
      # whole-segment conv DP kernel (in-kernel RDMA stats all-reduce):
      # upd_num_iters-independent gates here; the per-segment
      # upd_niters geometry check happens at runner creation (falls
      # back to the per-step fused-DP path when it fails)
      if dp_fused:
        from vtc_tpu.ops.pallas_conv_dp_train import (
            fused_conv_dp_segment_supported)
        others = [a for a in dp_mesh.axis_names if a != "data"]
        dp_rdma_conv = (
            "dcn" not in dp_mesh.axis_names
            and all(dp_mesh.shape[a] == 1 for a in others)
            and (jax.default_backend() == "tpu"
                 or dp_size < len(jax.devices()))
            and fused_conv_dp_segment_supported(
                (global_b // dp_size,) + training_batches.shape[2:],
                init_dictionary.shape, kernel_stride, inference_alg,
                update_alg, dp_size, upd_num_iters=1,
                padding=padding))
      # early stopping under DP, conv: the local shard is one tile by
      # construction, so the conv RDMA segment kernel carries the
      # batch-GLOBAL stop test in-kernel (same construction as the fc
      # dp_rdma gate above); ineligible configs keep the exact XLA
      # while_loop DP step (one pmean per iteration in the predicate)
      elif (early_eps is not None and not code_sharded
            and lipschitz_method == "power_warm"
            and inference_alg in ("ista", "fista")
            and update_alg in ("sc_steepest_descent",
                               "sc_cheap_quadratic_descent")
            and all_params.get("conv_formulation", "auto") in ("auto",
                                                               "pallas")
            and global_b % dp_size == 0):
        from vtc_tpu.ops.pallas_conv_dp_train import (
            fused_conv_dp_segment_supported)
        others = [a for a in dp_mesh.axis_names if a != "data"]
        dp_rdma_conv = (
            "dcn" not in dp_mesh.axis_names
            and all(dp_mesh.shape[a] == 1 for a in others)
            and (jax.default_backend() == "tpu"
                 or dp_size < len(jax.devices()))
            and fused_conv_dp_segment_supported(
                (global_b // dp_size,) + training_batches.shape[2:],
                init_dictionary.shape, kernel_stride, inference_alg,
                update_alg, dp_size, upd_num_iters=1,
                padding=padding, early_stopping_epsilon=early_eps))
    # subspace fused-DP: per-shard group solve+stats kernel + one psum
    # (parallel.build_dp_group_fused_local_step)
    if (not dp_fused
        and mode == "fully-connected" and group_assignments is not None
        and early_eps is None
        and lipschitz_method == "power_warm"
        and inference_alg in ("subspace_ista", "subspace_fista")
        and update_alg in ("subspace_sc_steepest_descent",
                           "subspace_sc_cheap_quadratic_descent")
        and not all_params.get("nonnegative_only", False)
        and resolved_formulation == "pallas"
        and global_b % dp_size == 0):
      from vtc_tpu.ops.pallas_train_step import (
          fused_group_solve_stats_supported)
      dp_fused = fused_group_solve_stats_supported(
          global_b // dp_size, init_dictionary.shape[0],
          training_batches.shape[-1], group_assignments)
      # whole-segment group-DP kernel (in-kernel RDMA stats
      # all-reduce): same axis/interpret gates as the fc dp_rdma path
      if dp_fused:
        from vtc_tpu.ops.pallas_group_dp_train import (
            fused_group_dp_segment_supported)
        others = [a for a in dp_mesh.axis_names if a != "data"]
        penalty = float(all_params.get("subspace_alignment_penalty",
                                       0.0))
        dp_rdma_group = (
            "dcn" not in dp_mesh.axis_names
            and all(dp_mesh.shape[a] == 1 for a in others)
            and (penalty == 0.0
                 or bool(all_params.get("renormalize_dictionary",
                                        True)))
            and (jax.default_backend() == "tpu"
                 or dp_size < len(jax.devices()))
            and fused_group_dp_segment_supported(
                global_b // dp_size, init_dictionary.shape[0],
                training_batches.shape[-1], group_assignments,
                dp_size))
    # early stopping under DP for the group family: the group RDMA
    # segment kernel carries the batch-GLOBAL stop test in-kernel
    # (same construction as the fc dp_rdma gate above)
    elif (mode == "fully-connected" and group_assignments is not None
          and early_eps is not None and not code_sharded
          and lipschitz_method == "power_warm"
          and inference_alg in ("subspace_ista", "subspace_fista")
          and update_alg in ("subspace_sc_steepest_descent",
                             "subspace_sc_cheap_quadratic_descent")
          and not all_params.get("nonnegative_only", False)
          and resolved_formulation == "pallas"
          and global_b % dp_size == 0):
      from vtc_tpu.ops.pallas_group_dp_train import (
          fused_group_dp_segment_supported)
      others = [a for a in dp_mesh.axis_names if a != "data"]
      penalty = float(all_params.get("subspace_alignment_penalty", 0.0))
      dp_rdma_group = (
          "dcn" not in dp_mesh.axis_names
          and all(dp_mesh.shape[a] == 1 for a in others)
          and (penalty == 0.0
               or bool(all_params.get("renormalize_dictionary", True)))
          and (jax.default_backend() == "tpu"
               or dp_size < len(jax.devices()))
          and fused_group_dp_segment_supported(
              global_b // dp_size, init_dictionary.shape[0],
              training_batches.shape[-1], group_assignments, dp_size))
    if (not dp_fused and not dp_rdma and not dp_rdma_group
        and not dp_rdma_conv and not code_sharded
        and lipschitz_method == "power_warm"):
      lipschitz_method = "power"
  warm_power = lipschitz_method == "power_warm"

  def fused_eligible(upd_niters_):
    """Whole-segment Pallas kernel: TPU + warm tracking + a config one
    of the VMEM-resident kernels covers (ops/pallas_train_step for fc /
    subspace, ops/pallas_conv_train for convolutional)."""
    from vtc_tpu.ops.pallas_train_step import (
        fused_group_segment_supported, fused_segment_supported)
    if not (dp_mesh is None and warm_power
            and jax.default_backend() == "tpu"):
      return False
    if mode == "convolutional":
      if all_params.get("conv_formulation", "auto") not in ("auto",
                                                            "pallas"):
        return False
      # in-kernel early stopping rides the same segment kernel when
      # the whole batch is one tile (the batch-global stop test;
      # covers the reference's own conv config, batch 5); cross-tile
      # batches fall back to the XLA per-step path, which carries the
      # exact while_loop stop (pallas_conv_direct / prox path)
      from vtc_tpu.ops.pallas_conv_train import (
          fused_conv_segment_supported)
      return fused_conv_segment_supported(
          training_batches.shape[1:], dictionary.shape, kernel_stride,
          inference_alg, update_alg,
          group_assignments=group_assignments,
          upd_num_iters=upd_niters_, padding=padding,
          early_stopping_epsilon=early_eps)
    if not (resolved_formulation == "pallas"
            and mode == "fully-connected"):
      return False
    if group_assignments is not None:
      # in-kernel early stopping rides the same segment kernel (the
      # grouped-tensor batch-global stop test; single-tile by
      # construction -- the group kernel holds the whole batch in VMEM)
      return fused_group_segment_supported(
          inference_alg, update_alg, group_assignments,
          alignment_penalty=float(
              all_params.get("subspace_alignment_penalty", 0.0)),
          batch_size=training_batches.shape[1],
          code_size=dictionary.shape[0],
          input_size=training_batches.shape[-1],
          renormalize=bool(
              all_params.get("renormalize_dictionary", True)))
    return fused_segment_supported(
        mode, inference_alg, update_alg,
        group_assignments=group_assignments,
        batch_size=training_batches.shape[1],
        code_size=dictionary.shape[0],
        input_size=training_batches.shape[-1],
        upd_num_iters=upd_niters_,
        early_stopping_epsilon=early_eps)

  def _conv_rdma_ok(upd_niters_):
    """Per-segment geometry check for the whole-segment conv DP kernel
    (multi-iteration updates need the gram-form stats; a failing
    combination falls back to the per-step fused-DP path)."""
    from vtc_tpu.ops.pallas_conv_dp_train import (
        fused_conv_dp_segment_supported)
    return fused_conv_dp_segment_supported(
        (training_batches.shape[1] // dp_size,)
        + training_batches.shape[2:], dictionary.shape, kernel_stride,
        inference_alg, update_alg, dp_size, upd_num_iters=upd_niters_,
        padding=padding, early_stopping_epsilon=early_eps)

  def make_dp_local(upd_niters_):
    from vtc_tpu import parallel as vtc_parallel
    from vtc_tpu.parallel.mesh import dp_axes
    axes = dp_axes(dp_mesh)
    size = 1
    for a in axes:
      size *= dp_mesh.shape[a]
    return vtc_parallel.build_dp_local_step(
        size, mode, inference_alg, update_alg, axis_names=axes,
        nonneg=bool(all_params.get("nonnegative_only", False)),
        hard_threshold=bool(all_params.get("hard_threshold", False)),
        kernel_stride=kernel_stride, padding=padding,
        group_assignments=group_assignments,
        alignment_penalty=float(
            all_params.get("subspace_alignment_penalty", 0.0)),
        renormalize=bool(all_params.get("renormalize_dictionary", True)),
        fc_formulation=all_params.get("fc_formulation", "gram"),
        early_stopping_epsilon=early_eps,
        # this runner computes the stepsize in-step (no warm carry):
        # a dp_fused session falling back here (conv upd_num_iters > 1
        # segments) downgrades warm tracking to plain power iteration
        lipschitz_method=("power" if lipschitz_method == "power_warm"
                          else lipschitz_method),
        upd_num_iters=upd_niters_)

  def make_step():
    return sc.build_raw_step_fn(
        mode, inference_alg, update_alg,
        nonneg=bool(all_params.get("nonnegative_only", False)),
        hard_threshold=bool(all_params.get("hard_threshold", False)),
        kernel_stride=kernel_stride, padding=padding,
        group_assignments=group_assignments,
        alignment_penalty=float(
            all_params.get("subspace_alignment_penalty", 0.0)),
        renormalize=bool(all_params.get("renormalize_dictionary", True)),
        fc_formulation=resolved_formulation,
        conv_formulation=all_params.get("conv_formulation", "auto"),
        lipschitz_method=("power" if warm_power else lipschitz_method),
        compute_stepsize_in_step=not warm_power,
        early_stopping_epsilon=early_eps)

  def lip_matrix(d):
    """The matrix whose Gram sets the stepsize (mode-dependent)."""
    if mode == "convolutional":
      return d.reshape(d.shape[0], -1)
    if inference_alg.startswith("subspace"):
      from vtc_tpu.analysis_transforms.fully_connected import (
          subspace_ista_fista)
      gi, vm = subspace_ista_fista.pack_group_indices(
          group_assignments, d.shape[0])
      return subspace_ista_fista.build_grouped_dictionary(d, gi, vm)
    return d

  def seed_eigvec(d):
    # exact eigenpair seed: no cold-start transient (a random power-50
    # seed can sit ~1e-1 relative off for tens of steps on flat spectra)
    from vtc_tpu.ops import lipschitz as lip
    _, v = lip.top_gram_eigenpair(lip_matrix(d))
    return v

  raw_step = make_step()
  runners = {}
  # DP runners that do NOT maintain the warm Lipschitz eigenvector
  # carry (the psum-per-op scan): after a segment runs one of these,
  # the eigvec is stale w.r.t. the trained dictionary and must be
  # re-seeded before the next warm (fused) segment
  cold_dp_runner_keys = set()

  dictionary = jnp.asarray(np.asarray(init_dictionary), jnp.float32)
  hessian = jnp.zeros(dictionary.shape[0], jnp.float32)
  previous_dictionary = dictionary
  sw = n_it = upd_step = upd_niters = None
  start = time.time()

  eigvec = None  # warm Lipschitz eigenvector state (seeded lazily)

  def handle_events(it):
    nonlocal dictionary, hessian, group_assignments, raw_step, runners
    nonlocal previous_dictionary, sw, n_it, upd_step, upd_niters
    nonlocal eigvec
    if it in inf_sched:
      sw = float(inf_sched[it]["sparsity_weight"])
      n_it = int(inf_sched[it]["num_iters"])
    if it in upd_sched:
      upd_step = float(upd_sched[it]["stepsize"])
      upd_niters = int(upd_sched[it]["num_iters"])
    if it in rp_sched:
      from vtc_tpu.training import reset_prune
      event = rp_sched[it]
      v_codes = np.concatenate([
          np.asarray(_infer(vb)) for vb in validation_batches], axis=0)
      f_params = dict(event["filter_params"])
      f_params["group_assignments"] = group_assignments
      new_dict, affected, new_groups = (
          reset_prune.reset_or_prune_dict_elements(
              np.asarray(dictionary), v_codes, event["filter_type"],
              f_params, event["action"]))
      dictionary = jnp.asarray(new_dict)
      eigvec = None  # dictionary jumped; re-seed the warm eigenvector
      if event["action"] == "prune" and len(affected):
        group_assignments = new_groups
        keep = np.ones(len(np.asarray(hessian)), bool)
        keep[np.asarray(affected, int)] = False
        hessian = jnp.asarray(np.asarray(hessian)[keep])
        raw_step = make_step()
        runners = {}
        cold_dp_runner_keys.clear()
      previous_dictionary = dictionary
    if it in ckpt_sched:
      from vtc_tpu.utils import checkpoint as ckpt_util
      ckpt_util.save_dictionary_checkpoint(logging_path, it,
                                           np.asarray(dictionary))
      ckpt_util.save_trainstate_sidecar(
          logging_path, it, hessian_diagonal=hessian,
          train_iteration=np.int64(it))
    if it in vis_sched:
      metrics = [sc.compute_metrics(
          vb, _infer(vb), dictionary, previous_dictionary, mode=mode,
          sparsity_weight=sw, group_assignments=group_assignments,
          kernel_stride=kernel_stride, padding=padding,
          is_subspace=inference_alg.startswith("subspace"))
          for vb in validation_batches]
      for name in metrics[0]:
        tb_writer.add_scalar(
            name, float(np.mean([m[name] for m in metrics])), it)

  def _infer(batch):
    from vtc_tpu.ops import lipschitz as lip
    # host-boundary inference (validation / reset-prune): cold stepsize
    inf_step = (lip.fista_stepsize(lip_matrix(dictionary), "power")
                if warm_power else jnp.float32(0.0))
    d, h, codes = raw_step(
        dictionary, hessian, jnp.asarray(batch), jnp.float32(sw),
        jnp.int32(n_it), jnp.float32(0.0), 1,
        jnp.asarray(inf_step, jnp.float32))
    del d, h
    return codes

  # one-slot prefetch buffer for the streaming mode: holds the NEXT
  # chunk's device array, device_put'ed right after the previous
  # runner's (asynchronous) dispatch so the host->HBM transfer hides
  # behind on-device compute
  prefetched = {}

  # multi-chip streaming: transfer each chunk DIRECTLY to its target
  # layout -- (steps replicated, batch axis sharded over the data
  # axes, same spec the DP segment runners consume) -- so every chip's
  # shard rides its own host->HBM DMA instead of the whole chunk
  # landing on one device and being resharded by a collective
  stream_sharding = None
  if dp_mesh is not None:
    from jax.sharding import NamedSharding, PartitionSpec
    from vtc_tpu.parallel.mesh import dp_axes as _dp_axes
    stream_sharding = NamedSharding(
        dp_mesh, PartitionSpec(None, _dp_axes(dp_mesh)))
    if stream_steps is None:
      # resident multi-chip epoch: shard it over the mesh up front too
      training_batches = jax.device_put(training_batches,
                                        stream_sharding)

  def _put(x):
    return (jax.device_put(x) if stream_sharding is None
            else jax.device_put(x, stream_sharding))

  # prefetch transfers are SUBMITTED from a worker thread:
  # jax.device_put of a large host chunk blocks the calling thread for
  # the host-side serialization (measured ~0.4 s per 26 MB on the
  # tunneled runtime, BENCH_NOTES UPDATE 36), which on the main thread
  # would serialize the orchestration loop with the transfers and
  # forfeit the compute/transfer overlap the prefetch exists for.
  # One worker: chunk i+1's submit may proceed while the main thread
  # dispatches compute, but transfers stay ordered.
  stream_pool = None
  if stream_steps is not None:
    import concurrent.futures
    stream_pool = concurrent.futures.ThreadPoolExecutor(
        max_workers=1, thread_name_prefix="vtc-stream-put")

  def _put_async(x):
    return stream_pool.submit(_put, x)

  def _stage(pos_, chunk_):
    if stream_steps is None:
      return training_batches[pos_:pos_ + chunk_]
    buf = prefetched.pop((pos_, chunk_), None)
    if stream_trace is not None:
      stream_trace.append(("hit" if buf is not None else "miss", pos_))
    if buf is None:
      return _put(training_batches[pos_:pos_ + chunk_])
    return buf.result()

  try:
    for seg_start, seg_end in zip(boundaries[:-1], boundaries[1:]):
      handle_events(seg_start)
      if shuffle_each_epoch and seg_start % k == 0 and seg_start < (
          total_iters):
        shuffle_key, sub = jax.random.split(shuffle_key)
        if stream_steps is not None:
          # host-side sample-level permutation (the device shuffle would
          # require the epoch resident in HBM, defeating the streaming)
          perm = np.asarray(jax.random.permutation(sub, k * b_per))
          flat = training_batches.reshape((k * b_per,)
                                          + training_batches.shape[2:])
          training_batches = flat[perm].reshape(training_batches.shape)
          prefetched.clear()
        else:
          training_batches = _reshuffle(training_batches, sub)
      if seg_end == seg_start:
        continue
      epoch = seg_start // k
      lo, hi = seg_start - epoch * k, seg_end - epoch * k
      assert 0 <= lo < hi <= k, "segments never straddle epochs"
      previous_dictionary = dictionary
      # decompose the segment into power-of-two chunks so the number of
      # DISTINCT compiled scan lengths is O(log k) for the whole run
      # (arbitrary segment lengths would each compile their own program,
      # which is expensive on runtimes with slow remote compilation)
      if eigvec is None:
        eigvec = seed_eigvec(dictionary) if warm_power else jnp.zeros(1)
      use_fused = dp_mesh is None and fused_eligible(upd_niters)
      segment_ran_cold_dp = False
      pos = lo
      while pos < hi:
        # whole-segment Pallas runners launch the EXACT segment length
        # (their compiles are seconds, and every launch through this
        # runtime's relay costs ~0.3 s); the XLA scan runners keep the
        # power-of-two decomposition so the number of DISTINCT compiled
        # scan lengths stays O(log k) (those compiles are minutes)
        if use_fused:
          chunk = hi - pos
        else:
          chunk = 1 << ((hi - pos).bit_length() - 1)
        if stream_steps is not None:
          chunk = min(chunk, stream_steps)
        key = (id(raw_step), upd_niters, chunk)
        if key not in runners:
          if dp_mesh is not None:
            if code_sharded:
              if group_assignments is not None:
                gmax = max(len(g) for g in group_assignments)
                cs_stop_count = (training_batches.shape[1]
                                 * len(group_assignments) * gmax)
              else:
                cs_stop_count = (training_batches.shape[1]
                                 * dictionary.shape[0])
              runners[key] = _code_shard_segment_runner(
                  dp_mesh, cs_size, cs_data_size,
                  (inference_alg[9:] if group_assignments is not None
                   else inference_alg), update_alg, upd_niters,
                  bool(all_params.get("nonnegative_only", False)),
                  bool(all_params.get("hard_threshold", False)),
                  bool(all_params.get("renormalize_dictionary", True)),
                  group_arrays=cs_group_arrays,
                  alignment_penalty=cs_penalty,
                  mxu=str(all_params.get("train_precision", "highest")),
                  early_eps=early_eps, stop_count=cs_stop_count)
              dp_fused_now = False
            elif dp_rdma:
              from vtc_tpu.parallel.mesh import dp_axes
              runners[key] = _dp_rdma_segment_runner(
                  dp_mesh, dp_axes(dp_mesh)[0], dp_size, inference_alg,
                  update_alg, upd_niters,
                  bool(all_params.get("nonnegative_only", False)),
                  bool(all_params.get("hard_threshold", False)),
                  bool(all_params.get("renormalize_dictionary", True)),
                  mxu=str(all_params.get("train_precision", "highest")),
                  early_eps=early_eps)
              dp_fused_now = False
            elif dp_rdma_group:
              from vtc_tpu.parallel.mesh import dp_axes
              runners[key] = _dp_rdma_group_segment_runner(
                  dp_mesh, dp_axes(dp_mesh)[0], dp_size,
                  inference_alg[9:], update_alg, upd_niters,
                  bool(all_params.get("hard_threshold", False)),
                  bool(all_params.get("renormalize_dictionary", True)),
                  group_assignments,
                  alignment_penalty=float(
                      all_params.get("subspace_alignment_penalty", 0.0)),
                  mxu=str(all_params.get("train_precision", "highest")),
                  early_eps=early_eps)
              dp_fused_now = False
            elif dp_rdma_conv and _conv_rdma_ok(upd_niters):
              from vtc_tpu.parallel.mesh import dp_axes
              runners[key] = _dp_rdma_conv_segment_runner(
                  dp_mesh, dp_axes(dp_mesh)[0], dp_size, inference_alg,
                  update_alg, upd_niters,
                  bool(all_params.get("nonnegative_only", False)),
                  bool(all_params.get("hard_threshold", False)),
                  bool(all_params.get("renormalize_dictionary", True)),
                  kernel_stride, padding,
                  mxu=str(all_params.get("train_precision", "highest")),
                  early_eps=early_eps)
              dp_fused_now = False
            elif dp_fused and mode == "convolutional" and upd_niters > 1:
              # multi-iteration conv DP updates psum gram-form stats:
              # needs a block-factorizable mask
              from vtc_tpu.ops.pallas_conv_train import (
                  gram_stats_supported)
              dp_fused_now = gram_stats_supported(
                  training_batches.shape[1:], dictionary.shape,
                  kernel_stride, padding)
            else:
              dp_fused_now = dp_fused
            if dp_fused_now:
              from vtc_tpu.parallel.mesh import dp_axes
              axes = dp_axes(dp_mesh)
              size = 1
              for a in axes:
                size *= dp_mesh.shape[a]
              common = dict(
                  nonneg=bool(all_params.get("nonnegative_only", False)),
                  hard_threshold=bool(all_params.get("hard_threshold",
                                                     False)),
                  renormalize=bool(all_params.get(
                      "renormalize_dictionary", True)),
                  axis_names=axes,
                  # 2 refresh iters is exact-seed-safe: this trainer
                  # always seeds via seed_eigvec and re-seeds after
                  # dictionary jumps (see _fused_segment_runner)
                  power_iters=2,
                  # training-speed tiers compose with DP: the per-shard
                  # solve runs the tier, the psum'd stats stay f32
                  mxu=str(all_params.get("train_precision", "highest")))
              if mode == "convolutional":
                from vtc_tpu.parallel.data_parallel import (
                    build_dp_conv_fused_local_step)
                local = build_dp_conv_fused_local_step(
                    size, inference_alg, update_alg,
                    kernel_stride=kernel_stride, padding=padding,
                    upd_num_iters=upd_niters, **common)
              elif group_assignments is not None:
                from vtc_tpu.parallel.data_parallel import (
                    build_dp_group_fused_local_step)
                group_common = dict(common)
                group_common.pop("nonneg")  # no nonneg in the group prox
                local = build_dp_group_fused_local_step(
                    size, inference_alg, update_alg,
                    group_assignments=group_assignments,
                    alignment_penalty=float(all_params.get(
                        "subspace_alignment_penalty", 0.0)),
                    upd_num_iters=upd_niters, **group_common)
              else:
                from vtc_tpu.parallel.data_parallel import (
                    build_dp_fused_local_step)
                local = build_dp_fused_local_step(
                    size, inference_alg, update_alg,
                    upd_num_iters=upd_niters, **common)
              runners[key] = _dp_fused_segment_runner(
                  local, dp_mesh, mode == "convolutional")
            elif not (dp_rdma or dp_rdma_group or code_sharded):
              runners[key] = _dp_segment_runner(
                  make_dp_local(upd_niters), dp_mesh,
                  mode == "convolutional")
              cold_dp_runner_keys.add(key)
          elif use_fused:
            if mode == "convolutional":
              runners[key] = _fused_conv_segment_runner(
                  inference_alg, update_alg, upd_niters,
                  bool(all_params.get("nonnegative_only", False)),
                  bool(all_params.get("hard_threshold", False)),
                  bool(all_params.get("renormalize_dictionary", True)),
                  kernel_stride, padding,
                  mxu=str(all_params.get("train_precision", "highest")),
                  early_eps=early_eps)
            elif group_assignments is not None:
              runners[key] = _fused_group_segment_runner(
                  inference_alg[9:], update_alg, upd_niters,
                  bool(all_params.get("hard_threshold", False)),
                  bool(all_params.get("renormalize_dictionary", True)),
                  group_assignments,
                  alignment_penalty=float(
                      all_params.get("subspace_alignment_penalty", 0.0)),
                  mxu=str(all_params.get("train_precision", "highest")),
                  early_eps=early_eps)
            else:
              runners[key] = _fused_segment_runner(
                  inference_alg, update_alg, upd_niters,
                  bool(all_params.get("nonnegative_only", False)),
                  bool(all_params.get("hard_threshold", False)),
                  bool(all_params.get("renormalize_dictionary", True)),
                  mxu=str(all_params.get("train_precision", "highest")),
                  early_eps=early_eps)
          else:
            runners[key] = _segment_runner(raw_step, upd_niters,
                                           warm_power, lip_matrix)
        staged = _stage(pos, chunk)
        dictionary, hessian, eigvec = runners[key](
            dictionary, hessian, eigvec, staged,
            jnp.float32(sw), jnp.int32(n_it), jnp.float32(upd_step))
        if key in cold_dp_runner_keys:
          segment_ran_cold_dp = True
        del staged
        pos += chunk
        if stream_steps is not None and pos < hi:
          # the runner call above is asynchronous: issue the next chunk's
          # host->device transfer now so it overlaps the compute
          nxt = min((hi - pos) if use_fused
                    else 1 << ((hi - pos).bit_length() - 1), stream_steps)
          if stream_trace is not None:
            stream_trace.append(("prefetch", pos))
          prefetched[(pos, nxt)] = _put_async(
              training_batches[pos:pos + nxt])
      if segment_ran_cold_dp and warm_power:
        # the cold runner trained the dictionary without refreshing the
        # warm eigenvector; force an exact re-seed before the next
        # fused segment (power_iters=2 there assumes an exact seed)
        eigvec = None
    handle_events(total_iters)  # trailing checkpoint/vis events
  finally:
    if stream_pool is not None:
      # shut the prefetch worker down on every exit path: an
      # exception in the segment loop must not leak the worker
      # thread or its in-flight device_put futures
      stream_pool.shutdown(wait=True)
  if tb_writer is not None:
    tb_writer.flush()
  print("scanned training done in {:.2f}s ({} iterations)".format(
      time.time() - start, total_iters))
  return dictionary
