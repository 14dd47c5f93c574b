"""Sparse-coding dictionary learning trainer, TPU-native.

Public API parity with reference training/sparse_coding.py:9-519:
``train_dictionary(training_image_dataset, validation_image_dataset,
init_dictionary, all_params)`` with the same ``all_params`` schema --
string-keyed algorithm selection, iteration-indexed parameter schedules
with a mandatory 0 entry, optional checkpoint / visualization /
reset-prune schedules, YAML config dump, TensorBoard logging, pickled
NumPy dictionary checkpoints.

TPU-native architecture (differs from the reference's per-op Python loop):
  * ONE fused, jit-compiled train step per schedule segment: Lipschitz
    stepsize + code inference (lax.while_loop) + Hessian-diagonal EMA +
    dictionary update + renormalization execute as a single XLA program
    with the dictionary/Hessian buffers donated (zero copies between
    batches).  Python only orchestrates schedules and logging.
  * ``num_iters`` for inference rides through the while_loop bound as a
    device scalar, so schedule changes to it do NOT recompile; changing
    the dict-update iteration count or any algorithm flag recompiles at
    most once per segment.
  * Optional data parallelism: pass ``all_params['data_parallel'] = True``
    (or a jax.sharding.Mesh) to shard batches over devices; dictionary
    gradients and Hessian statistics are psum-reduced (see
    vtc_tpu.parallel).
  * Extra knobs (defaults preserve reference semantics):
      'stepsize_update_interval': recompute 1/L every k batches (default 1)
      'lipschitz_method': 'eigvalsh' (default) | 'power'
      'fc_formulation': 'gram' (default, one-matmul iteration) |
          'direct' | 'pallas' (fused VMEM-resident kernel, TPU)
      'resume_state': full-state sidecar dict from
          utils.checkpoint.resume_training_state -- seeds the Hessian
          EMA and the absolute iteration counter for exact continuation
          of an interrupted run (num_epochs counts ADDITIONAL epochs)
      'early_stopping_epsilon': optional float -- the reference solver's
          early-stop rule (fc/ista_fista.py:135-144: stop when the mean
          absolute code delta / stepsize drops below epsilon) applied to
          every inference solve the trainer issues.  Runs IN-KERNEL on
          the fused Pallas paths when the batch fits one VMEM tile, and
          as the exact XLA while_loop otherwise.  Not composable with
          'data_parallel' (the stop test is a batch-GLOBAL mean; a
          shard-local test would change which codes are returned).
"""
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from vtc_tpu.analysis_transforms.convolutional import (
    ista_fista as conv_ista_fista)
from vtc_tpu.analysis_transforms.fully_connected import (
    ista_fista as fc_ista_fista)
from vtc_tpu.analysis_transforms.fully_connected import (
    subspace_ista_fista)
from vtc_tpu.dict_update_rules.convolutional import (
    sc_cheap_quadratic_descent as conv_cqd)
from vtc_tpu.dict_update_rules.convolutional import (
    sc_steepest_descent as conv_sd)
from vtc_tpu.dict_update_rules.fully_connected import (
    ica_natural_gradient as fc_ica_ng)  # noqa: F401 (registry symmetry)
from vtc_tpu.dict_update_rules.fully_connected import (
    sc_cheap_quadratic_descent as fc_cqd)
from vtc_tpu.dict_update_rules.fully_connected import (
    sc_steepest_descent as fc_sd)
from vtc_tpu.dict_update_rules.fully_connected import (
    subspace_sc_cheap_quadratic_descent as fc_sub_cqd)
from vtc_tpu.dict_update_rules.fully_connected import (
    subspace_sc_steepest_descent as fc_sub_sd)
from vtc_tpu.ops import conv_shapes
from vtc_tpu.ops import lipschitz as lipschitz_ops
from vtc_tpu.training import reset_prune
# public re-export for API parity with the reference, which exposes the
# reset/prune entry point from this module (training/sparse_coding.py:522)
from vtc_tpu.training.reset_prune import (  # noqa: F401
    reset_or_prune_dict_elements)
from vtc_tpu.utils import checkpoint as ckpt_util
from vtc_tpu.utils import plotting as plot_utils

INFERENCE_ALGS = ("ista", "fista", "subspace_ista", "subspace_fista")
UPDATE_ALGS = ("sc_steepest_descent", "sc_cheap_quadratic_descent",
               "subspace_sc_steepest_descent",
               "subspace_sc_cheap_quadratic_descent")


# ---------------------------------------------------------------------------
# batch iteration over the accepted dataset containers
# ---------------------------------------------------------------------------
def iterate_batches(dataset):
  """Yield batches as jnp arrays from any of the accepted containers:
  an ndarray of stacked batches ((k,b,n) or (k,b,c,h,w)), a list/tuple of
  batches, or any re-iterable yielding batches."""
  if isinstance(dataset, (np.ndarray, jax.Array)):
    for i in range(dataset.shape[0]):
      yield jnp.asarray(dataset[i])
  else:
    for batch in dataset:
      yield jnp.asarray(np.asarray(batch))


def as_device_array(x, dtype=None):
  """jnp.asarray that never round-trips device-resident inputs through
  the host: np.asarray on a jax.Array PULLS it to host (through this
  runtime's relay that costs ~minutes per GB), so convert via numpy only
  for non-jax containers (lists, torch tensors, ...).  A jax.Array
  committed to a non-default backend (e.g. CPU-placed data on a TPU
  host) is moved device-to-device so training runs where the old
  host-round-trip path would have placed it."""
  if isinstance(x, jax.Array):
    if dtype is not None:
      x = jnp.asarray(x, dtype)
    platforms = {d.platform for d in x.devices()}
    if platforms != {jax.default_backend()}:
      x = jax.device_put(x, jax.devices()[0])
    return x
  return jnp.asarray(np.asarray(x), dtype)


# ---------------------------------------------------------------------------
# the fused train step
# ---------------------------------------------------------------------------
def build_raw_step_fn(mode, inference_alg, update_alg, *, nonneg=False,
                      hard_threshold=False, kernel_stride=None,
                      padding=None, group_assignments=None,
                      alignment_penalty=0.0, renormalize=True,
                      fc_formulation="gram", conv_formulation="auto",
                      lipschitz_method="eigvalsh",
                      compute_stepsize_in_step=True,
                      lowest_code_val=0.001,
                      early_stopping_epsilon=None):
  """Build the raw (unjitted) fused step for a static algorithm config.

  Signature of the returned python callable:
    step(dictionary, hessian, batch, sparsity_weight, inf_num_iters,
         upd_stepsize, upd_num_iters, inf_stepsize)
      -> (new_dictionary, new_hessian, codes)

  ``inf_stepsize`` is ignored when compute_stepsize_in_step (the 1/L is
  computed from the current dictionary inside the program); otherwise it
  must hold a precomputed 1/L.  ``conv_formulation``: 'auto' (default:
  the fused direct-formulation Pallas kernel on TPU when the geometry
  supports it -- ops/pallas_conv_direct.py -- else the XLA code-space
  gram operator), 'pallas' (force the kernel, interpret off-TPU), or
  'gram' (force the XLA path).  Used directly by jit (build_train_step),
  by sharded pjit variants (vtc_tpu.parallel), and inside lax.scan epoch
  programs (vtc_tpu.training.compiled_epoch / bench.py).

  ``early_stopping_epsilon``: optional static float -- the reference
  solver stop rule (fc/ista_fista.py:135-144) applied to the inference
  solve.  Pallas formulations run it in-kernel when the batch fits one
  VMEM tile (ops.pallas_fista.early_stop_tile_fits /
  pallas_conv_direct.early_stop_supported) and otherwise fall back to
  the exact XLA while_loop path.
  """
  is_subspace_inf = inference_alg.startswith("subspace")
  variant = inference_alg[9:] if is_subspace_inf else inference_alg
  uses_hessian = update_alg in ("sc_cheap_quadratic_descent",
                                "subspace_sc_cheap_quadratic_descent")
  is_subspace_upd = update_alg.startswith("subspace")
  if is_subspace_inf or is_subspace_upd:
    assert group_assignments is not None

  if group_assignments is not None:
    # static packing; recomputed only when the group structure changes
    code_size_hint = max(max(g) for g in group_assignments) + 1
    gather_inds, valid_mask = subspace_ista_fista.pack_group_indices(
        group_assignments, code_size_hint)
  else:
    gather_inds = valid_mask = None

  def infer(dictionary, batch, sparsity_weight, num_iters, stepsize):
    if mode == "fully-connected":
      if is_subspace_inf:
        grouped_dict = subspace_ista_fista.build_grouped_dictionary(
            dictionary, gather_inds, valid_mask)
        if compute_stepsize_in_step:
          stepsize = lipschitz_ops.fista_stepsize(
              grouped_dict, lipschitz_method)
        init = jnp.zeros(
            (batch.shape[0],) + gather_inds.shape, batch.dtype)
        return subspace_ista_fista._solve(
            batch, grouped_dict, gather_inds, valid_mask,
            sparsity_weight, num_iters, stepsize, init, variant, False,
            early_stopping_epsilon,
            "gram" if fc_formulation == "pallas" else fc_formulation,
            dictionary.shape[0], True)
      if compute_stepsize_in_step:
        stepsize = lipschitz_ops.fista_stepsize(
            dictionary, lipschitz_method)
      if fc_formulation == "pallas":
        from vtc_tpu.ops.pallas_fista import (early_stop_tile_fits,
                                              fista_solve_pallas)
        if (early_stopping_epsilon is None
            or early_stop_tile_fits(batch.shape[0],
                                    dictionary.shape[0])):
          return fista_solve_pallas(
              batch, dictionary, sparsity_weight, num_iters, stepsize,
              variant=variant, nonneg=nonneg, hard=hard_threshold,
              early_stopping_epsilon=early_stopping_epsilon,
              interpret=jax.default_backend() != "tpu")
        # batch too large for the in-kernel batch-global stop test:
        # the XLA while_loop path below handles it exactly
      init = jnp.zeros((batch.shape[0], dictionary.shape[0]), batch.dtype)
      return fc_ista_fista._solve(
          batch, dictionary, sparsity_weight, num_iters, stepsize, init,
          variant, nonneg, hard_threshold, early_stopping_epsilon,
          "gram" if fc_formulation == "pallas" else fc_formulation)
    # convolutional
    if compute_stepsize_in_step:
      stepsize = lipschitz_ops.fista_stepsize(
          dictionary.reshape(dictionary.shape[0], -1), lipschitz_method)
    pad_static = (None if padding is None else
                  tuple(tuple(int(x) for x in p) for p in padding))
    if conv_formulation in ("auto", "pallas"):
      # block-matmul direct kernel (deep-contraction matmuls, mask
      # applied elementwise -- 2.7x the gram solve at the reference
      # config); geometry-gated, TPU only under 'auto'
      from vtc_tpu.ops import pallas_conv_direct
      if pallas_conv_direct.supported(
          batch.shape, dictionary.shape, tuple(kernel_stride)) and (
              conv_formulation == "pallas"
              or jax.default_backend() == "tpu") and (
              early_stopping_epsilon is None
              or pallas_conv_direct.early_stop_supported(
                  batch.shape, dictionary.shape, tuple(kernel_stride))):
        return pallas_conv_direct.conv_direct_solve_pallas(
            batch, dictionary, sparsity_weight, num_iters, stepsize,
            kernel_stride=tuple(kernel_stride), padding=pad_static,
            variant=variant, nonneg=nonneg, hard=hard_threshold,
            early_stopping_epsilon=early_stopping_epsilon,
            interpret=jax.default_backend() != "tpu")
    sh, sw = conv_ista_fista.code_spatial_dims(
        batch.shape, dictionary.shape, kernel_stride)
    init = jnp.zeros((batch.shape[0], dictionary.shape[0], sh, sw),
                     batch.dtype)
    mask = conv_shapes.create_mask(batch.shape, padding, batch.dtype)
    return conv_ista_fista._solve(
        batch, dictionary, mask, sparsity_weight, num_iters, stepsize,
        init, tuple(kernel_stride), variant, nonneg, hard_threshold,
        early_stopping_epsilon, formulation="gram", padding=pad_static)

  def update(dictionary, hessian, batch, codes, upd_stepsize,
             upd_num_iters):
    if mode == "fully-connected":
      if update_alg == "sc_steepest_descent":
        return fc_sd._update(batch, dictionary, codes, upd_stepsize,
                             upd_num_iters, renormalize)
      if update_alg == "sc_cheap_quadratic_descent":
        return fc_cqd._update(batch, dictionary, codes, hessian,
                              upd_stepsize, upd_num_iters,
                              jnp.float32(lowest_code_val), renormalize)
      if update_alg == "subspace_sc_steepest_descent":
        if alignment_penalty == 0:
          return fc_sd._update(batch, dictionary, codes, upd_stepsize,
                               upd_num_iters, renormalize)
        return fc_sub_sd._update_with_reg(
            batch, dictionary, codes, gather_inds, valid_mask,
            jnp.float32(alignment_penalty), upd_stepsize, upd_num_iters,
            renormalize)
      # subspace cheap quadratic
      if alignment_penalty == 0:
        return fc_cqd._update(batch, dictionary, codes, hessian,
                              upd_stepsize, upd_num_iters,
                              jnp.float32(lowest_code_val), renormalize)
      return fc_sub_cqd._update_with_reg(
          batch, dictionary, codes, gather_inds, valid_mask, hessian,
          jnp.float32(alignment_penalty), upd_stepsize, upd_num_iters,
          jnp.float32(lowest_code_val), renormalize)
    # convolutional
    from vtc_tpu.ops import conv_dict_gram
    from vtc_tpu.ops import pallas_conv_direct
    mask = conv_shapes.create_mask(batch.shape, padding, batch.dtype)
    pad_static = (None if padding is None else
                  tuple(tuple(int(x) for x in p) for p in padding))
    if pallas_conv_direct.supported(batch.shape, dictionary.shape,
                                    tuple(kernel_stride)):
      upd_formulation = "block"  # stride-block matmul gradient
    elif conv_dict_gram.supported(dictionary.shape,
                                  tuple(kernel_stride)):
      upd_formulation = "gram"
    else:
      upd_formulation = "direct"
    if update_alg == "sc_steepest_descent":
      return conv_sd._update(batch, dictionary, codes, mask,
                             tuple(kernel_stride), upd_stepsize,
                             upd_num_iters, renormalize, pad_static,
                             upd_formulation)
    if update_alg == "sc_cheap_quadratic_descent":
      return conv_cqd._update(batch, dictionary, codes, hessian, mask,
                              tuple(kernel_stride), upd_stepsize,
                              upd_num_iters,
                              jnp.float32(lowest_code_val), renormalize,
                              pad_static, upd_formulation)
    raise KeyError(
        "subspace dictionary updates are fully-connected only "
        "(matches reference training/sparse_coding.py:426,434)")

  def step(dictionary, hessian, batch, sparsity_weight, inf_num_iters,
           upd_stepsize, upd_num_iters, inf_stepsize):
    codes = infer(dictionary, batch, sparsity_weight, inf_num_iters,
                  inf_stepsize)
    if uses_hessian:
      if mode == "fully-connected":
        hessian = fc_cqd.hessian_diagonal_ema(hessian, codes)
      else:
        hessian = conv_cqd.hessian_diagonal_ema(hessian, codes)
    new_dict = update(dictionary, hessian, batch, codes, upd_stepsize,
                      upd_num_iters)
    return new_dict, hessian, codes

  return step


def build_train_step(*args, **kwargs):
  """Jit-compile the fused train step (see build_raw_step_fn).

  NOTE: dictionary/hessian are NOT donated: the trainer keeps the
  previous dictionary alive for the |delta D| metric, and both arrays
  are tiny compared to the batch compute.
  """
  step = build_raw_step_fn(*args, **kwargs)
  return jax.jit(step, static_argnames=("upd_num_iters",))


# ---------------------------------------------------------------------------
# metrics (device compute, host dict)
# ---------------------------------------------------------------------------
def compute_metrics(batch, codes, dictionary, previous_dictionary, *,
                    mode, sparsity_weight, group_assignments=None,
                    kernel_stride=None, padding=None,
                    is_subspace=False):
  """Validation metrics matching reference compute_metrics
  (training/sparse_coding.py:177-229): LASSO l2 term, sparsity term
  (l1 or sum of group norms), total, normalized L0, mean pSNR with range
  estimated from the batch (padding stripped in conv mode), and mean
  absolute dictionary change."""
  batch = np.asarray(batch)
  codes_np = np.asarray(codes)
  dict_np = np.asarray(dictionary)
  prev_np = np.asarray(previous_dictionary)
  metrics = {}
  if mode == "fully-connected":
    recons = codes_np @ dict_np
    images = batch
    sum_axes = 1
  else:
    from vtc_tpu.ops import convolutions as conv_ops
    recons = np.asarray(conv_ops.synthesize(
        jnp.asarray(codes_np), jnp.asarray(dict_np), kernel_stride))
    images = batch
    if padding is not None:
      (lv, tv), (lh, th) = padding
      h, w = images.shape[2], images.shape[3]
      recons = recons[:, :, lv:h - tv, lh:w - th]
      images = images[:, :, lv:h - tv, lh:w - th]
    sum_axes = (1, 2, 3)
  metrics["Average LASSO L2 component"] = float(np.mean(
      0.5 * np.sum(np.square(recons - images), axis=sum_axes)))
  if is_subspace:
    group_norm_sum = np.zeros(codes_np.shape[0])
    for members in group_assignments:
      group_norm_sum += np.linalg.norm(
          codes_np[:, np.asarray(list(members), int)], axis=1)
    metrics["Average LASSO lagrange component"] = float(
        np.mean(sparsity_weight * group_norm_sum))
  else:
    metrics["Average LASSO lagrange component"] = float(np.mean(
        sparsity_weight * np.sum(np.abs(codes_np), axis=sum_axes)))
  metrics["Average LASSO Loss"] = (
      metrics["Average LASSO L2 component"] +
      metrics["Average LASSO lagrange component"])
  metrics["Average Normalized L0"] = float(
      np.mean(np.count_nonzero(
          codes_np.reshape(codes_np.shape[0], -1), axis=1)
              / np.prod(codes_np.shape[1:])))
  sig_mag = np.max(images) - np.min(images)
  psnrs = [plot_utils.compute_pSNR(images[i], recons[i],
                                   manual_sig_mag=sig_mag)
           for i in range(recons.shape[0])]
  psnrs = [p for p in psnrs if p != np.inf]
  metrics["Average pSNR of reconstructions"] = float(np.mean(psnrs))
  metrics["Average change in dictionary kernels"] = float(np.mean(
      np.abs(dict_np - prev_np)))
  return metrics


# ---------------------------------------------------------------------------
# the trainer
# ---------------------------------------------------------------------------
def train_dictionary(training_image_dataset, validation_image_dataset,
                     init_dictionary, all_params):
  """Train a sparse-coding dictionary.  See module docstring; the
  ``all_params`` schema matches the reference trainer
  (training/sparse_coding.py:52-117) plus the TPU extras listed there.

  Returns the final dictionary as a jnp array (the reference instead
  mutated ``init_dictionary`` in place).
  """
  # ---------------- schema validation / unpacking ----------------
  assert 0 in all_params["inference_param_schedule"]
  assert 0 in all_params["dict_update_param_schedule"]
  mode = all_params["mode"]
  num_epochs = all_params["num_epochs"]
  inference_alg = all_params["code_inference_algorithm"]
  inf_schedule = all_params["inference_param_schedule"]
  update_alg = all_params["dictionary_update_algorithm"]
  upd_schedule = all_params["dict_update_param_schedule"]
  assert mode in ("fully-connected", "convolutional")
  assert inference_alg in INFERENCE_ALGS
  assert update_alg in UPDATE_ALGS
  kernel_stride = padding = None
  if mode == "convolutional":
    kernel_stride = tuple(all_params["strides"])
    padding = all_params["padding"]
    if padding is not None:
      padding = tuple(tuple(p) for p in padding)

  nonneg = bool(all_params.get("nonnegative_only", False))
  hard_threshold = bool(all_params.get("hard_threshold", False))
  group_assignments = all_params.get("group_assignments")
  if group_assignments is not None:
    assert all(len(set(g)) == len(g) for g in group_assignments)
    group_assignments = [list(int(i) for i in g)
                         for g in group_assignments]
  alignment_penalty = float(
      all_params.get("subspace_alignment_penalty", 0.0))
  renormalize = bool(all_params.get("renormalize_dictionary", True))

  init_dictionary = jnp.asarray(np.asarray(init_dictionary), jnp.float32)
  if renormalize:
    flat = init_dictionary.reshape(init_dictionary.shape[0], -1)
    norms = jnp.linalg.norm(flat, axis=1)
    assert np.allclose(np.asarray(norms), 1.0, atol=1e-4), (
        "initial dictionary must be row/kernel normalized")

  logging_path = all_params.get("logging_folder_fullpath")
  ckpt_sched = all_params.get("checkpoint_schedule")
  vis_sched = all_params.get("training_visualization_schedule")
  rp_schedule = all_params.get("dict_element_rp_schedule")
  print_interval = all_params.get("stdout_print_interval", 1000)
  kernel_reshaping = all_params.get("reshaped_kernel_size")
  if ckpt_sched is not None or vis_sched is not None:
    assert logging_path is not None
    logging_path = Path(logging_path)
    logging_path.mkdir(parents=True, exist_ok=True)
    import yaml
    to_save = {k: v for k, v in all_params.items()
               if k not in ("checkpoint_schedule",
                            "training_visualization_schedule",
                            "group_assignments")}
    to_save["group_assignments"] = group_assignments
    with open(logging_path / "training_params.yaml", "w") as f:
      yaml.dump({k: (sorted(v) if isinstance(v, set) else v)
                 for k, v in to_save.items()
                 if k != "str_entire_calling_script"},
                f, default_flow_style=None)
    if "str_entire_calling_script" in all_params:
      with open(logging_path / "called_script.py", "w") as f:
        f.write(all_params["str_entire_calling_script"])
  tb_writer = None
  if vis_sched is not None:
    from torch.utils.tensorboard import SummaryWriter
    tb_writer = SummaryWriter(str(logging_path))

  # TPU extras
  fc_formulation = all_params.get("fc_formulation", "gram")
  lipschitz_method = all_params.get("lipschitz_method", "eigvalsh")
  stepsize_interval = int(all_params.get("stepsize_update_interval", 1))
  in_step_stepsize = stepsize_interval <= 1
  data_parallel = all_params.get("data_parallel", False)
  early_eps = all_params.get("early_stopping_epsilon")
  if early_eps is not None:
    early_eps = float(early_eps)
  profile_dir = all_params.get("profile_dir")
  profile_start = int(all_params.get("profile_start_iteration", 5))
  profile_steps = int(all_params.get("profile_num_steps", 5))

  uses_hessian = update_alg in ("sc_cheap_quadratic_descent",
                                "subspace_sc_cheap_quadratic_descent")
  if update_alg == "subspace_sc_cheap_quadratic_descent" and (
      mode == "convolutional"):
    raise NotImplementedError("subspace updates are fully-connected only")

  if data_parallel:
    # explicit shard_map DP: batches shard over the mesh's 'data' axis,
    # dictionary gradients / hessian statistics psum over it.  The
    # update iteration count is a build-time constant there, so steps
    # are cached per upd_num_iters (schedules rarely change it).
    from vtc_tpu import parallel as vtc_parallel
    dp_mesh = (data_parallel if hasattr(data_parallel, "shape")
               else vtc_parallel.make_mesh())
    _dp_cache = {}

    def make_step():
      def step(dictionary, hessian, batch, sw, n_it, upd_stp, n_upd,
               _unused_stepsize):
        if n_upd not in _dp_cache:
          _dp_cache[n_upd] = vtc_parallel.build_shard_map_train_step(
              dp_mesh, mode, inference_alg, update_alg, nonneg=nonneg,
              hard_threshold=hard_threshold,
              kernel_stride=kernel_stride, padding=padding,
              group_assignments=group_assignments,
              alignment_penalty=alignment_penalty,
              renormalize=renormalize, fc_formulation=fc_formulation,
              lipschitz_method=lipschitz_method, upd_num_iters=n_upd,
              early_stopping_epsilon=early_eps)
        return _dp_cache[n_upd](dictionary, hessian, batch, sw, n_it,
                                upd_stp)
      return step
  else:
    def make_step():
      return build_train_step(
          mode, inference_alg, update_alg, nonneg=nonneg,
          hard_threshold=hard_threshold, kernel_stride=kernel_stride,
          padding=padding, group_assignments=group_assignments,
          alignment_penalty=alignment_penalty, renormalize=renormalize,
          fc_formulation=fc_formulation,
          conv_formulation=all_params.get("conv_formulation", "auto"),
          lipschitz_method=lipschitz_method,
          compute_stepsize_in_step=in_step_stepsize,
          early_stopping_epsilon=early_eps)

  step_fn = make_step()

  def infer_only(dictionary, batch, sw, n_it):
    """Inference for validation / reset-prune (public run() APIs)."""
    if mode == "fully-connected":
      if inference_alg.startswith("subspace"):
        return subspace_ista_fista.run(
            batch, dictionary, group_assignments, sw, n_it,
            variant=inference_alg[9:],
            early_stopping_epsilon=early_eps,
            formulation=("gram" if fc_formulation == "pallas"
                         else fc_formulation),
            lipschitz_method=lipschitz_method)
      return fc_ista_fista.run(
          batch, dictionary, sw, n_it, variant=inference_alg,
          nonnegative_only=nonneg, hard_threshold=hard_threshold,
          early_stopping_epsilon=early_eps,
          formulation=fc_formulation, lipschitz_method=lipschitz_method)
    return conv_ista_fista.run(
        batch, dictionary, kernel_stride, padding, sw, n_it,
        variant=inference_alg, nonnegative_only=nonneg,
        hard_threshold=hard_threshold, early_stopping_epsilon=early_eps,
        lipschitz_method=lipschitz_method)

  dictionary = init_dictionary
  hessian = jnp.zeros(dictionary.shape[0], jnp.float32)
  previous_dictionary = dictionary
  cached_inf_stepsize = jnp.float32(0.0)

  start_time = time.time()
  last_print_time = start_time
  patches_since_print = 0
  total_iter = 0
  sparsity_weight = inf_num_iters = None
  upd_stepsize = upd_num_iters = None

  # exact resume: all_params['resume_state'] carries the full-state
  # sidecar (utils.checkpoint.resume_training_state) -- Hessian EMA and
  # the absolute iteration counter, so schedules / checkpoint events
  # resolve at their original global iterations and the continuation is
  # bit-identical to an uninterrupted run when the checkpoint sits on
  # an epoch boundary.  num_epochs counts ADDITIONAL epochs.
  resume_state = all_params.get("resume_state")
  if resume_state is not None:
    hessian = jnp.asarray(
        np.asarray(resume_state["hessian_diagonal"]), jnp.float32)
    total_iter = int(resume_state["train_iteration"])

    def _active_entry(sched):
      keys = [k for k in sched if k <= total_iter]
      return sched[max(keys)] if keys else None

    ent = _active_entry(inf_schedule)
    if ent is not None:
      sparsity_weight = float(ent["sparsity_weight"])
      inf_num_iters = int(ent["num_iters"])
    ent = _active_entry(upd_schedule)
    if ent is not None:
      upd_stepsize = float(ent["stepsize"])
      upd_num_iters = int(ent["num_iters"])

  for epoch_idx in range(num_epochs):
    for batch in iterate_batches(training_image_dataset):
      if total_iter % print_interval == 0 and total_iter != 0:
        now = time.time()
        rate = patches_since_print / max(now - last_print_time, 1e-9)
        print(total_iter, "iterations complete")
        print("Time elapsed: {:.1f} seconds  ({:,.0f} patches/sec)"
              .format(now - start_time, rate))
        print("-----")
        last_print_time, patches_since_print = now, 0

      # optional on-device profiler trace (jax.profiler) over a few
      # steady-state steps
      if profile_dir is not None and total_iter == profile_start:
        jax.profiler.start_trace(str(profile_dir))
      if (profile_dir is not None
          and total_iter == profile_start + profile_steps):
        jax.block_until_ready(dictionary)
        jax.profiler.stop_trace()

      if total_iter in inf_schedule:
        sparsity_weight = float(inf_schedule[total_iter][
            "sparsity_weight"])
        inf_num_iters = int(inf_schedule[total_iter]["num_iters"])
      if total_iter in upd_schedule:
        upd_stepsize = float(upd_schedule[total_iter]["stepsize"])
        upd_num_iters = int(upd_schedule[total_iter]["num_iters"])

      # ---- reset / prune hook (host-side; may change shapes) ----
      if rp_schedule is not None and total_iter in rp_schedule:
        event = rp_schedule[total_iter]
        v_codes = [np.asarray(infer_only(dictionary, vb, sparsity_weight,
                                         inf_num_iters))
                   for vb in iterate_batches(validation_image_dataset)]
        v_codes = np.concatenate(v_codes, axis=0)
        f_params = dict(event["filter_params"])
        f_params["group_assignments"] = group_assignments
        new_dict, affected, new_groups = (
            reset_prune.reset_or_prune_dict_elements(
                np.asarray(dictionary), v_codes, event["filter_type"],
                f_params, event["action"]))
        dictionary = jnp.asarray(new_dict)
        if event["action"] == "prune" and len(affected) > 0:
          previous_dictionary = dictionary
          group_assignments = new_groups
          if uses_hessian:
            keep = np.ones(len(np.asarray(hessian)), bool)
            keep[np.asarray(affected, int)] = False
            hessian = jnp.asarray(np.asarray(hessian)[keep])
          step_fn = make_step()  # shapes / groups changed
        else:
          previous_dictionary = dictionary

      # ---- checkpointing ----
      if ckpt_sched is not None and total_iter in ckpt_sched:
        from vtc_tpu.utils.debug import assert_dictionary_healthy
        assert_dictionary_healthy(dictionary,
                                  "iteration " + str(total_iter))
        ckpt_util.save_dictionary_checkpoint(
            logging_path, total_iter, np.asarray(dictionary))
        ckpt_util.save_trainstate_sidecar(
            logging_path, total_iter, hessian_diagonal=hessian,
            train_iteration=np.int64(total_iter))

      # ---- validation metrics + dictionary viz ----
      if vis_sched is not None and total_iter in vis_sched:
        all_metrics = []
        for vb in iterate_batches(validation_image_dataset):
          v_codes = infer_only(dictionary, vb, sparsity_weight,
                               inf_num_iters)
          all_metrics.append(compute_metrics(
              vb, v_codes, dictionary, previous_dictionary, mode=mode,
              sparsity_weight=sparsity_weight,
              group_assignments=group_assignments,
              kernel_stride=kernel_stride, padding=padding,
              is_subspace=inference_alg.startswith("subspace")))
        assert all_metrics, (
            "validation dataset yielded no batches (check batch size vs "
            "dataset size / drop_last)")
        averaged = {k: float(np.mean([m[k] for m in all_metrics]))
                    for k in all_metrics[0]}
        for name, value in averaged.items():
          tb_writer.add_scalar(name, value, total_iter)
        _dictionary_viz_to_tb(tb_writer, np.asarray(dictionary),
                              kernel_reshaping, group_assignments,
                              total_iter)

      # ---- stepsize cache (when not fused into the step) ----
      if not in_step_stepsize and total_iter % stepsize_interval == 0:
        if mode == "fully-connected":
          mat = (subspace_ista_fista.build_grouped_dictionary(
              dictionary, *subspace_ista_fista.pack_group_indices(
                  group_assignments, dictionary.shape[0]))
                 if inference_alg.startswith("subspace") else dictionary)
        else:
          mat = dictionary.reshape(dictionary.shape[0], -1)
        cached_inf_stepsize = lipschitz_ops.fista_stepsize(
            mat, lipschitz_method)

      # ---- the fused compiled step ----
      previous_dictionary = dictionary
      dictionary, hessian, _ = step_fn(
          dictionary, hessian, batch,
          jnp.float32(sparsity_weight), jnp.int32(inf_num_iters),
          jnp.float32(upd_stepsize), upd_num_iters,
          cached_inf_stepsize)
      patches_since_print += int(batch.shape[0])
      total_iter += 1
    print("Epoch", epoch_idx + 1, "finished")

  if tb_writer is not None:
    tb_writer.flush()
  return dictionary


def _dictionary_viz_to_tb(tb_writer, dictionary, reshaping, groupings,
                          step):
  """Render dictionary tile figures and push them to TensorBoard as
  images (reference training/sparse_coding.py:237-271)."""
  import io

  from PIL import Image

  from matplotlib import pyplot as plt

  for renorm, tag in ((True, "renormalized"), (False, "no renorm")):
    figs = plot_utils.display_dictionary(
        dictionary, renormalize=renorm, reshaping=reshaping,
        groupings=groupings,
        plot_title="Current dictionary ({}), iter {}".format(tag, step))
    for fig_idx, fig in enumerate(figs):
      buf = io.BytesIO()
      fig.savefig(buf, format="png")
      plt.close(fig)
      buf.seek(0)
      img = np.array(Image.open(buf))[:, :, :3]
      tb_writer.add_image(
          "Current dictionary ({}), fig {} of {}".format(
              tag, fig_idx + 1, len(figs)),
          img, global_step=step, dataformats="HWC")
