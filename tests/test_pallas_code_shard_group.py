"""Code-sharded segment kernel: group-sparse variant and the
data x code (TP x DP) composition, vs single-chip fused segments on the
full (unsharded) dictionary / global batch.

Runs in Pallas TPU interpret mode (simulated remote DMAs) on the
virtual CPU mesh; meshes leave a spare host device thread (see
ops/pallas_dp_train docstring)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vtc_tpu.ops import lipschitz as lip
from vtc_tpu.ops.pallas_code_shard_train import (
    code_shard_group_arrays, code_shard_segment_supported,
    fused_code_sharded_train_segment_pallas)
from vtc_tpu.ops.pallas_train_step import (fused_group_train_segment_pallas,
                                           fused_train_segment_pallas)


def _problem(rng, k, b, s, n):
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  x = rng.randn(k, b, n).astype(np.float32)
  h0 = np.abs(rng.randn(s)).astype(np.float32) * 0.01
  _, v0 = lip.top_gram_eigenpair(jnp.asarray(d0))
  return jnp.asarray(d0), jnp.asarray(h0), v0, jnp.asarray(x)


def _run_cs(dp, cp, d0, h0, v0, batches, sw, n_it, upd_step,
            group_arrays=None, alignment_penalty=0.0, **kw):
  """shard_map the cs kernel over a (data=dp, code=cp) mesh; batches
  (k, b_global, n) shard over 'data', dictionary rows over 'code'."""
  mesh = Mesh(np.asarray(jax.devices()[:dp * cp]).reshape(dp, cp),
              ("data", "code"))
  expand_all = comem_all = None
  if group_arrays is not None:
    expand_all = jnp.asarray(group_arrays[0])
    comem_all = jnp.asarray(group_arrays[1])

  def body(d_shard, h_shard, v, x):
    gkw = dict(kw)
    if expand_all is not None:
      idx = jax.lax.axis_index("code")
      gkw["expand_local"] = jax.lax.dynamic_index_in_dim(
          expand_all, idx, keepdims=False)
      if alignment_penalty != 0.0:
        gkw["comem_local"] = jax.lax.dynamic_index_in_dim(
            comem_all, idx, keepdims=False)
      gkw["alignment_penalty"] = alignment_penalty
    return fused_code_sharded_train_segment_pallas(
        d_shard, h_shard, v, x, sw, n_it, upd_step, axis_name="code",
        axis_size=cp, data_axis_name="data" if dp > 1 else None,
        data_axis_size=dp, code_stride=1, data_stride=cp,
        interpret=True, power_iters=2, **gkw)

  rep = P()
  fn = jax.jit(jax.shard_map(
      body, mesh=mesh,
      in_specs=(P("code", None), P("code"), rep, P(None, "data", None)),
      out_specs=(P("code", None), P("code"), rep, P("data", "code")),
      check_vma=False))
  return fn(d0, h0, v0, batches)


def _contiguous_groups(s, gs):
  return [list(range(i, i + gs)) for i in range(0, s, gs)]


def test_group_arrays_layout_gate():
  """Eligibility: disjoint shard-aligned partitions only."""
  ok = code_shard_group_arrays(_contiguous_groups(16, 4), 16, 2)
  assert ok is not None
  expand, comem = ok
  assert expand.shape == (2, 8, 2) and comem.shape == (2, 8, 8)
  assert expand.sum() == 16  # every row in exactly one group
  # ragged but aligned is fine
  assert code_shard_group_arrays(
      [[0, 1, 2], [3], [4, 5], [6, 7]], 8, 2) is not None
  # group straddling the shard boundary
  assert code_shard_group_arrays(
      [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11], [12, 13, 14, 15]],
      16, 3) is None  # 16 % 3 != 0
  assert code_shard_group_arrays(
      [[0, 1], [2, 3], [4, 5], [6, 7], [8, 9], [10, 11], [12, 13],
       [14, 15]], 16, 2) is not None
  assert code_shard_group_arrays(
      [[0, 1], [2, 3], [4, 5], [6, 7, 8], [9], [10, 11], [12, 13],
       [14, 15]], 16, 2) is None  # [6,7,8] straddles rows 0..7 | 8..15
  # multi-membership (duplicated element) is not a partition
  assert code_shard_group_arrays(
      [[0, 1], [1, 2], [3]], 4, 2) is None
  # missing element
  assert code_shard_group_arrays([[0, 1], [3]], 4, 2) is None


@pytest.mark.parametrize("upd_alg,penalty", [
    ("subspace_sc_cheap_quadratic_descent", 0.0),
    ("subspace_sc_steepest_descent", 0.0),
    ("subspace_sc_cheap_quadratic_descent", 0.15),
])
def test_group_code_shard_matches_single_chip(rng, upd_alg, penalty):
  """Group-sparse cs kernel (code=2) == the single-chip group segment
  kernel on the unsharded dictionary."""
  k, b, s, n, cp = 2, 16, 128, 32, 2
  groups = _contiguous_groups(s, 4)
  d0, h0, v0, x = _problem(rng, k, b, s, n)
  arrays = code_shard_group_arrays(groups, s, cp)
  assert arrays is not None
  assert code_shard_segment_supported(
      b, s // cp, n, cp, 1, local_group_max=arrays[0].shape[2],
      use_reg=penalty != 0.0)
  sw, n_it, upd = jnp.float32(0.1), jnp.int32(8), jnp.float32(0.05)

  d_cs, h_cs, v_cs, codes_cs = _run_cs(
      1, cp, d0, h0, v0, x, sw, n_it, upd, group_arrays=arrays,
      alignment_penalty=penalty, variant="fista", update_alg=upd_alg,
      upd_num_iters=1)

  d_ref, h_ref, v_ref, codes_ref = fused_group_train_segment_pallas(
      d0, h0, v0, x, sw, n_it, upd, group_assignments=tuple(
          tuple(g) for g in groups), variant="fista",
      update_alg=upd_alg, upd_num_iters=1, power_iters=2,
      alignment_penalty=penalty, interpret=True)
  np.testing.assert_allclose(np.asarray(d_cs), np.asarray(d_ref),
                             rtol=3e-5, atol=3e-5)
  np.testing.assert_allclose(np.asarray(h_cs), np.asarray(h_ref),
                             rtol=3e-5, atol=3e-6)
  np.testing.assert_allclose(np.asarray(codes_cs)[:x.shape[1]],
                             np.asarray(codes_ref), rtol=3e-4,
                             atol=3e-5)


def test_fc_data_code_mesh_matches_single_chip(rng):
  """TP x DP composition: (data=2, code=2) mesh, batch sharded over
  data, rows over code == single-chip fused segment on the global
  batch (the update sees GLOBAL stats via the in-kernel data-axis
  all-reduce)."""
  k, b, s, n, dp, cp = 3, 16, 128, 32, 2, 2
  d0, h0, v0, x = _problem(rng, k, b, s, n)
  sw, n_it, upd = jnp.float32(0.1), jnp.int32(8), jnp.float32(0.05)

  d_cs, h_cs, v_cs, codes_cs = _run_cs(
      dp, cp, d0, h0, v0, x, sw, n_it, upd, variant="fista",
      update_alg="sc_cheap_quadratic_descent", upd_num_iters=1)

  d_ref, h_ref, v_ref, codes_ref = fused_train_segment_pallas(
      d0, h0, v0, x, sw, n_it, upd,
      update_alg="sc_cheap_quadratic_descent", upd_num_iters=1,
      power_iters=2, interpret=True)
  np.testing.assert_allclose(np.asarray(d_cs), np.asarray(d_ref),
                             rtol=3e-5, atol=3e-5)
  np.testing.assert_allclose(np.asarray(h_cs), np.asarray(h_ref),
                             rtol=3e-5, atol=3e-6)
  np.testing.assert_allclose(np.asarray(codes_cs),
                             np.asarray(codes_ref), rtol=3e-4,
                             atol=3e-5)


def test_fc_data_code_multi_update_iters(rng):
  """upd_num_iters > 1 exercises the per-iteration data-axis gradient
  exchange schedule."""
  k, b, s, n, dp, cp = 2, 8, 128, 32, 2, 2
  d0, h0, v0, x = _problem(rng, k, b, s, n)
  sw, n_it, upd = jnp.float32(0.1), jnp.int32(5), jnp.float32(0.05)
  d_cs, _, _, _ = _run_cs(
      dp, cp, d0, h0, v0, x, sw, n_it, upd, variant="ista",
      update_alg="sc_steepest_descent", upd_num_iters=2)
  d_ref, _, _, _ = fused_train_segment_pallas(
      d0, h0, v0, x, sw, n_it, upd, variant="ista",
      update_alg="sc_steepest_descent", upd_num_iters=2,
      power_iters=2, interpret=True)
  np.testing.assert_allclose(np.asarray(d_cs), np.asarray(d_ref),
                             rtol=3e-5, atol=3e-5)


def test_scanned_trainer_group_code_shard_auto_select(rng):
  """The motivating config (SURVEY §2.2): a heavily overcomplete
  GROUPED dictionary (s=2048 >> n) on a data x code mesh auto-selects
  the group code-shard runner and matches the single-device scanned
  trainer (replicated math)."""
  from vtc_tpu import parallel
  from vtc_tpu.training import compiled_epoch

  k, b, s, n = 2, 8, 2048, 128
  groups = _contiguous_groups(s, 4)
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  batches = rng.randn(k, b, n).astype(np.float32) * 0.5
  params = {
      "mode": "fully-connected",
      "num_epochs": 1,
      "code_inference_algorithm": "subspace_fista",
      "dictionary_update_algorithm":
          "subspace_sc_cheap_quadratic_descent",
      "group_assignments": groups,
      "subspace_alignment_penalty": 0.1,
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 4}},
      "dict_update_param_schedule": {
          0: {"stepsize": 0.05, "num_iters": 1}},
      "fc_formulation": "pallas",
  }
  single = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(), dict(params)))
  cs = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(),
      dict(params, data_parallel=parallel.make_mesh(data=2, code=2))))
  np.testing.assert_allclose(cs, single, atol=5e-5)


def test_scanned_trainer_fc_data_code_auto_select(rng):
  """fc TP x DP through the trainer: (data=2, code=2) mesh == the
  single-device scanned trainer on the same global batches."""
  from vtc_tpu import parallel
  from vtc_tpu.training import compiled_epoch

  k, b, s, n = 3, 16, 64, 16
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  batches = rng.randn(k, b, n).astype(np.float32) * 0.5
  params = {
      "mode": "fully-connected",
      "num_epochs": 2,
      "code_inference_algorithm": "fista",
      "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 8}},
      "dict_update_param_schedule": {
          0: {"stepsize": 0.05, "num_iters": 1}},
      "fc_formulation": "pallas",
  }
  single = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(), dict(params)))
  cs = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(),
      dict(params, data_parallel=parallel.make_mesh(data=2, code=2))))
  np.testing.assert_allclose(cs, single, atol=3e-5)


def test_code_shard_in_kernel_early_stop_matches_fused(rng):
  """The code-shard kernel's in-kernel stop test (shard |delta| sums
  all-reduced over the code axis) == the single-chip fused kernel's
  in-kernel stop on the unsharded dictionary."""
  from vtc_tpu.ops.pallas_train_step import fused_train_segment_pallas

  k, b, s, n, cp = 3, 16, 256, 64, 2
  eps = 3e-2
  d0, h0, v0, x = _problem(rng, k, b, s, n)
  sw, n_it, upd = jnp.float32(0.05), jnp.int32(40), jnp.float32(0.005)

  d_cs, h_cs, _, codes_cs = _run_cs(
      1, cp, d0, h0, v0, x, sw, n_it, upd, variant="fista",
      update_alg="sc_cheap_quadratic_descent", upd_num_iters=1,
      early_stopping_epsilon=float(eps))
  d_ref, h_ref, _, codes_ref = fused_train_segment_pallas(
      d0, h0, v0, x, sw, n_it, upd,
      update_alg="sc_cheap_quadratic_descent", upd_num_iters=1,
      power_iters=2, interpret=True, early_stopping_epsilon=float(eps))
  np.testing.assert_allclose(np.asarray(d_cs), np.asarray(d_ref),
                             rtol=3e-5, atol=3e-5)
  np.testing.assert_allclose(np.asarray(h_cs), np.asarray(h_ref),
                             rtol=3e-5, atol=3e-6)
  np.testing.assert_allclose(np.asarray(codes_cs),
                             np.asarray(codes_ref), rtol=3e-4,
                             atol=3e-5)
  # non-vacuous
  d_full, _, _, _ = fused_train_segment_pallas(
      d0, h0, v0, x, sw, n_it, upd,
      update_alg="sc_cheap_quadratic_descent", upd_num_iters=1,
      power_iters=2, interpret=True)
  assert np.abs(np.asarray(d_ref) - np.asarray(d_full)).max() > 1e-7


def test_scanned_trainer_group_code_shard_early_stop(rng):
  """Grouped TP x DP code-shard with early_stopping_epsilon == the
  single-device trainer (exact XLA group stop) on the same batches."""
  from vtc_tpu import parallel
  from vtc_tpu.training import compiled_epoch

  k, b, s, n = 2, 8, 512, 64
  groups = _contiguous_groups(s, 4)
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  batches = rng.randn(k, b, n).astype(np.float32) * 0.5
  params = {
      "mode": "fully-connected",
      "num_epochs": 1,
      "code_inference_algorithm": "subspace_fista",
      "dictionary_update_algorithm":
          "subspace_sc_cheap_quadratic_descent",
      "group_assignments": groups,
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 40}},
      "dict_update_param_schedule": {
          0: {"stepsize": 0.005, "num_iters": 1}},
      "fc_formulation": "pallas",
      "early_stopping_epsilon": 3e-2,
  }
  single = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(), dict(params)))
  cs = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(),
      dict(params, data_parallel=parallel.make_mesh(data=2, code=2))))
  np.testing.assert_allclose(cs, single, atol=5e-5)
  # non-vacuous: the no-eps run differs
  p2 = dict(params)
  p2.pop("early_stopping_epsilon")
  full = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(), p2))
  assert np.abs(single - full).max() > 1e-7
