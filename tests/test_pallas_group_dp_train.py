"""Whole-segment group-DP kernel (in-kernel RDMA all-reduce) vs the
single-chip fused group segment kernel on the concatenated global
batch (interpret mode over the virtual CPU devices)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vtc_tpu.analysis_transforms.fully_connected import subspace_ista_fista
from vtc_tpu.ops import lipschitz as lip
from vtc_tpu.ops.pallas_group_dp_train import (
    fused_group_dp_segment_supported, fused_group_dp_train_segment_pallas)
from vtc_tpu.ops.pallas_train_step import fused_group_train_segment_pallas


def _data(rng, k, b, s, n, groups):
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  x = rng.randn(k, b, n).astype(np.float32)
  h0 = np.abs(rng.randn(s)).astype(np.float32) * 0.01
  gi, vm = subspace_ista_fista.pack_group_indices(groups, s)
  grouped = subspace_ista_fista.build_grouped_dictionary(
      jnp.asarray(d0), gi, vm)
  _, v0 = lip.top_gram_eigenpair(grouped)
  return jnp.asarray(d0), jnp.asarray(h0), v0, jnp.asarray(x)


def _run_dp(mesh, axis_size, groups, d0, h0, v0, batches, sw, n_it,
            upd_step, **kw):
  def body(d, h, v, x):
    x = x.reshape(x.shape[0], -1, x.shape[-1])
    d, h, v, codes = fused_group_dp_train_segment_pallas(
        d, h, v, x, sw, n_it, upd_step, group_assignments=groups,
        axis_name="data", axis_size=axis_size, interpret=True,
        power_iters=2, **kw)
    return d[None], h, v, codes

  rep = P()
  fn = jax.jit(jax.shard_map(
      body, mesh=mesh,
      in_specs=(rep, rep, rep, P(None, "data", None)),
      out_specs=(P("data", None, None), rep, rep, P("data", None)),
      check_vma=False))
  return fn(d0, h0, v0, batches)


@pytest.mark.parametrize("upd_alg,upd_iters,penalty", [
    ("subspace_sc_cheap_quadratic_descent", 1, 0.0),
    ("subspace_sc_steepest_descent", 2, 0.1),
])
def test_group_dp_segment_matches_single_chip(rng, upd_alg, upd_iters,
                                              penalty):
  k, b_shard, s, n, p = 3, 8, 32, 48, 4
  groups = tuple(tuple(range(i, i + 4)) for i in range(0, s, 4))
  mesh = Mesh(np.asarray(jax.devices()[:p]).reshape(p, 1),
              ("data", "code"))
  d0, h0, v0, x = _data(rng, k, p * b_shard, s, n, groups)
  assert fused_group_dp_segment_supported(b_shard, s, n, groups, p)
  sw, n_it, upd_step = jnp.float32(0.1), jnp.int32(6), jnp.float32(0.05)

  d_dp, h_dp, v_dp, codes_dp = _run_dp(
      mesh, p, groups, d0, h0, v0, x, sw, n_it, upd_step,
      update_alg=upd_alg, upd_num_iters=upd_iters,
      alignment_penalty=penalty)
  d_dp = np.asarray(d_dp)
  for dev in range(1, p):
    assert np.array_equal(d_dp[dev], d_dp[0])

  d_ref, h_ref, v_ref, codes_ref = fused_group_train_segment_pallas(
      d0, h0, v0, x, sw, n_it, upd_step, group_assignments=groups,
      update_alg=upd_alg, upd_num_iters=upd_iters, power_iters=2,
      alignment_penalty=penalty, interpret=True)
  np.testing.assert_allclose(d_dp[0], np.asarray(d_ref),
                             rtol=2e-5, atol=2e-5)
  np.testing.assert_allclose(np.asarray(h_dp), np.asarray(h_ref),
                             rtol=2e-5, atol=2e-6)
  np.testing.assert_allclose(np.asarray(v_dp), np.asarray(v_ref),
                             rtol=2e-4, atol=2e-5)
  np.testing.assert_allclose(np.asarray(codes_dp),
                             np.asarray(codes_ref),
                             rtol=2e-4, atol=2e-5)


def test_group_dp_segment_single_device_axis(rng):
  """axis_size == 1: no communication; == the single-chip kernel."""
  k, b, s, n = 2, 16, 16, 32
  groups = tuple(tuple(range(i, i + 4)) for i in range(0, s, 4))
  mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
              ("data", "code"))
  d0, h0, v0, x = _data(rng, k, b, s, n, groups)
  d_dp, h_dp, _, _ = _run_dp(
      mesh, 1, groups, d0, h0, v0, x, jnp.float32(0.08), jnp.int32(5),
      jnp.float32(0.05))
  d_ref, h_ref, _, _ = fused_group_train_segment_pallas(
      d0, h0, v0, x, jnp.float32(0.08), jnp.int32(5), jnp.float32(0.05),
      group_assignments=groups, power_iters=2, interpret=True)
  np.testing.assert_allclose(np.asarray(d_dp)[0], np.asarray(d_ref),
                             rtol=2e-6, atol=2e-6)
  np.testing.assert_allclose(np.asarray(h_dp), np.asarray(h_ref),
                             rtol=2e-6, atol=2e-7)


def test_scanned_trainer_group_rdma_auto_select(rng):
  """train_dictionary_scanned on a data=4 mesh auto-selects the
  whole-segment group RDMA runner and matches the single-device
  scanned trainer."""
  from vtc_tpu import parallel
  from vtc_tpu.training import compiled_epoch

  k, b, s, n = 4, 16, 12, 16
  groups = [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]]
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  batches = rng.randn(k, b, n).astype(np.float32) * 0.5
  params = {
      "mode": "fully-connected",
      "num_epochs": 2,
      "code_inference_algorithm": "subspace_fista",
      "dictionary_update_algorithm":
          "subspace_sc_cheap_quadratic_descent",
      "group_assignments": groups,
      "subspace_alignment_penalty": 0.1,
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 6}},
      "dict_update_param_schedule": {
          0: {"stepsize": 0.05, "num_iters": 1}},
      "fc_formulation": "pallas",
  }
  single = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(), dict(params)))
  dp = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(),
      dict(params, data_parallel=parallel.make_mesh(data=4))))
  np.testing.assert_allclose(dp, single, atol=2e-5)
