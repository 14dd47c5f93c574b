"""Whole-segment DP kernel (in-kernel RDMA all-reduce) vs the
single-chip fused segment kernel on the concatenated global batch.

Runs in Pallas TPU interpret mode, which simulates the remote DMAs and
semaphores across the 8 virtual CPU devices (conftest)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vtc_tpu.ops import lipschitz as lip
from vtc_tpu.ops.pallas_dp_train import (fused_dp_segment_supported,
                                         fused_dp_train_segment_pallas)
from vtc_tpu.ops.pallas_train_step import fused_train_segment_pallas


def _data(rng, k, b, s, n):
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  x = rng.randn(k, b, n).astype(np.float32)
  h0 = np.abs(rng.randn(s)).astype(np.float32) * 0.01
  _, v0 = lip.top_gram_eigenpair(jnp.asarray(d0))
  return jnp.asarray(d0), jnp.asarray(h0), v0, jnp.asarray(x)


def _run_dp(mesh, axis_size, d0, h0, v0, batches, sw, n_it, upd_step,
            **kw):
  """batches: (k, global_b, n) -> shard over 'data'."""
  def body(d, h, v, x):
    x = x.reshape(x.shape[0], -1, x.shape[-1])  # (k, b_shard, n)
    d, h, v, codes = fused_dp_train_segment_pallas(
        d, h, v, x, sw, n_it, upd_step, axis_name="data",
        axis_size=axis_size, interpret=True, power_iters=2, **kw)
    # emit every chip's dictionary so the test can assert bitwise
    # cross-chip identity
    return d[None], h, v, codes

  rep = P()
  fn = jax.jit(jax.shard_map(
      body, mesh=mesh,
      in_specs=(rep, rep, rep, P(None, "data", None)),
      out_specs=(P("data", None, None), rep, rep, P("data", None)),
      check_vma=False))
  return fn(d0, h0, v0, batches)


@pytest.mark.parametrize("upd_alg,upd_iters", [
    ("sc_cheap_quadratic_descent", 1),
    ("sc_steepest_descent", 3),
])
def test_dp_segment_matches_single_chip(rng, upd_alg, upd_iters):
  k, b_shard, s, n, p = 3, 16, 48, 64, 4
  mesh = Mesh(np.asarray(jax.devices()[:p]).reshape(p, 1),
              ("data", "code"))
  d0, h0, v0, x = _data(rng, k, p * b_shard, s, n)
  assert fused_dp_segment_supported(b_shard, s, n, p)
  sw, n_it, upd_step = jnp.float32(0.1), jnp.int32(8), jnp.float32(0.05)

  d_dp, h_dp, v_dp, codes_dp = _run_dp(
      mesh, p, d0, h0, v0, x, sw, n_it, upd_step,
      update_alg=upd_alg, upd_num_iters=upd_iters)
  d_dp = np.asarray(d_dp)

  # bitwise identical replicated state on every chip
  for dev in range(1, p):
    assert np.array_equal(d_dp[dev], d_dp[0])

  d_ref, h_ref, v_ref, codes_ref = fused_train_segment_pallas(
      d0, h0, v0, x, sw, n_it, upd_step, update_alg=upd_alg,
      upd_num_iters=upd_iters, power_iters=2, interpret=True)
  np.testing.assert_allclose(d_dp[0], np.asarray(d_ref),
                             rtol=2e-5, atol=2e-5)
  np.testing.assert_allclose(np.asarray(h_dp), np.asarray(h_ref),
                             rtol=2e-5, atol=2e-6)
  np.testing.assert_allclose(np.asarray(v_dp), np.asarray(v_ref),
                             rtol=2e-4, atol=2e-5)
  # last step's codes, sharded: compare against the single-chip ones
  np.testing.assert_allclose(np.asarray(codes_dp),
                             np.asarray(codes_ref),
                             rtol=2e-4, atol=2e-5)


def test_dp_segment_single_device_axis(rng):
  """axis_size == 1: no communication; == the single-chip kernel."""
  k, b, s, n = 2, 24, 32, 48
  mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
              ("data", "code"))
  d0, h0, v0, x = _data(rng, k, b, s, n)
  d_dp, h_dp, _, _ = _run_dp(mesh, 1, d0, h0, v0, x,
                             jnp.float32(0.08), jnp.int32(6),
                             jnp.float32(0.05),
                             update_alg="sc_cheap_quadratic_descent",
                             upd_num_iters=1)
  d_ref, h_ref, _, _ = fused_train_segment_pallas(
      d0, h0, v0, x, jnp.float32(0.08), jnp.int32(6), jnp.float32(0.05),
      update_alg="sc_cheap_quadratic_descent", upd_num_iters=1,
      power_iters=2, interpret=True)
  np.testing.assert_allclose(np.asarray(d_dp)[0], np.asarray(d_ref),
                             rtol=2e-5, atol=2e-5)
  np.testing.assert_allclose(np.asarray(h_dp), np.asarray(h_ref),
                             rtol=2e-5, atol=2e-6)


def test_dp_segment_nonneg_ista(rng):
  """Variant flags reach the in-kernel solver."""
  k, b_shard, s, n, p = 2, 8, 32, 48, 2
  mesh = Mesh(np.asarray(jax.devices()[:p]).reshape(p, 1),
              ("data", "code"))
  d0, h0, v0, x = _data(rng, k, p * b_shard, s, n)
  d_dp, _, _, _ = _run_dp(
      mesh, p, d0, h0, v0, x, jnp.float32(0.1), jnp.int32(5),
      jnp.float32(0.05), variant="ista", nonneg=True,
      update_alg="sc_steepest_descent", upd_num_iters=1)
  d_ref, _, _, _ = fused_train_segment_pallas(
      d0, h0, v0, x, jnp.float32(0.1), jnp.int32(5), jnp.float32(0.05),
      variant="ista", nonneg=True, update_alg="sc_steepest_descent",
      upd_num_iters=1, power_iters=2, interpret=True)
  np.testing.assert_allclose(np.asarray(d_dp)[0], np.asarray(d_ref),
                             rtol=2e-5, atol=2e-5)


def test_scanned_trainer_rdma_auto_select(rng):
  """train_dictionary_scanned on a data=4 mesh auto-selects the
  whole-segment RDMA runner (the mesh leaves a spare host thread for
  the interpreter) and matches the single-device scanned trainer."""
  from vtc_tpu import parallel
  from vtc_tpu.training import compiled_epoch

  k, b, s, n = 4, 16, 12, 16
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
  dp = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(),
      dict(params, data_parallel=parallel.make_mesh(data=4))))
  np.testing.assert_allclose(dp, single, atol=2e-5)


def test_dp_segment_non_pow2_all_to_all(rng):
  """Non-power-of-2 axis sizes keep the all-to-all fixed-order slot
  sum (the butterfly needs P = 2^k): == single-chip at P=3, bitwise
  identical across chips."""
  k, b_shard, s, n, p = 2, 8, 32, 48, 3
  mesh = Mesh(np.asarray(jax.devices()[:p]).reshape(p, 1),
              ("data", "code"))
  d0, h0, v0, x = _data(rng, k, p * b_shard, s, n)
  sw, n_it, upd_step = jnp.float32(0.1), jnp.int32(6), jnp.float32(0.05)
  d_dp, h_dp, _, _ = _run_dp(
      mesh, p, d0, h0, v0, x, sw, n_it, upd_step,
      update_alg="sc_cheap_quadratic_descent", upd_num_iters=1)
  d_dp = np.asarray(d_dp)
  for dev in range(1, p):
    assert np.array_equal(d_dp[dev], d_dp[0])
  d_ref, h_ref, _, _ = fused_train_segment_pallas(
      d0, h0, v0, x, sw, n_it, upd_step,
      update_alg="sc_cheap_quadratic_descent", upd_num_iters=1,
      power_iters=2, interpret=True)
  np.testing.assert_allclose(d_dp[0], np.asarray(d_ref),
                             rtol=2e-5, atol=2e-5)
  np.testing.assert_allclose(np.asarray(h_dp), np.asarray(h_ref),
                             rtol=2e-5, atol=2e-6)
