"""Whole-segment DP ICA kernel (in-kernel RDMA stat all-reduce) vs the
single-chip fused ICA segment kernel on the concatenated global batch.

Runs in Pallas TPU interpret mode, which simulates the remote DMAs and
semaphores across the virtual CPU devices (conftest)."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vtc_tpu.analysis_transforms.fully_connected import invertible_linear
from vtc_tpu.ops.pallas_ica_train import (
    fused_ica_dp_segment_supported, fused_ica_dp_train_segment_pallas,
    fused_ica_train_segment_pallas)


def _problem(rng, k, b, n):
  d = np.linalg.qr(rng.randn(n, n))[0].astype(np.float32)
  d += 0.05 * rng.randn(n, n).astype(np.float32)
  xi0 = np.asarray(invertible_linear.exact_inverse(jnp.asarray(d)))
  batches = (0.5 * rng.randn(k, b, n)).astype(np.float32)
  return d, xi0, batches


def _run_dp(mesh, axis_size, d0, xi0, batches, stepsize, **kw):
  """batches: (k, global_b, n) -> shard over 'data'; emits every chip's
  dictionary for the bitwise cross-chip identity assert."""
  def body(d, xi, x):
    x = x.reshape(x.shape[0], -1, x.shape[-1])
    d, xi, res = fused_ica_dp_train_segment_pallas(
        d, xi, x, stepsize, axis_name="data", axis_size=axis_size,
        interpret=True, **kw)
    return d[None], xi, res

  rep = P()
  fn = jax.jit(jax.shard_map(
      body, mesh=mesh,
      in_specs=(rep, rep, P(None, "data", None)),
      out_specs=(P("data", None, None), rep, rep), check_vma=False))
  return fn(jnp.asarray(d0), jnp.asarray(xi0), jnp.asarray(batches))


def test_ica_dp_segment_matches_single_chip(rng):
  k, b_shard, n, p = 3, 8, 128, 4
  mesh = Mesh(np.asarray(jax.devices()[:p]).reshape(p), ("data",))
  d0, xi0, x = _problem(rng, k, p * b_shard, n)
  assert fused_ica_dp_segment_supported(n, b_shard, p)
  stepsize = jnp.float32(0.02)

  d_dp, xi_dp, res_dp = _run_dp(mesh, p, d0, xi0, x, stepsize,
                                upd_num_iters=2)
  d_dp = np.asarray(d_dp)
  for dev in range(1, p):
    assert np.array_equal(d_dp[dev], d_dp[0])

  d_ref, xi_ref, res_ref = fused_ica_train_segment_pallas(
      d0, xi0, x, stepsize, upd_num_iters=2, interpret=True)
  np.testing.assert_allclose(d_dp[0], np.asarray(d_ref),
                             rtol=2e-5, atol=2e-5)
  np.testing.assert_allclose(np.asarray(xi_dp), np.asarray(xi_ref),
                             rtol=2e-4, atol=2e-4)
  # the guard residual is computed from the replicated dictionary, so
  # it matches the single-chip segment's
  np.testing.assert_allclose(float(res_dp), float(res_ref), atol=1e-5)


def test_ica_dp_segment_single_device_axis(rng):
  """axis_size == 1: no communication; == the single-chip kernel."""
  k, b, n = 2, 16, 128
  mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("data",))
  d0, xi0, x = _problem(rng, k, b, n)
  d_dp, xi_dp, _ = _run_dp(mesh, 1, d0, xi0, x, jnp.float32(0.02))
  d_ref, xi_ref, _ = fused_ica_train_segment_pallas(
      d0, xi0, x, jnp.float32(0.02), interpret=True)
  np.testing.assert_allclose(np.asarray(d_dp)[0], np.asarray(d_ref),
                             rtol=2e-6, atol=2e-6)
  np.testing.assert_allclose(np.asarray(xi_dp), np.asarray(xi_ref),
                             rtol=2e-6, atol=2e-6)


def test_scanned_ica_trainer_rdma_auto_select(rng):
  """train_dictionary_scanned with use_fused=True on a data=4 mesh
  takes the whole-segment RDMA runner (the mesh leaves a spare host
  thread for the interpreter) and matches the single-device scanned
  trainer."""
  from vtc_tpu import parallel
  from vtc_tpu.training import ica as ica_trainer

  k, b, n = 4, 16, 128
  d0 = np.linalg.qr(rng.randn(n, n))[0].astype(np.float32)
  batches = (0.5 * rng.randn(k, b, n)).astype(np.float32)
  params = {
      "num_epochs": 2,
      "dictionary_update_algorithm": "ica_natural_gradient",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.02, "num_iters": 1}},
      "use_fused": True,
  }
  single = np.asarray(ica_trainer.train_dictionary_scanned(
      batches, d0.copy(), dict(params)))
  mesh = parallel.make_mesh(data=4)
  dp = np.asarray(ica_trainer.train_dictionary_scanned(
      batches, d0.copy(), dict(params, data_parallel=mesh)))
  np.testing.assert_allclose(dp, single, atol=2e-5)
