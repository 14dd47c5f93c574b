"""Whole-segment conv-DP kernel (in-kernel RDMA all-reduce) vs the
single-chip fused conv segment kernel on the concatenated global batch
(interpret mode over the virtual CPU devices)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vtc_tpu.ops import lipschitz as lip
from vtc_tpu.ops.pallas_conv_dp_train import (
    fused_conv_dp_segment_supported, fused_conv_dp_train_segment_pallas)
from vtc_tpu.ops.pallas_conv_train import fused_conv_train_segment_pallas

KDIM, STRIDE, IMG, S = 4, (2, 2), 8, 8
PAD = ((2, 2), (2, 2))


def _data(rng, k, b):
  d0 = rng.randn(S, 1, KDIM, KDIM).astype(np.float32)
  d0 /= np.sqrt((d0 ** 2).sum(axis=(1, 2, 3), keepdims=True))
  hw = IMG + PAD[0][0] + PAD[0][1]
  x = np.zeros((k, b, 1, hw, hw), np.float32)
  x[:, :, 0, 2:-2, 2:-2] = rng.randn(k, b, IMG, IMG)
  h0 = np.abs(rng.randn(S)).astype(np.float32) * 0.01
  _, v0 = lip.top_gram_eigenpair(jnp.asarray(d0).reshape(S, -1))
  return jnp.asarray(d0), jnp.asarray(h0), v0, jnp.asarray(x)


def _run_dp(mesh, axis_size, d0, h0, v0, batches, sw, n_it, upd_step,
            **kw):
  def body(d, h, v, x):
    x = x.reshape((x.shape[0], -1) + x.shape[2:])
    d, h, v, codes = fused_conv_dp_train_segment_pallas(
        d, h, v, x, sw, n_it, upd_step, kernel_stride=STRIDE,
        padding=PAD, axis_name="data", axis_size=axis_size,
        interpret=True, power_iters=2, **kw)
    return d[None], h, v, codes

  rep = P()
  fn = jax.jit(jax.shard_map(
      body, mesh=mesh,
      in_specs=(rep, rep, rep, P(None, "data", None, None, None)),
      out_specs=(P("data", None, None, None, None), rep, rep,
                 P("data", None, None, None)), check_vma=False))
  return fn(d0, h0, v0, batches)


@pytest.mark.parametrize("upd_alg,upd_iters", [
    ("sc_cheap_quadratic_descent", 1),
    ("sc_steepest_descent", 2),   # gram-form stats path
])
def test_conv_dp_segment_matches_single_chip(rng, upd_alg, upd_iters):
  k, b_shard, p = 2, 2, 4
  mesh = Mesh(np.asarray(jax.devices()[:p]).reshape(p, 1),
              ("data", "code"))
  d0, h0, v0, x = _data(rng, k, p * b_shard)
  img_shard = (b_shard,) + x.shape[2:]
  assert fused_conv_dp_segment_supported(
      img_shard, d0.shape, STRIDE, "fista", upd_alg, p,
      upd_num_iters=upd_iters, padding=PAD)
  sw, n_it, upd_step = jnp.float32(0.02), jnp.int32(5), jnp.float32(0.02)

  d_dp, h_dp, v_dp, codes_dp = _run_dp(
      mesh, p, d0, h0, v0, x, sw, n_it, upd_step,
      update_alg=upd_alg, upd_num_iters=upd_iters)
  d_dp = np.asarray(d_dp)
  for dev in range(1, p):
    assert np.array_equal(d_dp[dev], d_dp[0])

  d_ref, h_ref, v_ref, codes_ref = fused_conv_train_segment_pallas(
      d0, h0, v0, x, sw, n_it, upd_step, kernel_stride=STRIDE,
      padding=PAD, update_alg=upd_alg, upd_num_iters=upd_iters,
      power_iters=2, interpret=True)
  np.testing.assert_allclose(d_dp[0], np.asarray(d_ref),
                             rtol=2e-5, atol=2e-5)
  np.testing.assert_allclose(np.asarray(h_dp), np.asarray(h_ref),
                             rtol=2e-5, atol=2e-6)
  np.testing.assert_allclose(np.asarray(v_dp), np.asarray(v_ref),
                             rtol=2e-4, atol=2e-5)
  np.testing.assert_allclose(np.asarray(codes_dp),
                             np.asarray(codes_ref),
                             rtol=2e-4, atol=2e-5)


def test_conv_dp_segment_single_device_axis(rng):
  """axis_size == 1: no communication; == the single-chip kernel."""
  k, b = 2, 3
  mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
              ("data", "code"))
  d0, h0, v0, x = _data(rng, k, b)
  d_dp, h_dp, _, _ = _run_dp(mesh, 1, d0, h0, v0, x, jnp.float32(0.02),
                             jnp.int32(4), jnp.float32(0.02))
  d_ref, h_ref, _, _ = fused_conv_train_segment_pallas(
      d0, h0, v0, x, jnp.float32(0.02), jnp.int32(4), jnp.float32(0.02),
      kernel_stride=STRIDE, padding=PAD, power_iters=2, interpret=True)
  np.testing.assert_allclose(np.asarray(d_dp)[0], np.asarray(d_ref),
                             rtol=2e-6, atol=2e-6)
  np.testing.assert_allclose(np.asarray(h_dp), np.asarray(h_ref),
                             rtol=2e-6, atol=2e-7)


def test_conv_dp_zero_extension_geometry(rng):
  """kernel % stride != 0 (3x3 @ stride 2): the zero-extension support
  projection runs in the DP update too."""
  kdim, stride, img, s = 3, (2, 2), 8, 8
  pad = ((2, 2), (2, 2))
  k, b_shard, p = 2, 2, 2
  mesh = Mesh(np.asarray(jax.devices()[:p]).reshape(p, 1),
              ("data", "code"))
  d0 = rng.randn(s, 1, kdim, kdim).astype(np.float32)
  d0 /= np.sqrt((d0 ** 2).sum(axis=(1, 2, 3), keepdims=True))
  hw = img + pad[0][0] + pad[0][1]
  # stride-exact trailing correction
  extra = (-(hw - kdim)) % stride[0]
  hw += extra
  pad_used = ((2, 2 + extra), (2, 2 + extra))
  x = np.zeros((k, p * b_shard, 1, hw, hw), np.float32)
  x[:, :, 0, 2:2 + img, 2:2 + img] = rng.randn(k, p * b_shard, img, img)
  h0 = np.abs(rng.randn(s)).astype(np.float32) * 0.01
  _, v0 = lip.top_gram_eigenpair(jnp.asarray(d0).reshape(s, -1))
  sw, n_it, upd_step = jnp.float32(0.02), jnp.int32(4), jnp.float32(0.02)

  def body(d, h, v, xx):
    xx = xx.reshape((xx.shape[0], -1) + xx.shape[2:])
    d, h, v, _ = fused_conv_dp_train_segment_pallas(
        d, h, v, xx, sw, n_it, upd_step, kernel_stride=stride,
        padding=pad_used, axis_name="data", axis_size=p,
        interpret=True, power_iters=2)
    return d

  rep = P()
  fn = jax.jit(jax.shard_map(
      body, mesh=mesh,
      in_specs=(rep, rep, rep, P(None, "data", None, None, None)),
      out_specs=rep, check_vma=False))
  d_dp = np.asarray(fn(jnp.asarray(d0), jnp.asarray(h0), v0,
                       jnp.asarray(x)))
  d_ref, _, _, _ = fused_conv_train_segment_pallas(
      jnp.asarray(d0), jnp.asarray(h0), v0, jnp.asarray(x), sw, n_it,
      upd_step, kernel_stride=stride, padding=pad_used, power_iters=2,
      interpret=True)
  np.testing.assert_allclose(d_dp, np.asarray(d_ref),
                             rtol=2e-5, atol=2e-5)


def test_scanned_trainer_conv_rdma_auto_select(rng):
  """train_dictionary_scanned (conv mode) on a data=4 mesh auto-selects
  the whole-segment conv RDMA runner and matches the single-device
  scanned trainer."""
  from vtc_tpu import parallel
  from vtc_tpu.training import compiled_epoch

  k, b = 3, 8
  hw = IMG + 4
  d0 = rng.randn(S, 1, KDIM, KDIM).astype(np.float32)
  d0 /= np.sqrt((d0 ** 2).sum(axis=(1, 2, 3), keepdims=True))
  batches = np.zeros((k, b, 1, hw, hw), np.float32)
  batches[:, :, 0, 2:-2, 2:-2] = rng.randn(k, b, IMG, IMG)
  params = {
      "mode": "convolutional",
      "num_epochs": 2,
      "code_inference_algorithm": "fista",
      "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.02, "num_iters": 4}},
      "dict_update_param_schedule": {
          0: {"stepsize": 0.02, "num_iters": 1}},
      "strides": STRIDE, "padding": PAD,
      "conv_formulation": "pallas",
  }
  single = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(), dict(params)))
  dp = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(),
      dict(params, data_parallel=parallel.make_mesh(data=4))))
  np.testing.assert_allclose(dp, single, atol=2e-5)
