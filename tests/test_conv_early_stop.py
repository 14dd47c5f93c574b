"""In-kernel early stopping for the CONV segment kernels (round-5
closure of the fc/group/conv asymmetry): the single-chip whole-segment
kernel carries the reference stop rule
(/root/reference/vision_transform_codes/analysis_transforms/convolutional/ista_fista.py:156-195)
as a lax.while_loop when the batch is one tile, and the DP RDMA kernel
carries the batch-GLOBAL test via a small fixed-order slot all-reduce of
the shard |delta| sums -- every chip takes the identical trip count."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vtc_tpu.ops import conv_shapes
from vtc_tpu.ops import lipschitz as lip
from vtc_tpu.ops.pallas_conv_dp_train import (
    fused_conv_dp_train_segment_pallas)
from vtc_tpu.ops.pallas_conv_train import (fused_conv_segment_supported,
                                           fused_conv_train_segment_pallas)
from vtc_tpu.training import sparse_coding as sc

EPS = 5e-3


def _problem(rng, k=3, b=4, s=8, c=1, kdim=4, stride=4, img=16):
  """stride == kernel: non-overlapping blocks, so the flat-kernel
  Lipschitz is EXACT and FISTA genuinely converges -- the stop test
  must fire, not time out into the divergence regime that random-data
  overlapping conv lives in (tests/test_pallas_conv_train
  ._assert_close)."""
  pad = conv_shapes.get_padding_amt(img, kdim, stride)
  padding = (pad, pad)
  height = img + pad[0] + pad[1]
  d = rng.randn(s, c, kdim, kdim).astype(np.float32)
  d /= np.sqrt((d ** 2).sum(axis=(1, 2, 3), keepdims=True))
  x = np.zeros((k, b, c, height, height), np.float32)
  x[:, :, :, pad[0]:height - pad[1], pad[0]:height - pad[1]] = (
      0.3 * rng.randn(k, b, c, img, img))
  h = np.abs(rng.rand(s)).astype(np.float32) * 0.01
  v = rng.randn(min(s, c * kdim * kdim)).astype(np.float32)
  return d, h, v, x, (stride, stride), padding


def test_conv_fused_early_stop_matches_composed_path(rng):
  """The in-kernel while_loop stop == the XLA conv stop rule: same trip
  counts per step, hence same trajectory -- and the stop genuinely
  fires."""
  d, h, v, x, strides, padding = _problem(rng)
  assert fused_conv_segment_supported(
      x.shape[1:], d.shape, strides, "fista",
      "sc_cheap_quadratic_descent", early_stopping_epsilon=EPS)

  raw = sc.build_raw_step_fn(
      "convolutional", "fista", "sc_cheap_quadratic_descent",
      kernel_stride=strides, padding=padding, conv_formulation="gram",
      compute_stepsize_in_step=False, early_stopping_epsilon=EPS)
  dj, hj, vj = jnp.asarray(d), jnp.asarray(h), jnp.asarray(v)
  codes = None
  for batch in x:
    eigval, vj = lip.power_iterate(dj.reshape(dj.shape[0], -1), vj,
                                   num_iters=2)
    dj, hj, codes = raw(dj, hj, jnp.asarray(batch), jnp.float32(0.05),
                        jnp.int32(60), jnp.float32(0.02), 1,
                        1.0 / eigval)
  want = (np.asarray(dj), np.asarray(hj), np.asarray(vj),
          np.asarray(codes))
  assert np.isfinite(want[3]).all()

  got = fused_conv_train_segment_pallas(
      d, h, v, x, 0.05, 60, 0.02, kernel_stride=strides,
      padding=padding, power_iters=2, interpret=True,
      early_stopping_epsilon=EPS)
  # same chaos bounds as test_fused_conv_segment_matches_composed_path;
  # a trip-count mismatch in the stop rule would blow far past these
  tols = {"dict": 2e-5, "hessian": 1e-3, "eigvec": 2e-5, "codes": 5e-3}
  for g, w, name in zip(got, want, ["dict", "hessian", "eigvec",
                                    "codes"]):
    np.testing.assert_allclose(np.asarray(g), w, atol=tols[name],
                               err_msg=name)
  # non-vacuous: the fixed-60-iteration run lands elsewhere
  full = fused_conv_train_segment_pallas(
      d, h, v, x, 0.05, 60, 0.02, kernel_stride=strides,
      padding=padding, power_iters=2, interpret=True)
  assert np.abs(np.asarray(full[3]) - want[3]).max() > 1e-5


def test_conv_early_stop_gate():
  """Early stopping needs the whole batch in ONE tile (the stop test is
  a batch-global mean; sequential grid tiles cannot share it)."""
  # the reference's own conv config (batch 5, 256x256, 16x16 @ 8) is
  # single-tile -> in-kernel stop supported
  assert fused_conv_segment_supported(
      (5, 1, 272, 272), (64, 1, 16, 16), (8, 8), "fista",
      "sc_cheap_quadratic_descent", early_stopping_epsilon=1e-4,
      padding=((8, 8), (8, 8)))
  # batch 40 at the same geometry is batch-TILED: supported without
  # eps, rejected with it (falls back to the XLA per-step path)
  assert fused_conv_segment_supported(
      (40, 1, 272, 272), (64, 1, 16, 16), (8, 8), "fista",
      "sc_cheap_quadratic_descent", padding=((8, 8), (8, 8)))
  assert not fused_conv_segment_supported(
      (40, 1, 272, 272), (64, 1, 16, 16), (8, 8), "fista",
      "sc_cheap_quadratic_descent", early_stopping_epsilon=1e-4,
      padding=((8, 8), (8, 8)))


def test_conv_dp_rdma_early_stop_matches_single_chip(rng):
  """DP p=4 with the in-kernel slot-allreduce stop == the single-chip
  fused kernel with the in-kernel stop on the concatenated batch."""
  p = 4
  d, h, v, x, strides, padding = _problem(rng, b=p * 2)
  mesh = Mesh(np.asarray(jax.devices()[:p]).reshape(p, 1),
              ("data", "code"))
  sw, n_it, upd_step = (jnp.float32(0.05), jnp.int32(60),
                        jnp.float32(0.02))

  def body(dd, hh, vv, xx):
    xx = xx.reshape((xx.shape[0], -1) + xx.shape[2:])
    dd, hh, vv, codes = fused_conv_dp_train_segment_pallas(
        dd, hh, vv, xx, sw, n_it, upd_step, kernel_stride=strides,
        padding=padding, axis_name="data", axis_size=p, interpret=True,
        power_iters=2, early_stopping_epsilon=EPS)
    return dd[None], hh, vv, codes

  rep = P()
  fn = jax.jit(jax.shard_map(
      body, mesh=mesh,
      in_specs=(rep, rep, rep, P(None, "data", None, None, None)),
      out_specs=(P("data", None, None, None, None), rep, rep,
                 P("data", None, None, None)), check_vma=False))
  d_dp, h_dp, v_dp, codes_dp = fn(jnp.asarray(d), jnp.asarray(h),
                                  jnp.asarray(v), jnp.asarray(x))
  d_dp = np.asarray(d_dp)
  for dev in range(1, p):
    assert np.array_equal(d_dp[dev], d_dp[0])

  d_ref, h_ref, v_ref, codes_ref = fused_conv_train_segment_pallas(
      jnp.asarray(d), jnp.asarray(h), jnp.asarray(v), jnp.asarray(x),
      sw, n_it, upd_step, kernel_stride=strides, padding=padding,
      power_iters=2, interpret=True, early_stopping_epsilon=EPS)
  np.testing.assert_allclose(d_dp[0], np.asarray(d_ref),
                             rtol=2e-5, atol=2e-5)
  np.testing.assert_allclose(np.asarray(h_dp), np.asarray(h_ref),
                             rtol=2e-5, atol=2e-6)
  np.testing.assert_allclose(np.asarray(codes_dp),
                             np.asarray(codes_ref), rtol=2e-4,
                             atol=2e-5)
  # non-vacuous: differs from the no-eps run of the same kernel
  d_full, _, _, _ = fused_conv_train_segment_pallas(
      jnp.asarray(d), jnp.asarray(h), jnp.asarray(v), jnp.asarray(x),
      sw, n_it, upd_step, kernel_stride=strides, padding=padding,
      power_iters=2, interpret=True)
  assert np.abs(np.asarray(d_ref) - np.asarray(d_full)).max() > 1e-7


def test_trainer_selects_fused_conv_for_early_stop(rng, monkeypatch):
  """conv + eps on a single device auto-selects the FUSED segment
  runner (round 4 kept it on the XLA scan path) and matches the XLA
  trainer at the same epsilon.  The single-chip fused path is gated on
  the TPU backend, so the backend is faked and the kernel forced into
  interpret mode (the DP analogue tests run the real routing on the
  CPU mesh; the real-TPU run is certified by the driver dryrun)."""
  from vtc_tpu.ops import pallas_conv_train
  from vtc_tpu.training import compiled_epoch

  d, _, _, x, strides, padding = _problem(rng)
  params = {
      "mode": "convolutional",
      "num_epochs": 2,
      "code_inference_algorithm": "fista",
      "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 40}},
      "dict_update_param_schedule": {
          0: {"stepsize": 0.02, "num_iters": 1}},
      "strides": strides, "padding": padding,
      "conv_formulation": "pallas",
      "early_stopping_epsilon": EPS,
  }
  xla = np.asarray(compiled_epoch.train_dictionary_scanned(
      x, x[:1], d.copy(), dict(params, conv_formulation="gram")))

  calls = []
  orig_runner = compiled_epoch._fused_conv_segment_runner

  def spy(*a, **kw):
    calls.append(kw.get("early_eps"))
    return orig_runner(*a, **kw)

  orig_kernel = pallas_conv_train.fused_conv_train_segment_pallas

  def interp(*a, **kw):
    kw["interpret"] = True
    return orig_kernel(*a, **kw)

  monkeypatch.setattr(compiled_epoch, "_fused_conv_segment_runner", spy)
  monkeypatch.setattr(pallas_conv_train,
                      "fused_conv_train_segment_pallas", interp)
  monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
  fused = np.asarray(compiled_epoch.train_dictionary_scanned(
      x, x[:1], d.copy(), dict(params)))
  assert calls and calls[0] == pytest.approx(EPS), (
      "conv + eps must take the fused runner with the stop epsilon")
  np.testing.assert_allclose(fused, xla, atol=5e-5)


def test_trainer_selects_conv_rdma_for_dp_early_stop(rng, monkeypatch):
  """conv + DP + eps auto-selects the conv RDMA segment runner
  (in-kernel batch-GLOBAL stop) and matches the single-device
  trainer."""
  from vtc_tpu import parallel
  from vtc_tpu.training import compiled_epoch

  calls = []
  orig = compiled_epoch._dp_rdma_conv_segment_runner

  def spy(*a, **kw):
    calls.append(kw.get("early_eps"))
    return orig(*a, **kw)

  monkeypatch.setattr(compiled_epoch, "_dp_rdma_conv_segment_runner",
                      spy)

  d, _, _, x, strides, padding = _problem(rng, b=8)
  params = {
      "mode": "convolutional",
      "num_epochs": 2,
      "code_inference_algorithm": "fista",
      "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 40}},
      "dict_update_param_schedule": {
          0: {"stepsize": 0.02, "num_iters": 1}},
      "strides": strides, "padding": padding,
      "conv_formulation": "pallas",
      "early_stopping_epsilon": EPS,
  }
  single = np.asarray(compiled_epoch.train_dictionary_scanned(
      x, x[:1], d.copy(), dict(params)))
  dp = np.asarray(compiled_epoch.train_dictionary_scanned(
      x, x[:1], d.copy(),
      dict(params, data_parallel=parallel.make_mesh(data=4))))
  assert calls and calls[0] == pytest.approx(EPS), (
      "conv + DP + eps must take the RDMA runner with the stop epsilon")
  np.testing.assert_allclose(dp, single, atol=5e-5)
