"""Early stopping under data parallelism: the DP while-predicate pmean
keeps the reference's batch-GLOBAL stop test (fc/ista_fista.py:135-144)
-- DP == single-chip early-stopped trajectory on the virtual mesh, and
the stop actually fires (non-vacuous)."""
import numpy as np
import pytest

import jax.numpy as jnp

from vtc_tpu import parallel
from vtc_tpu.training import compiled_epoch
from vtc_tpu.training.sparse_coding import build_raw_step_fn

EPS = 1e-3


def _params(extra=None):
  p = {
      "mode": "fully-connected",
      "num_epochs": 2,
      "code_inference_algorithm": "fista",
      "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 50}},
      "dict_update_param_schedule": {
          0: {"stepsize": 0.05, "num_iters": 1}},
      "fc_formulation": "gram",
      "lipschitz_method": "eigvalsh",
  }
  p.update(extra or {})
  return p


def test_fc_dp_early_stop_matches_single_chip(rng):
  k, b, s, n = 3, 16, 12, 16
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  batches = rng.randn(k, b, n).astype(np.float32) * 0.5

  single = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(),
      _params({"early_stopping_epsilon": EPS})))
  dp = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(),
      _params({"early_stopping_epsilon": EPS,
               "data_parallel": parallel.make_mesh(data=4)})))
  np.testing.assert_allclose(dp, single, atol=2e-5)

  # non-vacuous: the stopped trajectory differs from the full-50-iter
  # one (if the stop never fired these would be identical)
  full = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(), _params()))
  assert np.max(np.abs(single - full)) > 1e-7


def test_fc_dp_early_stop_codes_match_global_solve(rng):
  """The DP early-stopped codes equal the single-device early-stopped
  solve on the concatenated global batch (same stop iteration)."""
  from vtc_tpu.parallel import build_shard_map_train_step

  b, s, n = 32, 12, 16
  mesh = parallel.make_mesh(data=4)
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  batch = rng.randn(b, n).astype(np.float32) * 0.5
  h0 = np.zeros(s, np.float32)

  eps = 3e-2  # fires well inside the 50-iteration budget
  dp_step = build_shard_map_train_step(
      mesh, "fully-connected", "fista", "sc_cheap_quadratic_descent",
      early_stopping_epsilon=eps)
  _, _, codes_dp = dp_step(jnp.asarray(d0), jnp.asarray(h0),
                           jnp.asarray(batch), jnp.float32(0.05),
                           jnp.int32(50), jnp.float32(0.05))

  raw = build_raw_step_fn(
      "fully-connected", "fista", "sc_cheap_quadratic_descent",
      fc_formulation="gram", early_stopping_epsilon=eps)
  _, _, codes_single = raw(
      jnp.asarray(d0), jnp.asarray(h0), jnp.asarray(batch),
      jnp.float32(0.05), jnp.int32(50), jnp.float32(0.05), 1,
      jnp.float32(0.0))
  np.testing.assert_allclose(np.asarray(codes_dp),
                             np.asarray(codes_single),
                             rtol=2e-5, atol=2e-6)
  # non-vacuous: the early-stopped codes differ from the full solve
  raw_noeps = build_raw_step_fn(
      "fully-connected", "fista", "sc_cheap_quadratic_descent",
      fc_formulation="gram")
  _, _, codes_noeps = raw_noeps(
      jnp.asarray(d0), jnp.asarray(h0), jnp.asarray(batch),
      jnp.float32(0.05), jnp.int32(50), jnp.float32(0.05), 1,
      jnp.float32(0.0))
  assert float(jnp.max(jnp.abs(codes_single - codes_noeps))) > 1e-7


def test_fc_dp_rdma_in_kernel_early_stop_matches_fused(rng):
  """The whole-segment RDMA DP kernel's IN-KERNEL batch-GLOBAL stop
  test (one small slot all-reduce of the shard |delta| sums per
  iteration) == the single-chip fused kernel's in-kernel stop on the
  concatenated global batch."""
  import jax
  from jax.sharding import Mesh, PartitionSpec as P

  from vtc_tpu.ops import lipschitz as lip
  from vtc_tpu.ops.pallas_dp_train import fused_dp_train_segment_pallas
  from vtc_tpu.ops.pallas_train_step import fused_train_segment_pallas

  k, b, s, n, p = 3, 32, 16, 24, 4
  eps = 3e-2
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  x = rng.randn(k, b, n).astype(np.float32) * 0.5
  h0 = np.abs(rng.randn(s)).astype(np.float32) * 0.01
  _, v0 = lip.top_gram_eigenpair(jnp.asarray(d0))
  mesh = Mesh(np.asarray(jax.devices()[:p]).reshape(p, 1),
              ("data", "code"))

  def body(d, h, v, xs):
    return fused_dp_train_segment_pallas(
        d, h, v, xs, jnp.float32(0.05), jnp.int32(50),
        jnp.float32(0.005), axis_name="data", axis_size=p,
        power_iters=2, interpret=True, early_stopping_epsilon=eps)

  rep = P()
  fn = jax.jit(jax.shard_map(
      body, mesh=mesh,
      in_specs=(rep, rep, rep, P(None, "data", None)),
      out_specs=(rep, rep, rep, P("data", None)), check_vma=False))
  d_dp, h_dp, v_dp, codes_dp = fn(jnp.asarray(d0), jnp.asarray(h0),
                                  v0, jnp.asarray(x))

  d_ref, h_ref, _, codes_ref = fused_train_segment_pallas(
      jnp.asarray(d0), jnp.asarray(h0), v0, jnp.asarray(x),
      jnp.float32(0.05), jnp.int32(50), jnp.float32(0.005),
      power_iters=2, interpret=True, early_stopping_epsilon=eps)
  np.testing.assert_allclose(np.asarray(d_dp), np.asarray(d_ref),
                             rtol=3e-5, atol=3e-5)
  np.testing.assert_allclose(np.asarray(h_dp), np.asarray(h_ref),
                             rtol=3e-5, atol=3e-6)
  np.testing.assert_allclose(np.asarray(codes_dp),
                             np.asarray(codes_ref), rtol=3e-4,
                             atol=3e-5)
  # non-vacuous: differs from the no-eps run of the same kernel
  d_full, _, _, _ = fused_train_segment_pallas(
      jnp.asarray(d0), jnp.asarray(h0), v0, jnp.asarray(x),
      jnp.float32(0.05), jnp.int32(50), jnp.float32(0.005),
      power_iters=2, interpret=True)
  assert np.max(np.abs(np.asarray(d_ref) - np.asarray(d_full))) > 1e-7


def test_trainer_selects_rdma_kernel_for_dp_early_stop(rng, monkeypatch):
  """train_dictionary_scanned with fc pallas + DP + eps auto-selects
  the RDMA whole-segment runner (not the XLA fallback) and matches the
  single-device trainer."""
  calls = []
  orig = compiled_epoch._dp_rdma_segment_runner

  def spy(*a, **kw):
    calls.append(kw.get("early_eps"))
    return orig(*a, **kw)

  monkeypatch.setattr(compiled_epoch, "_dp_rdma_segment_runner", spy)

  k, b, s, n = 3, 32, 16, 24
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  batches = rng.randn(k, b, n).astype(np.float32) * 0.5
  params = _params({"early_stopping_epsilon": 3e-2,
                    "fc_formulation": "pallas"})
  params.pop("lipschitz_method")  # default power_warm
  single = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(), dict(params)))
  dp = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(),
      dict(params, data_parallel=parallel.make_mesh(data=4))))
  assert calls and calls[0] == pytest.approx(3e-2), (
      "the DP run must take the RDMA runner with the stop epsilon")
  np.testing.assert_allclose(dp, single, atol=5e-5)


def test_trainer_selects_group_rdma_for_dp_early_stop(rng, monkeypatch):
  """Subspace + DP + eps auto-selects the group RDMA segment kernel
  (in-kernel batch-GLOBAL stop) and matches the single-device trainer
  (which runs the exact XLA group solve)."""
  calls = []
  orig = compiled_epoch._dp_rdma_group_segment_runner

  def spy(*a, **kw):
    calls.append(kw.get("early_eps"))
    return orig(*a, **kw)

  monkeypatch.setattr(compiled_epoch, "_dp_rdma_group_segment_runner",
                      spy)

  k, b, s, n = 3, 32, 16, 24
  groups = [[i, i + 1] for i in range(0, s, 2)]
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  batches = rng.randn(k, b, n).astype(np.float32) * 0.5
  params = _params({
      "early_stopping_epsilon": 3e-2,
      "fc_formulation": "pallas",
      "code_inference_algorithm": "subspace_fista",
      "dictionary_update_algorithm":
          "subspace_sc_cheap_quadratic_descent",
      "group_assignments": groups,
      "subspace_alignment_penalty": 0.1,
  })
  params.pop("lipschitz_method")  # default power_warm
  single = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(), dict(params)))
  dp = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(),
      dict(params, data_parallel=parallel.make_mesh(data=4))))
  assert calls and calls[0] == pytest.approx(3e-2), (
      "the DP run must take the group RDMA runner with the stop eps")
  np.testing.assert_allclose(dp, single, atol=5e-5)


def test_subspace_and_conv_dp_early_stop(rng):
  """The batch-global DP stop test reaches the subspace and conv DP
  solvers too."""
  from vtc_tpu.parallel import build_shard_map_train_step

  mesh = parallel.make_mesh(data=2)
  # subspace
  s, n, b = 12, 16, 8
  groups = [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]]
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  batch = rng.randn(b, n).astype(np.float32) * 0.5
  dp_step = build_shard_map_train_step(
      mesh, "fully-connected", "subspace_fista",
      "subspace_sc_cheap_quadratic_descent", group_assignments=groups,
      early_stopping_epsilon=EPS)
  d1, _, codes = dp_step(jnp.asarray(d0), jnp.zeros(s),
                         jnp.asarray(batch), jnp.float32(0.05),
                         jnp.int32(40), jnp.float32(0.05))
  assert np.isfinite(np.asarray(d1)).all()
  assert np.isfinite(np.asarray(codes)).all()

  # convolutional
  kdim, stride, img = 4, (2, 2), 8
  cb = 4
  conv_batch = np.zeros((cb, 1, img + 4, img + 4), np.float32)
  conv_batch[:, 0, 2:-2, 2:-2] = rng.randn(cb, img, img)
  conv_dict = rng.randn(8, 1, kdim, kdim).astype(np.float32)
  conv_dict /= np.sqrt((conv_dict ** 2).sum(axis=(1, 2, 3),
                                            keepdims=True))
  conv_step = build_shard_map_train_step(
      mesh, "convolutional", "ista", "sc_cheap_quadratic_descent",
      kernel_stride=stride, padding=((2, 2), (2, 2)),
      early_stopping_epsilon=EPS)
  d2, _, c2 = conv_step(jnp.asarray(conv_dict), jnp.zeros(8),
                        jnp.asarray(conv_batch), jnp.float32(0.02),
                        jnp.int32(40), jnp.float32(0.01))
  assert np.isfinite(np.asarray(d2)).all()
  assert np.isfinite(np.asarray(c2)).all()
