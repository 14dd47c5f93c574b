"""Fused whole-segment ICA train kernel (ops/pallas_ica_train) vs the
composed XLA path (interpreter mode on CPU; the real-TPU comparison
runs in bench/verify).  Invariants: one kernel launch over k batches
reproduces the scan of [Newton-Schulz refresh -> codes -> natural-
gradient update] that _segment_runner_tracked runs; the emitted
segment-max residual is the max of refine_inverse_guarded's per-step
gate quantity; and the trainer's optimistic guard falls back to the
per-step-guarded XLA path on divergence."""
import numpy as np

import jax.numpy as jnp

from vtc_tpu.analysis_transforms.fully_connected import invertible_linear
from vtc_tpu.dict_update_rules.fully_connected import ica_natural_gradient
from vtc_tpu.ops.pallas_ica_train import (fused_ica_segment_supported,
                                          fused_ica_train_segment_pallas)
from vtc_tpu.training import ica as ica_trainer


def _problem(rng, k=3, b=16, n=128, stepsize=0.02):
  d = np.linalg.qr(rng.randn(n, n))[0].astype(np.float32)
  d += 0.05 * rng.randn(n, n).astype(np.float32)
  batches = (0.5 * rng.randn(k, b, n)).astype(np.float32)
  return d, batches, stepsize


def _reference_segment(d0, xi0, batches, stepsize, refine_iters=5,
                       upd_num_iters=1):
  """The composed XLA semantics the kernel must match (healthy path of
  _segment_runner_tracked)."""
  d, xi = jnp.asarray(d0), jnp.asarray(xi0)
  residuals = []
  eye = jnp.eye(d.shape[0], dtype=jnp.float32)
  for batch in batches:
    xi = invertible_linear.newton_refine_inverse(d, xi, refine_iters)
    residuals.append(float(jnp.max(jnp.abs(d @ xi - eye))))
    codes = jnp.asarray(batch) @ xi
    d = ica_natural_gradient._update(
        d, codes, jnp.float32(stepsize), upd_num_iters)
  return np.asarray(d), np.asarray(xi), np.asarray(residuals)


def test_fused_ica_segment_matches_composed_path(rng):
  d0, batches, stepsize = _problem(rng)
  xi0 = np.asarray(invertible_linear.exact_inverse(jnp.asarray(d0)))
  want_d, want_xi, want_res = _reference_segment(
      d0, xi0, batches, stepsize)
  got_d, got_xi, got_res = fused_ica_train_segment_pallas(
      d0, xi0, batches, stepsize, interpret=True)
  np.testing.assert_allclose(np.asarray(got_d), want_d, atol=2e-5)
  np.testing.assert_allclose(np.asarray(got_xi), want_xi, atol=2e-4)
  np.testing.assert_allclose(float(got_res), want_res.max(), atol=1e-5)
  assert (want_res < 1e-3).all()  # healthy segment: guard would pass


def test_fused_ica_segment_multi_update_iters(rng):
  d0, batches, stepsize = _problem(rng, k=2)
  xi0 = np.asarray(invertible_linear.exact_inverse(jnp.asarray(d0)))
  want_d, _, _ = _reference_segment(d0, xi0, batches, stepsize,
                                    upd_num_iters=3)
  got_d, _, _ = fused_ica_train_segment_pallas(
      d0, xi0, batches, stepsize, upd_num_iters=3, interpret=True)
  np.testing.assert_allclose(np.asarray(got_d), want_d, atol=2e-5)


def test_fused_ica_supported_gate():
  assert fused_ica_segment_supported(128, 250)
  assert fused_ica_segment_supported(256, 250)
  assert not fused_ica_segment_supported(100, 250)  # lane misalign
  assert not fused_ica_segment_supported(2048, 250)  # VMEM


def _scanned(batches, d0, stepsize, use_fused, extra=None):
  params = {
      "num_epochs": 1,
      "dictionary_update_algorithm": "ica_natural_gradient",
      "dict_update_param_schedule": {
          0: {"stepsize": stepsize, "num_iters": 1}},
      "use_fused": use_fused,
  }
  params.update(extra or {})
  return np.asarray(ica_trainer.train_dictionary_scanned(
      batches, d0.copy(), params))


def test_trainer_fused_matches_xla_path(rng):
  """use_fused=True (interpret off-TPU) must reproduce the XLA scanned
  trajectory, including across a chunk boundary (k=3 -> 2+1)."""
  d0, batches, stepsize = _problem(rng, k=3)
  d_xla = _scanned(batches, d0, stepsize, use_fused=False)
  d_fused = _scanned(batches, d0, stepsize, use_fused=True)
  np.testing.assert_allclose(d_fused, d_xla, atol=2e-5)


def test_trainer_guard_falls_back_on_divergence(rng):
  """A stepsize extreme enough to break Newton-Schulz tracking must
  trip the deferred guard: the fused trainer rolls back and reruns on
  the per-step-guarded XLA path, landing on the SAME result as
  use_fused=False (which takes the per-step LU fallback)."""
  d0, batches, _ = _problem(rng, k=3)
  stepsize = 40.0  # wrecks D by far more than refinement can track
  d_xla = _scanned(batches, d0, stepsize, use_fused=False)
  d_fused = _scanned(batches, d0, stepsize, use_fused=True)
  assert np.isfinite(d_xla).all()
  np.testing.assert_allclose(d_fused, d_xla, rtol=1e-5, atol=1e-5)


def test_trainer_fused_dp_matches_single_device(rng):
  """Fused-DP composition (per-shard solve+stats kernel + one stat
  psum + replicated update) == the single-device fused trainer on the
  8-device CPU mesh."""
  from vtc_tpu import parallel

  mesh = parallel.make_mesh(data=8)
  d0, batches, stepsize = _problem(rng, k=3, b=16)
  d_single = _scanned(batches, d0, stepsize, use_fused=True)
  d_dp = _scanned(batches, d0, stepsize, use_fused=True,
                  extra={"data_parallel": mesh})
  np.testing.assert_allclose(d_dp, d_single, atol=1e-4)


def test_trainer_refine_iters_pass_through(rng):
  """all_params['refine_iters'] reaches both the fused and XLA paths
  (trajectories at the same count agree; different counts differ)."""
  d0, batches, stepsize = _problem(rng, k=3)
  extra = {"refine_iters": 2}
  d_xla = _scanned(batches, d0, stepsize, use_fused=False, extra=extra)
  d_fused = _scanned(batches, d0, stepsize, use_fused=True, extra=extra)
  np.testing.assert_allclose(d_fused, d_xla, atol=2e-5)


def test_ica_boost_restores_deep_refinement_accuracy(rng):
  """A stale inverse seed (residual ~0.35, e.g. after a dictionary
  jump) leaves depth-3 refinement at a ~2e-4 residual -- above the
  'highest' boost tol -- so the residual-adaptive boost (_TIERS /
  BENCH_NOTES UPDATE 30d) must fire and restore deep-refinement
  accuracy: the boosted trajectory tracks the exact-inverse trainer
  ~40x tighter than bare depth 3."""
  n = 128
  d0 = (np.linalg.qr(rng.randn(n, n))[0]
        + 0.05 * rng.randn(n, n)).astype(np.float32)
  batches = (0.5 * rng.randn(3, 32, n)).astype(np.float32)
  xi0 = np.asarray(invertible_linear.exact_inverse(jnp.asarray(d0)))
  xi_stale = (1.35 * xi0).astype(np.float32)  # residual 0.35, NS-safe
  step = 0.01

  d_exact = jnp.asarray(d0)
  for b in batches:
    codes = invertible_linear._solve_nonortho(jnp.asarray(b), d_exact)
    d_exact = ica_natural_gradient._update(
        d_exact, codes, jnp.float32(step), 1)
  d_exact = np.asarray(d_exact)

  bare = fused_ica_train_segment_pallas(
      d0, xi_stale, batches, step, refine_iters=3, interpret=True)
  boost = fused_ica_train_segment_pallas(
      d0, xi_stale, batches, step, refine_iters=3, boost_tol=1e-6,
      interpret=True)
  e_bare = np.abs(np.asarray(bare[0]) - d_exact).max()
  e_boost = np.abs(np.asarray(boost[0]) - d_exact).max()
  assert float(bare[2]) > 1e-5     # bare depth left a visible residual
  assert float(boost[2]) < 1e-6    # the boost recovered the fp floor
  assert e_boost < 1e-6, e_boost
  assert e_boost < e_bare / 10, (e_boost, e_bare)
