"""LCA solver tests: fixed point equals the LASSO optimum."""
import numpy as np
import pytest

from vtc_tpu.analysis_transforms.fully_connected import ista_fista, lca

import numpy_oracle as oracle


def _problem(rng, b=12, s=32, n=24):
  d = rng.randn(s, n)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  x = rng.randn(b, n)
  return x.astype(np.float32), d.astype(np.float32)


def _lasso_objective(x, d, codes, lam):
  recon = codes.astype(np.float64) @ d.astype(np.float64)
  return (0.5 * np.sum((recon - x) ** 2)
          + lam * np.sum(np.abs(codes)))


def test_lca_soft_converges_to_lasso_optimum_undercomplete(rng):
  """Undercomplete dictionary -> the LASSO problem is strictly convex
  and the solution unique: LCA and FISTA must agree in codes."""
  x, d = _problem(rng, s=16, n=24)
  lam = 0.15
  lasso = np.asarray(ista_fista.run(x, d, lam, 3000))
  codes = np.asarray(lca.run(x, d, lam, 4000, time_constant=10.0))
  np.testing.assert_allclose(codes, lasso, atol=1e-3)


def test_lca_soft_matches_lasso_objective_overcomplete(rng):
  """Overcomplete dictionaries admit multiple LASSO minimizers; LCA and
  FISTA must reach the same OBJECTIVE value."""
  x, d = _problem(rng)  # s=32 > n=24
  lam = 0.15
  lasso = np.asarray(ista_fista.run(x, d, lam, 3000))
  codes = np.asarray(lca.run(x, d, lam, 4000, time_constant=10.0))
  f_fista = _lasso_objective(x, d, lasso, lam)
  f_lca = _lasso_objective(x, d, codes, lam)
  assert abs(f_lca - f_fista) / abs(f_fista) < 1e-4


def test_lca_nonneg(rng):
  x, d = _problem(rng, s=16, n=24)
  codes = np.asarray(lca.run(x, d, 0.15, 2000, nonnegative_only=True))
  assert np.all(codes >= 0)
  lasso = np.asarray(ista_fista.run(x, d, 0.15, 3000,
                                    nonnegative_only=True))
  np.testing.assert_allclose(codes, lasso, atol=1e-3)


def test_lca_sparsity_increases_with_lambda(rng):
  x, d = _problem(rng, b=32)
  l0 = [float(np.mean(np.asarray(
      lca.run(x, d, lam, 400)) != 0)) for lam in (0.05, 0.2, 0.6)]
  assert l0[0] > l0[1] > l0[2]


def test_lca_warm_start_and_early_stop(rng):
  x, d = _problem(rng, s=16, n=24)
  lam = 0.2
  # converge once, then warm-start: should stay at the fixed point fast
  u_like = np.asarray(lca.run(x, d, lam, 2000))
  warm = np.asarray(lca.run(x, d, lam, 50,
                            initial_potentials=u_like / 1.0))
  assert np.isfinite(warm).all()
  stopped = np.asarray(lca.run(x, d, lam, 5000,
                               early_stopping_epsilon=1e-5))
  full = np.asarray(lca.run(x, d, lam, 5000))
  np.testing.assert_allclose(stopped, full, atol=1e-2)


def test_lca_auto_stepsize(rng):
  x, d = _problem(rng, s=16, n=24)
  codes = np.asarray(lca.run(x, d, 0.15, 3000, stepsize="auto"))
  lasso = np.asarray(ista_fista.run(x, d, 0.15, 3000))
  np.testing.assert_allclose(codes, lasso, atol=1e-3)
