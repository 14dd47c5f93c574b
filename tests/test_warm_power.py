"""Warm-started power iteration must track the exact top eigenvalue as
the dictionary drifts during training."""
import numpy as np

import jax
import jax.numpy as jnp

from vtc_tpu.ops import lipschitz as lip
from vtc_tpu.training.sparse_coding import build_raw_step_fn


def test_warm_power_tracks_exact_eigenvalue_under_drift(rng):
  """Simulate dictionary drift (small perturbation + renorm per step,
  like an update rule) and check the production policy -- exact
  eigenpair seed + 2 warm iterations/step -- stays within 2e-4
  relative of eigvalsh (measured ~1e-6 on real trajectories).  The
  simulated drift (~1% relative row change per step) is itself ~10x
  the flagship config's real per-step dictionary motion."""
  s, n = 48, 32
  d = rng.randn(s, n).astype(np.float32)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  _, v = lip.top_gram_eigenpair(jnp.asarray(d))
  for step in range(40):
    d = d - 0.002 * rng.randn(s, n).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    eigval, v = lip.power_iterate(jnp.asarray(d), v, num_iters=2)
    exact = float(np.asarray(
        lip.top_gram_eigenvalue_exact(jnp.asarray(d))))
    assert abs(float(eigval) - exact) / exact < 2e-4, step


def test_warm_power_tracks_under_aggressive_drift_at_default_iters(rng):
  """The PUBLIC default refresh depth (12 iterations, the fused-kernel
  power_iters default for callers that do NOT guarantee an exact
  eigenpair seed) must hold the 2e-4 bound under 5x more aggressive
  drift (~5% relative row change per step) than the flagship config's
  exact-seeded 2-iteration policy is validated for above."""
  s, n = 48, 32
  d = rng.randn(s, n).astype(np.float32)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  _, v = lip.top_gram_eigenpair(jnp.asarray(d))
  for step in range(40):
    d = d - 0.01 * rng.randn(s, n).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    eigval, v = lip.power_iterate(jnp.asarray(d), v, num_iters=12)
    exact = float(np.asarray(
        lip.top_gram_eigenvalue_exact(jnp.asarray(d))))
    assert abs(float(eigval) - exact) / exact < 2e-4, step


def test_warm_power_trajectory_matches_exact_stable_rule(rng):
  """Full-scan equivalence on a NON-chaotic update rule (steepest
  descent, small stepsize): warm-4 power vs per-batch eigvalsh give the
  same final dictionary.  (The cheap-quadratic rule with a cold Hessian
  EMA amplifies 1e-7 stepsize differences chaotically, so trajectory
  comparison is only meaningful for stable rules.)"""
  s, n, b, k = 32, 24, 16, 30
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  data = rng.randn(k, b, n).astype(np.float32)

  exact_raw = build_raw_step_fn(
      "fully-connected", "fista", "sc_steepest_descent",
      lipschitz_method="eigvalsh", fc_formulation="gram")
  warm_raw = build_raw_step_fn(
      "fully-connected", "fista", "sc_steepest_descent",
      compute_stepsize_in_step=False, fc_formulation="gram")

  def run_exact(d, h, x):
    def body(c, batch):
      d, h = c
      d, h, _ = exact_raw(d, h, batch, jnp.float32(0.05), jnp.int32(10),
                          jnp.float32(0.01), 1, jnp.float32(0.0))
      return (d, h), ()
    return jax.lax.scan(body, (d, h), x)[0][0]

  def run_warm(d, h, v, x):
    def body(c, batch):
      d, h, v = c
      eigval, v = lip.power_iterate(d, v, num_iters=2)
      d, h, _ = warm_raw(d, h, batch, jnp.float32(0.05), jnp.int32(10),
                         jnp.float32(0.01), 1, 1.0 / eigval)
      return (d, h, v), ()
    return jax.lax.scan(body, (d, h, v), x)[0][0]

  h0 = jnp.zeros(s)
  _, v0 = lip.top_gram_eigenpair(jnp.asarray(d0))
  d_exact = np.asarray(jax.jit(run_exact)(
      jnp.asarray(d0), h0, jnp.asarray(data)))
  d_warm = np.asarray(jax.jit(run_warm)(
      jnp.asarray(d0), h0, v0, jnp.asarray(data)))
  np.testing.assert_allclose(d_warm, d_exact, atol=1e-4)
