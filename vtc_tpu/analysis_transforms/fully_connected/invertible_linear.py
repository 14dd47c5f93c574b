"""Exact linear analysis transform (matrix inverse / transpose).

Parity with vision_transform_codes/analysis_transforms/fully_connected/
invertible_linear.py:6-26.  For the non-orthonormal case we use a linear
solve instead of forming the explicit inverse: ``codes = X D^{-1}`` is the
solution of ``codes D = X``, i.e. ``D^T codes^T = X^T`` -- better
conditioned and cheaper on TPU than ``inverse`` + matmul.
"""
import functools

import jax
import jax.numpy as jnp
from vtc_tpu.ops.precision import matmul_precision


@jax.jit
def _solve_nonortho(images, dictionary):
  # codes @ dictionary = images  =>  dictionary^T @ codes^T = images^T
  with matmul_precision():
    return jax.scipy.linalg.solve(dictionary.T, images.T).T


@jax.jit
def _solve_ortho(images, dictionary):
  with matmul_precision():
    return images @ dictionary.T


@jax.jit
def exact_inverse(dictionary):
  """D^{-1} via LU -- the warm-tracking seed (once per training run)."""
  with matmul_precision():
    return jnp.linalg.inv(dictionary)


@functools.partial(jax.jit, static_argnames=("num_iters", "precision"))
def newton_refine_inverse(dictionary, inverse_estimate, num_iters: int = 5,
                          precision=None):
  """Warm inverse tracking for training loops (Newton-Schulz).

  ``X <- X (2I - D X)`` squares the residual ``r = ||I - D X||`` per
  iteration, and each iteration is two (n, n) MXU matmuls -- unlike the
  LU solve, which is latency-bound on TPU.  ICA's natural-gradient
  update moves the dictionary multiplicatively by O(stepsize) per batch,
  so a warm estimate enters each step with r <~ a few tenths and leaves
  5 refinements (r -> r^32) at fp-level residual; codes computed as ``X_batch @ Dinv``
  then match the exact per-batch solve far below the 1e-4 parity bar
  (tests/test_training.py::test_ica_warm_inverse_*).

  ``precision`` optionally drops the refinement matmuls to a faster MXU
  tier ('tensorfloat32' = 3-pass bf16x3, 'bfloat16' = single pass); the
  achievable residual then floors at that tier's product accuracy
  instead of fp level (Newton-Schulz is self-correcting, so the
  iteration still contracts toward the tier floor)."""
  with matmul_precision(precision):
    x = inverse_estimate
    eye2 = 2.0 * jnp.eye(dictionary.shape[0], dtype=x.dtype)
    for _ in range(num_iters):
      x = x @ (eye2 - dictionary @ x)
    return x


@functools.partial(jax.jit, static_argnames=("num_iters", "precision",
                                             "boost_tol"))
def refine_inverse_guarded(dictionary, inverse_estimate,
                           num_iters: int = 5, residual_tol=1e-3,
                           precision=None, boost_tol=None):
  """`newton_refine_inverse` with a divergence guard.

  Newton-Schulz only converges when the incoming residual
  ``||I - D X|| < 1`` (in spectral norm); an extreme stepsize schedule
  or an ill-conditioned dictionary can break that, and a diverged
  inverse would corrupt training silently.  This variant checks
  ``max|D X - I|`` AFTER refinement (one extra (n, n) matmul) and falls
  back to the exact LU inverse when it exceeds ``residual_tol`` (a
  healthy refreshed estimate sits at fp level, ~1e-6).  The fallback is
  a ``lax.cond``, so the LU cost is only paid on the rare bad step.

  ``precision`` tiers the refinement matmuls (see
  newton_refine_inverse); the guard's residual matmul and the LU
  fallback ALWAYS run at parity precision, so callers must pass a
  ``residual_tol`` above the tier's residual floor or every step would
  take the fallback (the tiered runners in training/ica.py do).

  ``boost_tol`` enables residual-ADAPTIVE refinement: when the
  post-refinement residual exceeds it (ill-conditioned dictionaries
  raise the Newton-Schulz floor), two extra refinements run and the
  residual is recomputed -- so a small ``num_iters`` keeps the
  healthy-case speed while hard cases self-correct to the deeper
  refinement's accuracy instead of silently degrading (a NaN residual
  skips the boost and goes straight to the LU guard).
  """
  with matmul_precision():
    x = newton_refine_inverse(dictionary, inverse_estimate, num_iters,
                              precision=precision)
    eye = jnp.eye(dictionary.shape[0], dtype=x.dtype)
    resid = jnp.max(jnp.abs(dictionary @ x - eye))
    if boost_tol is not None:
      def boosted(args):
        xb = newton_refine_inverse(dictionary, args[0], 2,
                                   precision=precision)
        return xb, jnp.max(jnp.abs(dictionary @ xb - eye))

      x, resid = jax.lax.cond(resid > boost_tol, boosted,
                              lambda args: args, (x, resid))
    # NOT (resid < tol), not (resid > tol): a diverged estimate can
    # produce a NaN residual, and NaN must take the fallback branch
    return jax.lax.cond(jnp.logical_not(resid < residual_tol),
                        lambda: jnp.linalg.inv(dictionary),
                        lambda: x)


def run(images, dictionary, orthonormal=False):
  """Infer codes via the exact inverse of a square dictionary.

  Args:
    images: (b, n) batch of flattened images.
    dictionary: (n, n) square dictionary.
    orthonormal: if True use the transpose (exact inverse for orthonormal
      dictionaries, cheaper and numerically exact).

  Returns:
    (b, n) codes.
  """
  images = jnp.asarray(images, jnp.float32)
  dictionary = jnp.asarray(dictionary, jnp.float32)
  if orthonormal:
    return _solve_ortho(images, dictionary)
  return _solve_nonortho(images, dictionary)
