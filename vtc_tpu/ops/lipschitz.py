"""Lipschitz-constant (largest Gram eigenvalue) computation for the
constant-stepsize shrinkage solvers.

The reference computes ``symeig(D^T D)[-1]`` once per solver call
(reference: fully_connected/ista_fista.py:72-80, convolutional/
ista_fista.py:104-113).  On TPU we provide two interchangeable backends:

* ``eigvalsh``: exact, uses XLA's symmetric eigensolver.  Matches the
  reference's trajectory most closely; O(n^3) once per call.
* ``power``: power iteration on the Gram matrix -- a handful of MXU
  matvecs, much cheaper for large dictionaries, accurate to ~1e-6 of the
  top eigenvalue after the default 50 iterations (the Gram of a unit-norm
  dictionary has a large spectral gap in practice).

Both operate on whichever of ``D D^T`` (s x s) or ``D^T D`` (n x n) is
smaller, since the nonzero spectra coincide.
"""
import functools

import jax
import jax.numpy as jnp
from vtc_tpu.ops.precision import matmul_precision


def _smaller_gram(matrix):
  """Return G = M M^T or M^T M, whichever is smaller."""
  s, n = matrix.shape
  if s <= n:
    return matrix @ matrix.T
  return matrix.T @ matrix


def top_gram_eigenvalue_exact(matrix):
  """Largest eigenvalue of matrix @ matrix.T via eigvalsh (float32)."""
  with matmul_precision():
    gram = _smaller_gram(matrix)
    return jnp.linalg.eigvalsh(gram)[-1]


@functools.partial(jax.jit, static_argnames=("num_iters",))
def top_gram_eigenvalue_power(matrix, num_iters: int = 50, seed: int = 0):
  """Largest eigenvalue of matrix @ matrix.T via power iteration.

  Deterministic: the starting vector comes from a fixed PRNG key so that
  results are reproducible across calls and shardings.
  """
  with matmul_precision():
    gram = _smaller_gram(matrix)
    dim = gram.shape[0]
    v0 = jax.random.normal(jax.random.PRNGKey(seed), (dim,), gram.dtype)

    def body(_, v):
      w = gram @ v
      return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, num_iters, body, v0 / jnp.linalg.norm(v0))
    return v @ (gram @ v)


@functools.partial(jax.jit, static_argnames=("num_iters",))
def power_iterate(matrix, v, num_iters: int = 4):
  """Refine an eigenvector estimate of the Gram of ``matrix``.

  Warm-start support for training loops: the dictionary changes slowly
  between batches, so carrying the eigenvector through the scan and
  refreshing it with a handful of iterations per step gives the same
  stepsize as a cold 50-iteration solve at a fraction of the cost
  (trajectory equivalence tested in tests/test_fc_ista_fista.py).

  Returns (top_eigenvalue_estimate, refreshed_unit_eigenvector).
  """
  with matmul_precision():
    gram = _smaller_gram(matrix)

    def body(_, vec):
      w = gram @ vec
      return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, num_iters, body, v / jnp.linalg.norm(v))
    return v @ (gram @ v), v


@jax.jit
def top_gram_eigenpair(matrix):
  """Exact (top_eigenvalue, unit_eigenvector) of the Gram of ``matrix``
  via eigh on the smaller Gram.

  The intended warm-tracking seed: an exact eigenpair removes the
  cold-start transient entirely (a random-seeded power-50 start on a
  Marchenko-Pastur-edge spectrum can be ~1e-1 relative off for tens of
  steps), after which 2 refresh iterations per training step hold the
  estimate at ~1e-6 relative of per-step eigvalsh (measured, see
  BENCH_NOTES.md)."""
  with matmul_precision():
    gram = _smaller_gram(matrix)
    vals, vecs = jnp.linalg.eigh(gram)
    return vals[-1], vecs[:, -1]


def top_gram_eigenvalue(matrix, method: str = "eigvalsh"):
  """Dispatch on method in {'eigvalsh', 'power'}."""
  if method == "eigvalsh":
    return top_gram_eigenvalue_exact(matrix)
  if method == "power":
    return top_gram_eigenvalue_power(matrix)
  raise KeyError("Unrecognized lipschitz method: " + method)


def fista_stepsize(dictionary_2d, method: str = "eigvalsh"):
  """1 / L where L is the top eigenvalue of the dictionary Gram matrix.

  ``dictionary_2d`` is (s, n); convolutional callers pass the kernels
  flattened to (s, c*kh*kw) (reference: convolutional/ista_fista.py:104-105
  always uses the s x s Gram of flattened kernels -- we match that spectrum
  via whichever Gram is smaller, which is identical for the top eigenvalue).
  """
  return 1.0 / top_gram_eigenvalue(dictionary_2d, method)
