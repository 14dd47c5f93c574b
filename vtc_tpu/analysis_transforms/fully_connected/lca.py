"""Locally Competitive Algorithm (LCA) sparse inference, fully-connected.

The third classic solver family named alongside ISTA/FISTA in this
project's north star (BASELINE.json).  LCA [1] evolves membrane
potentials u under leaky-integrator dynamics with lateral inhibition and
reads codes out through a thresholder:

    a   = T_lambda(u)
    u'  = u + (1/tau) * (c - u - (G - I) a)
        with c = X D^T, G = D D^T

For the soft threshold, the fixed point of these dynamics is exactly the
LASSO optimum, so LCA/ISTA/FISTA agree at convergence (tested).  The
iteration shares the solver engine's shape: one (b,s)x(s,s) MXU matmul
per step with everything else fused elementwise, run under
``lax.while_loop`` with optional early stopping on the mean potential
change.

.. [1] Rozell, C.J., Johnson, D.H., Baraniuk, R.G., & Olshausen, B.A.
       (2008). Sparse coding via thresholding and local competition in
       neural circuits. Neural Computation, 20(10), 2526-2563.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from vtc_tpu.ops import lipschitz as lipschitz_ops
from vtc_tpu.ops import thresholds
from vtc_tpu.ops.precision import matmul_precision


@functools.partial(
    jax.jit,
    static_argnames=("nonnegative_only", "hard_threshold",
                     "early_stopping_epsilon"))
def _solve(images, dictionary, sparsity_weight, num_iters, eta,
           initial_potentials, nonnegative_only, hard_threshold,
           early_stopping_epsilon):
  threshold_fn = thresholds.select(nonnegative_only, hard_threshold)
  use_eps = early_stopping_epsilon is not None
  num_iters = jnp.asarray(num_iters, jnp.int32)

  with matmul_precision():
    gram = dictionary @ dictionary.T
    lateral = gram - jnp.eye(gram.shape[0], dtype=gram.dtype)
    drive = images @ dictionary.T

    def cond(state):
      k, _, stop = state
      return jnp.logical_and(k < num_iters, jnp.logical_not(stop))

    def body(state):
      k, u, stop = state
      a = threshold_fn(u, sparsity_weight)
      du = drive - u - a @ lateral
      u_next = u + eta * du
      if use_eps:
        stop = jnp.logical_and(
            jnp.mean(jnp.abs(u_next - u)) / eta < early_stopping_epsilon,
            k > 0)
      return k + 1, u_next, stop

    _, u, _ = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), initial_potentials,
         jnp.asarray(False)))
    return threshold_fn(u, sparsity_weight)


def run(images, dictionary, sparsity_weight, num_iters,
        time_constant=10.0, initial_potentials=None,
        early_stopping_epsilon=None, nonnegative_only=False,
        hard_threshold=False, *,
        stepsize: Optional[jnp.ndarray] = None,
        lipschitz_method: str = "eigvalsh"):
  """Infer sparse codes with LCA dynamics.

  Args:
    images: (b, n) float32 batch of flattened patches.
    dictionary: (s, n) float32, rows ~unit norm.
    sparsity_weight: threshold lambda (note: NOT scaled by the step, the
      LCA convention -- the fixed point matches LASSO with this lambda).
    num_iters: number of Euler steps of the dynamics.
    time_constant: tau; the Euler stepsize is 1/tau.  Stability needs
      1/tau below ~2/L of the lateral dynamics; pass ``stepsize`` to
      override with a Lipschitz-derived step (1/L, always stable).
    initial_potentials: optional (b, s) warm start for u.
    early_stopping_epsilon: stop when mean |du|/eta drops below this.
    nonnegative_only / hard_threshold: threshold variants ('hard' is the
      classic LCA thresholder, 'soft' gives the LASSO fixed point).
    stepsize: optional explicit Euler step (overrides time_constant).
    lipschitz_method: used only when stepsize=='auto'.

  Returns:
    (b, s) float32 codes a = T_lambda(u_final).
  """
  images = jnp.asarray(images, jnp.float32)
  dictionary = jnp.asarray(dictionary, jnp.float32)
  if stepsize == "auto":
    stepsize = lipschitz_ops.fista_stepsize(dictionary, lipschitz_method)
  eta = jnp.asarray(1.0 / time_constant if stepsize is None else stepsize,
                    jnp.float32)
  if initial_potentials is None:
    initial_potentials = jnp.zeros(
        (images.shape[0], dictionary.shape[0]), images.dtype)
  else:
    initial_potentials = jnp.asarray(initial_potentials, jnp.float32)
  return _solve(images, dictionary,
                jnp.asarray(sparsity_weight, jnp.float32),
                num_iters, eta, initial_potentials,
                bool(nonnegative_only), bool(hard_threshold),
                None if early_stopping_epsilon is None
                else float(early_stopping_epsilon))
