"""Generic ISTA / FISTA proximal-gradient engine as a ``lax.while_loop``.

This is the single solver core shared by the fully-connected, convolutional
and subspace analysis transforms.  It reproduces the iteration structure of
the reference solvers (vision_transform_codes/analysis_transforms/
fully_connected/ista_fista.py:100-146 and friends) in functional JAX form:

  state = (k, z, old_codes, codes, t_k, delta, stop)
  while k < num_iters and not stop:
      codes = prox(z - stepsize * grad(z))
      if fista:  t_{k+1} = (1+sqrt(1+4 t_k^2))/2 ; beta = (t_k-1)/t_{k+1}
                 z = codes + beta * (codes - old_codes)
      else:      z = codes
      if eps:    stop = mean(|codes - old_codes|) / stepsize < eps and k > 0
      old_codes = codes

Design notes (TPU):
* the trip count is data-dependent only when early stopping is enabled; a
  ``while_loop`` with the iteration bound folded into the predicate avoids
  recompilation when ``num_iters`` changes would otherwise unroll.
* ``grad`` is an arbitrary pytree-to-pytree callable, so the same loop
  drives matmul (fc), conv_general_dilated (conv), and packed-group
  (subspace) gradients.
* everything is jit-compatible; callers wrap this in ``jax.jit`` with the
  static flags (variant / threshold choice / eps-enabled) baked in.
"""
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class SolverState(NamedTuple):
  k: jnp.ndarray          # iteration counter, int32
  z: jnp.ndarray          # gradient evaluation point
  old_codes: jnp.ndarray  # codes from the previous iteration
  codes: jnp.ndarray      # current thresholded codes
  t_k: jnp.ndarray        # FISTA momentum scalar (unused for ISTA)
  stop: jnp.ndarray       # early-stop flag, bool


def proximal_gradient_loop(
    grad_fn: Callable,
    prox_fn: Callable,
    init_codes: jnp.ndarray,
    stepsize: jnp.ndarray,
    num_iters,
    *,
    variant: str = "fista",
    early_stopping_epsilon: Optional[float] = None,
    prestep_fn: Optional[Callable] = None,
    psum_axes=None,
) -> jnp.ndarray:
  """Run the ISTA/FISTA loop; returns the final codes.

  Args:
    grad_fn: codes-shaped -> codes-shaped, gradient of the smooth term.
    prox_fn: (codes, stepsize) -> codes, proximal operator of the penalty.
    init_codes: starting point (zeros or a warm start).
    stepsize: scalar 1/L.
    num_iters: maximum iterations (may be a traced int32 scalar; the loop
      is a while_loop so changing it does not retrigger compilation when
      passed as a device scalar).
    variant: 'ista' or 'fista' (static).
    early_stopping_epsilon: if not None (static decision), terminate when
      mean |delta codes| / stepsize < eps after the first iteration.
    prestep_fn: optional fused replacement for the gradient step: when
      given, the body computes ``prox(prestep_fn(z))`` instead of
      ``prox(z - stepsize * grad_fn(z))``.  Lets linear-operator callers
      fold the stepsize into the operator once per solve (e.g. the fc
      gram path's ``z @ (I - eta G) + eta c``), which removes two
      full-width elementwise passes per iteration; the early-stop delta
      semantics are unchanged.
    psum_axes: optional mesh axis name(s).  When set (static decision,
      caller must be inside a shard_map over those axes with EQUAL
      shard sizes), the early-stop test uses the batch-GLOBAL mean
      |delta| -- ``lax.pmean`` of the shard-local mean, one scalar
      all-reduce per iteration -- so data-parallel solves stop at
      exactly the reference's batch-global criterion
      (fc/ista_fista.py:135-144) and every shard exits the loop at the
      same iteration (the predicate value is identical across shards).
  """
  if variant not in ("ista", "fista"):
    raise ValueError("variant must be 'ista' or 'fista'")
  use_fista = variant == "fista"
  use_eps = early_stopping_epsilon is not None
  num_iters = jnp.asarray(num_iters, jnp.int32)

  def cond(state: SolverState):
    return jnp.logical_and(state.k < num_iters, jnp.logical_not(state.stop))

  def body(state: SolverState):
    if prestep_fn is not None:
      codes = prox_fn(prestep_fn(state.z), stepsize)
    else:
      codes = prox_fn(state.z - stepsize * grad_fn(state.z), stepsize)
    delta = codes - state.old_codes
    if use_fista:
      t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * state.t_k**2)) / 2.0
      beta = (state.t_k - 1.0) / t_next
      z = codes + beta * delta
    else:
      t_next = state.t_k
      z = codes
    if use_eps:
      avg_delta = jnp.mean(jnp.abs(delta))
      if psum_axes is not None:
        avg_delta = jax.lax.pmean(avg_delta, psum_axes)
      avg_delta = avg_delta / stepsize
      stop = jnp.logical_and(avg_delta < early_stopping_epsilon, state.k > 0)
    else:
      stop = state.stop
    return SolverState(state.k + 1, z, codes, codes, t_next, stop)

  init = SolverState(
      k=jnp.asarray(0, jnp.int32),
      z=init_codes,
      old_codes=init_codes,
      codes=init_codes,
      t_k=jnp.asarray(1.0, init_codes.dtype),
      stop=jnp.asarray(False),
  )
  final = jax.lax.while_loop(cond, body, init)
  return final.codes
