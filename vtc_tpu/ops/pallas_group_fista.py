"""Fused Pallas kernel for the subspace (group) ISTA/FISTA solver.

Same VMEM-resident design as ops/pallas_fista.py, applied to the packed
group formulation (see analysis_transforms/fully_connected/
subspace_ista_fista.py): state is the flattened grouped code tensor
(b, G*M), the gradient is one (tile, GM) x (GM, GM) MXU matmul against
the grouped-dictionary Gram, and the group-norm shrinkage is computed
with two skinny 0/1-matrix matmuls instead of an M-minor-axis reduction
(TPU lane layouts make reductions over a length-4 minor axis far worse
than an extra MXU pass):

    sums   = codes^2 @ E          E: (GM, G) one-hot group membership
    scale  = max(1 - t / sqrt(sums), 0)     per group
    codes *= scale @ E^T

The stepsize is folded into the iteration operator once per solve
(``z + z @ (-eta G) + eta c``, identity outside the matmul -- same
accumulation-order note as ops/pallas_train_step._make_kernel), saving
two full-width VPU multiplies per iteration.  Measured on-chip (256/64
groups-of-4, FISTA-25, b=2048): 0.867 -> 0.856 ms/solve.  Folding the
two membership matmuls into one (GM, GM) block-diagonal projection
``(codes^2) @ (E E^T)`` was also measured and is a ~4-7% REGRESSION
despite one fewer sequential MXU pass (the full-width per-slot
sqrt/div VPU pass costs more than the saved skinny matmul) -- do not
re-chase.

Zero-padded groups have zero E columns, so their norms are 0 and the
reference's divide-by-zero guard (norm==0 -> 1) keeps them at exactly 0
(their corr/gram rows are zero too, so the iterate never leaves 0
there).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vtc_tpu.ops.pallas_common import LANES as _LANES, round_up
from vtc_tpu.ops.precision import matmul_precision


def _make_kernel(variant, hard, mxu="highest"):
  use_fista = variant == "fista"
  # inference MXU tier for the iteration AND prox matmuls (same scheme
  # as ops/pallas_train_step): in 'bf16x3' the prox 3-pass collapses
  # to 2 against the exact-in-bf16 0/1 membership operand (see
  # _make_prox_dots -- squared-norm sums and the broadcast gather have
  # no cancellation, so the prox tier rides the iteration tier)
  from vtc_tpu.ops.pallas_train_step import (_make_iter_dot,
                                             _make_prox_dots)
  tier = {"default": "bf16"}.get(mxu, mxu)
  prep_gram, iter_dot = _make_iter_dot(tier)
  prox_dot, prox_dot_t = _make_prox_dots(tier)

  def kernel(niter_ref, scalars_ref, gram_ref, expand_ref, corr_ref,
             out_ref):
    num_iters = niter_ref[0]
    eta = scalars_ref[0]
    lam_eta = scalars_ref[1]
    gram = gram_ref[:]
    expand = expand_ref[:]  # (GMp, Gp) 0/1 membership
    corr = corr_ref[:]

    def prox(x):
      sums = prox_dot(x * x, expand)       # (tile, Gp) squared norms
      norms = jnp.sqrt(sums)
      safe = jnp.where(norms == 0.0, 1.0, norms)
      if hard:
        scale = jnp.where(norms < lam_eta, 0.0, 1.0)
      else:
        scale = jnp.maximum(1.0 - lam_eta / safe, 0.0)
      return x * prox_dot_t(scale, expand)   # scale @ expand.T

    neg_eta_gram = prep_gram(-eta * gram)
    corr_eta = eta * corr
    zeros = jnp.zeros(corr.shape, jnp.float32)

    def body(_, carry):
      z, old, t_k = carry
      codes = prox(z + iter_dot(z, neg_eta_gram) + corr_eta)
      if use_fista:
        t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t_k * t_k)) / 2.0
        beta = (t_k - 1.0) / t_next
        z_next = codes + beta * (codes - old)
        return z_next, codes, t_next
      return codes, codes, t_k

    _, codes, _ = jax.lax.fori_loop(
        0, num_iters, body, (zeros, zeros, jnp.float32(1.0)))
    out_ref[:] = codes

  return kernel


def membership_matrix(num_groups, max_group_size, valid_mask):
  """(GM, G) 0/1 matrix mapping flattened group slots to their group."""
  gm = num_groups * max_group_size
  e = np.zeros((gm, num_groups), np.float32)
  mask = np.asarray(valid_mask).reshape(-1)
  for flat in range(gm):
    if mask[flat] > 0:
      e[flat, flat // max_group_size] = 1.0
  return e


@functools.partial(
    jax.jit,
    static_argnames=("variant", "hard", "batch_tile", "interpret",
                     "mxu_precision"))
def group_fista_solve_pallas(images, grouped_dictionary, expand,
                             sparsity_weight, num_iters, stepsize, *,
                             variant="fista", hard=False, batch_tile=256,
                             interpret=False, mxu_precision="highest"):
  """Solve the packed group-LASSO codes with the fused kernel.

  Args:
    images: (b, n) float32.
    grouped_dictionary: (G*M, n) duplicated/padded grouped dictionary.
    expand: (G*M, G) 0/1 membership matrix (membership_matrix()).
    sparsity_weight, num_iters, stepsize: dynamic scalars.
    mxu_precision: 'highest' (parity default) | 'bf16x3' (3-pass
      iteration matmul, ~1e-4) | 'default' (single bf16 pass,
      screening grade; the prox matmuls drop too).

  Returns:
    (b, G*M) flattened grouped codes (caller scatters duplicates back
    to (b, s) with subspace_ista_fista.unpack_codes_summed).
  """
  b = images.shape[0]
  gm, g = expand.shape
  gm_pad = round_up(gm, _LANES)
  g_pad = round_up(g, _LANES)
  b_pad = round_up(b, batch_tile)

  with matmul_precision():
    gram = grouped_dictionary @ grouped_dictionary.T
    corr = images @ grouped_dictionary.T
  gram = jnp.pad(gram, ((0, gm_pad - gm), (0, gm_pad - gm)))
  corr = jnp.pad(corr, ((0, b_pad - b), (0, gm_pad - gm)))
  expand_p = jnp.pad(jnp.asarray(expand, jnp.float32),
                     ((0, gm_pad - gm), (0, g_pad - g)))

  eta = jnp.asarray(stepsize, jnp.float32)
  scalars = jnp.stack(
      [eta, jnp.asarray(sparsity_weight, jnp.float32) * eta])
  niter = jnp.asarray(num_iters, jnp.int32).reshape(1)

  kernel = _make_kernel(variant, hard, mxu=mxu_precision)
  out = pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=2,
          grid=(b_pad // batch_tile,),
          in_specs=[
              pl.BlockSpec((gm_pad, gm_pad), lambda i, *_: (0, 0)),
              pl.BlockSpec((gm_pad, g_pad), lambda i, *_: (0, 0)),
              pl.BlockSpec((batch_tile, gm_pad), lambda i, *_: (i, 0)),
          ],
          out_specs=pl.BlockSpec((batch_tile, gm_pad),
                                 lambda i, *_: (i, 0)),
      ),
      out_shape=jax.ShapeDtypeStruct((b_pad, gm_pad), jnp.float32),
      interpret=interpret,
  )(niter, scalars, gram, expand_p, corr)
  return out[:b, :gm]
