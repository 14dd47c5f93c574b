"""Fused Pallas kernel for the subspace (group) ISTA/FISTA solver.

Same VMEM-resident design as ops/pallas_fista.py, applied to the packed
group formulation (see analysis_transforms/fully_connected/
subspace_ista_fista.py): state is the flattened grouped code tensor
(b, G*M), the gradient is one (tile, GM) x (GM, GM) MXU matmul against
the grouped-dictionary Gram, and the group-norm shrinkage runs as the
lane-rotate segmented prox when the packed window M is a power of two
(pallas_train_step._make_group_prox / roll_prox_window -- exact f32
rotate+add rounds, zero MXU passes; BENCH_NOTES UPDATE 40), else as
two skinny 0/1-matrix matmuls instead of an M-minor-axis reduction
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

Warm starts ride in as a packed (b, G*M) init block, and early stopping
(reference subspace_ista_fista.py:158-180 semantics via ops/solver.py)
runs in-kernel as a lax.while_loop on the batch-global mean
|delta|/stepsize when the whole batch fits one VMEM tile
(``group_early_stop_tile_fits``; the caller falls back to the XLA gram
path otherwise) -- the same design as ops/pallas_fista.py.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vtc_tpu.ops.pallas_common import LANES as _LANES, round_up
from vtc_tpu.ops.precision import matmul_precision


def _make_kernel(variant, hard, mxu="highest", early_eps=None,
                 roll_m=None):
  use_fista = variant == "fista"
  # inference MXU tier for the iteration AND prox matmuls (same scheme
  # as ops/pallas_train_step): in 'bf16x3' the prox 3-pass collapses
  # to 2 against the exact-in-bf16 0/1 membership operand (see
  # _make_prox_dots -- squared-norm sums and the broadcast gather have
  # no cancellation, so the prox tier rides the iteration tier).
  # With roll_m (power-of-2 packed window) the prox runs as lane
  # rotations instead -- _make_group_prox.
  from vtc_tpu.ops.pallas_train_step import (_make_group_prox,
                                             _make_iter_dot)
  tier = {"default": "bf16"}.get(mxu, mxu)
  prep_gram, iter_dot = _make_iter_dot(tier)
  bind_prox = _make_group_prox(tier, hard, roll_m)

  def kernel(niter_ref, scalars_ref, gram_ref, expand_ref, corr_ref,
             init_ref, out_ref, gram_pin, expand_pin, pin_sems):
    num_iters = niter_ref[0]
    eta = scalars_ref[0]
    lam_eta = scalars_ref[1]
    inv_count = scalars_ref[2]  # 1 / (b * G * M), real (unpadded) sizes

    @pl.when(pl.program_id(0) == 0)
    def _():
      # solve-constant operands pinned once (tile-grid solves
      # otherwise re-fetch them per batch tile -- _pin_hbm)
      from vtc_tpu.ops.pallas_train_step import _pin_hbm
      _pin_hbm(gram_ref, gram_pin, pin_sems.at[0])
      if roll_m is None:
        _pin_hbm(expand_ref, expand_pin, pin_sems.at[1])

    gram = gram_pin[:]
    expand = expand_pin[:] if roll_m is None else None
    corr = corr_ref[:]
    init = init_ref[:]
    prox = bind_prox(expand, lam_eta, corr.shape)

    neg_eta_gram = prep_gram(-eta * gram)
    corr_eta = eta * corr

    def body(_, carry):
      z, old, t_k = carry
      codes = prox(z + iter_dot(z, neg_eta_gram) + corr_eta)
      if use_fista:
        t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t_k * t_k)) / 2.0
        beta = (t_k - 1.0) / t_next
        z_next = codes + beta * (codes - old)
        return z_next, codes, t_next
      return codes, codes, t_k

    if early_eps is None:
      _, codes, _ = jax.lax.fori_loop(
          0, num_iters, body, (init, init, jnp.float32(1.0)))
    else:
      # reference stop rule on the GROUPED tensor (the gram path's
      # ops/solver.py semantics): mean |codes - old_codes| / eta < eps
      # after the first iteration.  The mean uses the REAL element
      # count b*G*M (slots padded up to GMp hold exact zeros through
      # every iteration, so the padded sum equals the real sum; the
      # zero-slots *inside* groups are part of G*M and counted, exactly
      # as the gram path's jnp.mean over the (b, G, M) tensor).
      def stop_cond(carry):
        k, _, _, _, _, stop = carry
        return jnp.logical_and(k < num_iters, jnp.logical_not(stop))

      def stop_body(carry):
        k, z, old, _, t_k, _ = carry
        z_next, codes, t_next = body(None, (z, old, t_k))
        avg_delta = (jnp.sum(jnp.abs(codes - old)) * inv_count) / eta
        stop = jnp.logical_and(avg_delta < early_eps, k > 0)
        return k + 1, z_next, codes, codes, t_next, stop

      _, _, _, codes, _, _ = jax.lax.while_loop(
          stop_cond, stop_body,
          (jnp.int32(0), init, init, init, jnp.float32(1.0),
           jnp.bool_(False)))
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


_EARLY_STOP_VMEM_BUDGET = 12 * 1024 * 1024


def group_early_stop_tile_fits(batch_size, gm, g):
  """True when the whole batch fits one VMEM grid tile -- the exactness
  condition for the in-kernel early-stopping while_loop (the stop test
  is a batch-GLOBAL mean; independent tiles cannot share it)."""
  from vtc_tpu.ops.pallas_common import SUBLANES
  gm_pad = round_up(gm, _LANES)
  g_pad = round_up(g, _LANES)
  b_pad = round_up(batch_size, SUBLANES)
  # gram + expand + (corr, init, out) tiles + ~3 loop transients
  return 4 * (gm_pad * gm_pad + gm_pad * g_pad
              + 6 * b_pad * gm_pad) <= _EARLY_STOP_VMEM_BUDGET


@functools.partial(
    jax.jit,
    static_argnames=("variant", "hard", "batch_tile", "interpret",
                     "mxu_precision", "early_stopping_epsilon",
                     "roll_window"))
def group_fista_solve_pallas(images, grouped_dictionary, expand,
                             sparsity_weight, num_iters, stepsize, *,
                             initial_grouped=None, variant="fista",
                             hard=False, batch_tile=256,
                             interpret=False, mxu_precision="highest",
                             early_stopping_epsilon=None,
                             roll_window=None):
  """Solve the packed group-LASSO codes with the fused kernel.

  Args:
    images: (b, n) float32.
    grouped_dictionary: (G*M, n) duplicated/padded grouped dictionary.
    expand: (G*M, G) 0/1 membership matrix (membership_matrix()).
    sparsity_weight, num_iters, stepsize: dynamic scalars.
    initial_grouped: optional (b, G*M) flattened grouped warm start
      (both the gradient evaluation point and the momentum anchor,
      like the gram path).
    mxu_precision: 'highest' (parity default) | 'bf16x3' (3-pass
      iteration matmul, ~1e-4) | 'default' (single bf16 pass,
      screening grade; the prox matmuls drop too).
    early_stopping_epsilon: optional static float; the solve becomes an
      in-kernel while_loop stopping when the batch-global
      mean |delta| / stepsize over the (b, G, M) tensor drops below it
      (reference stop rule).  Requires the whole batch in ONE tile
      (callers check group_early_stop_tile_fits first).
    roll_window: static; pass pallas_train_step.roll_prox_window(...)
      when the packed layout is the standard contiguous one -- the
      group prox then runs as lane rotations, no membership matmuls.

  Returns:
    (b, G*M) flattened grouped codes (caller scatters duplicates back
    to (b, s) with subspace_ista_fista.unpack_codes_summed).
  """
  b = images.shape[0]
  gm, g = expand.shape
  gm_pad = round_up(gm, _LANES)
  g_pad = round_up(g, _LANES)
  if early_stopping_epsilon is not None:
    # the stop test is batch-global: the whole batch must be ONE tile
    from vtc_tpu.ops.pallas_common import SUBLANES
    batch_tile = round_up(b, SUBLANES)
    assert group_early_stop_tile_fits(b, gm, g), (
        "batch too large for single-tile early stopping; use the gram "
        "path (subspace_ista_fista.run falls back automatically)")
  b_pad = round_up(b, batch_tile)

  with matmul_precision():
    gram = grouped_dictionary @ grouped_dictionary.T
    corr = images @ grouped_dictionary.T
  gram = jnp.pad(gram, ((0, gm_pad - gm), (0, gm_pad - gm)))
  corr = jnp.pad(corr, ((0, b_pad - b), (0, gm_pad - gm)))
  expand_p = jnp.pad(jnp.asarray(expand, jnp.float32),
                     ((0, gm_pad - gm), (0, g_pad - g)))
  if initial_grouped is None:
    init = jnp.zeros((b_pad, gm_pad), jnp.float32)
  else:
    init = jnp.pad(jnp.asarray(initial_grouped, jnp.float32),
                   ((0, b_pad - b), (0, gm_pad - gm)))

  eta = jnp.asarray(stepsize, jnp.float32)
  scalars = jnp.stack(
      [eta, jnp.asarray(sparsity_weight, jnp.float32) * eta,
       jnp.float32(1.0 / (b * gm))])
  niter = jnp.asarray(num_iters, jnp.int32).reshape(1)

  kernel = _make_kernel(variant, hard, mxu=mxu_precision,
                        early_eps=(None
                                   if early_stopping_epsilon is None
                                   else float(early_stopping_epsilon)),
                        roll_m=roll_window)
  out = pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=2,
          grid=(b_pad // batch_tile,),
          in_specs=[
              pl.BlockSpec(memory_space=pl.ANY),  # gram: pinned
              pl.BlockSpec(memory_space=pl.ANY),  # expand: pinned
              pl.BlockSpec((batch_tile, gm_pad), lambda i, *_: (i, 0)),
              pl.BlockSpec((batch_tile, gm_pad), lambda i, *_: (i, 0)),
          ],
          out_specs=pl.BlockSpec((batch_tile, gm_pad),
                                 lambda i, *_: (i, 0)),
          scratch_shapes=[
              pltpu.VMEM((gm_pad, gm_pad), jnp.float32),
              pltpu.VMEM((gm_pad, g_pad), jnp.float32),
              pltpu.SemaphoreType.DMA((2,))],
      ),
      out_shape=jax.ShapeDtypeStruct((b_pad, gm_pad), jnp.float32),
      interpret=interpret,
  )(niter, scalars, gram, expand_p, corr, init)
  return out[:b, :gm]
