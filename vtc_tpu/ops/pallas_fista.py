"""Fused Pallas TPU kernel for the fully-connected ISTA/FISTA solver.

The entire iterative solve runs inside ONE kernel with all state resident
in VMEM -- the design the XLA path cannot express, because each
while_loop iteration's matmul output round-trips through HBM:

  precompute (XLA, once per solve):   G = D D^T   (s, s)
                                      c = X D^T   (b, s)
  kernel (per batch tile, VMEM-resident):
      loop k = 1..num_iters:
          codes = shrink(z - eta * (z G - c), lam * eta)
          fista: t' = (1+sqrt(1+4t^2))/2 ; z = codes + ((t-1)/t') (codes-old)
          old = codes

Grid: 1-d over batch tiles; G is broadcast to every tile (same block),
z / old / codes tiles live in VMEM scratch/registers across ALL
iterations.  ``num_iters`` arrives as a scalar-prefetch argument, so
schedule changes never recompile.  The matmul hits the MXU with float32
(``preferred_element_type``) by default; ``use_bf16=True`` casts the
operands to bfloat16 for ~3x MXU throughput at reduced (~1e-2) parity.

Used automatically by the fc solver on TPU via formulation='pallas'
(falls back to interpret mode off-TPU in tests).

Reference semantics mirrored: fully_connected/ista_fista.py:100-146,
including early stopping (``early_stopping_epsilon``): the loop becomes
an in-kernel ``lax.while_loop`` whose predicate tests the batch-global
mean |delta codes| / stepsize -- exact only when the whole batch lives
in ONE grid tile (the global mean would otherwise need a cross-tile
reduction every iteration, but tiles solve independently), so the
caller sizes the tile to the batch and falls back to the XLA path when
that exceeds VMEM (see ``early_stop_tile_fits``).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vtc_tpu.ops.pallas_common import LANES as _LANES, round_up
from vtc_tpu.ops.precision import matmul_precision

def _make_kernel(variant, nonneg, hard, use_bf16, mxu_precision,
                 early_eps=None):
  use_fista = variant == "fista"
  # MXU tiers unified with the segment kernel (ops/pallas_train_step
  # ._make_iter_dot): 'highest' pins full f32 explicitly (Mosaic's
  # default feeds the MXU bf16 operands even for f32 inputs -- observed
  # 1e-1 code error on v5e without this); 'bf16x3' hand-splits both
  # operands into bf16 hi+lo and sums the three significant products in
  # f32 (half the passes of HIGHEST at ~1e-5 relative); 'bf16' is the
  # single-pass screening tier.
  from vtc_tpu.ops.pallas_train_step import _make_iter_dot
  tier = "bf16" if use_bf16 else {"default": "bf16"}.get(
      mxu_precision, mxu_precision)
  prep_gram, iter_dot = _make_iter_dot(tier)

  def kernel(niter_ref, scalars_ref, gram_ref, corr_ref, init_ref,
             out_ref, gram_pin, gram_sem):
    num_iters = niter_ref[0]
    eta = scalars_ref[0]
    lam_eta = scalars_ref[1]
    inv_count = scalars_ref[2]  # 1 / (b * s), real (unpadded) sizes

    @pl.when(pl.program_id(0) == 0)
    def _():
      # the Gram is solve-constant: pin it once (tile-grid solves
      # otherwise re-fetch it per batch tile -- see
      # pallas_train_step._pin_hbm)
      from vtc_tpu.ops.pallas_train_step import _pin_hbm
      _pin_hbm(gram_ref, gram_pin, gram_sem)

    gram = gram_pin[:]
    corr = corr_ref[:]
    init = init_ref[:]

    def threshold(x):
      if hard:
        if nonneg:
          return jnp.where(x < lam_eta, 0.0, x)
        return jnp.where(jnp.abs(x) < lam_eta, 0.0, x)
      if nonneg:
        return jnp.maximum(x - lam_eta, 0.0)
      # soft shrink as x - clip(x): bitwise equal to the reference's
      # sign(x) * max(|x| - t, 0) with two fewer VPU passes
      return x - jnp.clip(x, -lam_eta, lam_eta)

    # fold eta into the iteration operator ONCE per solve: the gradient
    # step z - eta*(z G - corr) becomes z + z @ (-eta G) + eta corr,
    # saving two full-width VPU multiplies per iteration (the identity
    # term stays outside the matmul so the MXU accumulation order
    # matches the XLA gram path -- same note as the segment kernel).
    neg_eta_gram = prep_gram(-eta * gram)  # tier prep once, not per iter
    corr_eta = eta * corr

    def body(_, carry):
      z, old, t_k = carry
      codes = threshold(z + iter_dot(z, neg_eta_gram) + corr_eta)
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
      # reference stop rule (fully_connected/ista_fista.py:135-144 /
      # ops/solver.py): mean |codes - old_codes| / eta < eps after the
      # first iteration.  The mean uses the REAL element count (padded
      # rows/cols hold exact zeros through every iteration, so the
      # padded sum equals the real sum).
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


_EARLY_STOP_VMEM_BUDGET = 12 * 1024 * 1024


def early_stop_tile_fits(batch_size, code_size):
  """True when the whole batch fits one VMEM grid tile -- the exactness
  condition for the in-kernel early-stopping while_loop (the stop test
  is a batch-GLOBAL mean; independent tiles cannot share it)."""
  from vtc_tpu.ops.pallas_common import SUBLANES
  s_pad = round_up(code_size, _LANES)
  b_pad = round_up(batch_size, SUBLANES)
  # gram + (corr, init, out) tiles + ~2 loop transients
  return 4 * (s_pad * s_pad + 6 * b_pad * s_pad) <= (
      _EARLY_STOP_VMEM_BUDGET)


@functools.partial(
    jax.jit,
    static_argnames=("variant", "nonneg", "hard", "use_bf16",
                     "batch_tile", "interpret", "mxu_precision",
                     "early_stopping_epsilon"))
def fista_solve_pallas(images, dictionary, sparsity_weight, num_iters,
                       stepsize, *, initial_codes=None, variant="fista",
                       nonneg=False, hard=False, use_bf16=False,
                       batch_tile=256, interpret=False,
                       mxu_precision="highest",
                       early_stopping_epsilon=None):
  """Solve the LASSO codes for a batch with the fused Pallas kernel.

  Args:
    images: (b, n) float32.
    dictionary: (s, n) float32.
    sparsity_weight, num_iters, stepsize: dynamic scalars (num_iters may
      change between calls without recompiling).
    variant/nonneg/hard: static algorithm flags.
    use_bf16: cast matmul operands to bfloat16 (3x MXU, ~1e-1 parity).
    mxu_precision: 'highest' (full f32, parity grade) | 'bf16x3'
      (hand-split 3-pass f32 emulation, ~1e-5 accuracy at ~2x the
      matmul speed of 'highest') | 'default' (single bf16 MXU pass);
      ignored when use_bf16.
    batch_tile: rows of the batch each grid cell owns.
    interpret: run in interpreter mode (for CPU tests).

  Returns:
    (b, s) float32 codes.  ``initial_codes`` warm-starts the solve
    (both the gradient evaluation point and the momentum anchor, like
    the XLA path / reference fc/ista_fista.py:86-96).
  """
  b, n = images.shape
  s = dictionary.shape[0]
  s_pad = round_up(s, _LANES)
  if early_stopping_epsilon is not None:
    # the stop test is batch-global: the whole batch must be ONE tile
    # (callers check early_stop_tile_fits first)
    from vtc_tpu.ops.pallas_common import SUBLANES
    batch_tile = round_up(b, SUBLANES)
    assert early_stop_tile_fits(b, s), (
        "batch too large for single-tile early stopping; use the XLA "
        "path (ista_fista.run falls back automatically)")
  b_pad = round_up(b, batch_tile)

  with matmul_precision():
    gram = dictionary @ dictionary.T
    corr = images @ dictionary.T
  # zero-pad the code dimension: padded columns of G/c are zero, so the
  # padded code entries stay exactly 0 through every iteration
  gram = jnp.pad(gram, ((0, s_pad - s), (0, s_pad - s)))
  corr = jnp.pad(corr, ((0, b_pad - b), (0, s_pad - s)))
  if initial_codes is None:
    init = jnp.zeros((b_pad, s_pad), jnp.float32)
  else:
    init = jnp.pad(jnp.asarray(initial_codes, jnp.float32),
                   ((0, b_pad - b), (0, s_pad - s)))

  eta = jnp.asarray(stepsize, jnp.float32)
  scalars = jnp.stack([eta,
                       jnp.asarray(sparsity_weight, jnp.float32) * eta,
                       jnp.float32(1.0 / (b * s))])
  niter = jnp.asarray(num_iters, jnp.int32).reshape(1)

  kernel = _make_kernel(variant, nonneg, hard, use_bf16, mxu_precision,
                        early_eps=(None
                                   if early_stopping_epsilon is None
                                   else float(early_stopping_epsilon)))
  grid = (b_pad // batch_tile,)
  out = pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=2,
          grid=grid,
          in_specs=[
              pl.BlockSpec(memory_space=pl.ANY),  # gram: pinned
              pl.BlockSpec((batch_tile, s_pad), lambda i, *_: (i, 0)),
              pl.BlockSpec((batch_tile, s_pad), lambda i, *_: (i, 0)),
          ],
          out_specs=pl.BlockSpec((batch_tile, s_pad), lambda i, *_: (i, 0)),
          scratch_shapes=[pltpu.VMEM((s_pad, s_pad), jnp.float32),
                          pltpu.SemaphoreType.DMA(())],
      ),
      out_shape=jax.ShapeDtypeStruct((b_pad, s_pad), jnp.float32),
      interpret=interpret,
      cost_estimate=pl.CostEstimate(
          flops=2 * b_pad * s_pad * s_pad * 100,
          bytes_accessed=(s_pad * s_pad + 3 * b_pad * s_pad) * 4,
          transcendentals=0),
  )(niter, scalars, gram, corr, init)
  return out[:b, :s]
