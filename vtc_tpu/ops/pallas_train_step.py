"""Whole training segments as ONE fused Pallas TPU kernel.

The scanned trainer's hot loop is `power-refresh -> FISTA solve ->
Hessian EMA -> dictionary update -> renormalize` per batch.  The XLA
path expresses that as a lax.scan of separate ops, so the dictionary,
Gram matrix and codes round-trip HBM at every op boundary of every
step.  This kernel instead runs the ENTIRE segment on-core:

  grid = (num_steps,)   -- TPU grid cells execute sequentially, so the
                           dictionary / Hessian diagonal / Lipschitz
                           eigenvector live in VMEM-resident output
                           blocks that carry across steps; batches
                           stream HBM->VMEM with automatic double
                           buffering.
  per grid step (all HIGHEST-precision MXU matmuls, state in VMEM):
      G    = D D^T                       (gram, reused by power + FISTA)
      v    = power^k(G, v); eta = 1/(v^T G v)      (warm Lipschitz)
      c    = X D^T
      FISTA: z <- shrink(z - eta (z G - c), lam eta), momentum,
             inf_num_iters times (dynamic via scalar prefetch)
      h    = 0.99 h + mean(codes^2)/100            (cheap-quad EMA)
      D    = renorm(D - eta_d (codes^T (codes D - X)/b) / (h + eps)),
             upd_num_iters times

Semantics are identical (same float32 contract) to the composition
`lipschitz.power_iterate` + `training.sparse_coding.build_raw_step_fn`
with the 'gram' formulation -- the trajectory equivalence is tested in
tests/test_pallas_train_step.py and the reference parity of each piece
is covered by the existing oracle tests (reference semantics:
fully_connected/ista_fista.py:100-146, sc_steepest_descent.py:37-43,
sc_cheap_quadratic_descent.py:44-49, training/sparse_coding.py:154).

Restrictions (callers fall back to the scan-of-ops path otherwise):
fully-connected mode, no group sparsity, no early stopping (see
`fused_segment_supported`).  Batches beyond one VMEM tile run the
batch-tiled variant (grid (step, tile)) with gram-form gradient
accumulation, which supports any `upd_num_iters`.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vtc_tpu.ops.pallas_common import (LANES as _LANES,
                                       SUBLANES as _SUBLANES, round_up)

_VMEM_BUDGET_BYTES = 12 * 1024 * 1024

_HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
  """a @ b."""
  return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_HI)


def _dot_t(a, b):
  """a @ b.T (contract the lane dims)."""
  return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_HI)


def _tdot(a, b):
  """a.T @ b (contract the sublane dims)."""
  return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=_HI)


# single-pass bf16 MXU variants (f32 accumulate) for the opt-in
# training-speed tiers (mxu='bf16'): 1 MXU pass instead of HIGHEST's 6.
# NOT parity grade (~1e-1 relative code error per solve; see
# BENCH_NOTES precision-tier table) -- dictionary learning is
# stochastic, so training tolerates it, but the default stays 'highest'.
def _bf16(x):
  return x.astype(jnp.bfloat16)


def _dot_b(a, b):
  return jax.lax.dot_general(_bf16(a), _bf16(b), (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)


def _dot_t_b(a, b):
  return jax.lax.dot_general(_bf16(a), _bf16(b), (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)


# NOTE: deliberately no _tdot_b: every (0,0)-contraction in these
# kernels feeds the gram-form C/B statistics or the update gradient,
# which MUST stay HIGHEST in every tier (catastrophic cancellation /
# converged-residual noise -- BENCH_NOTES UPDATE 20).


def _split_hi_lo(x):
  """bf16 hi + lo split: hi + lo reconstructs x to ~16 significand
  bits (the bf16x3 emulation operand form; ops/pallas_fista.py)."""
  hi = x.astype(jnp.bfloat16)
  lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
  return hi, lo


def _split3(x):
  """EXACT 3-term bf16 split of f32: hi + mid + lo == x bitwise.

  Each residual subtraction is exact in f32 (the remainder after
  peeling a rounded bf16 prefix drops >= 8 exponent steps), so the
  three bf16 terms carry 8+8+8 >= 24 significand bits -- the full f32
  significand.  Against a second operand that is itself exact in bf16
  (0/1 membership / selection matrices), three single-pass MXU matmuls
  of the split terms compute the f32 matmul with only the usual f32
  accumulation rounding, i.e. parity-grade in HALF of XLA HIGHEST's 6
  passes (BENCH_NOTES UPDATE 28)."""
  hi = x.astype(jnp.bfloat16)
  r = x - hi.astype(jnp.float32)
  mid = r.astype(jnp.bfloat16)
  lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
  return hi, mid, lo


def _make_iter_dot(mxu):
  """(prep(gram) -> operand, iter_dot(z, operand)) for the FISTA
  iteration matmul at the requested MXU tier:
    'highest': full f32 (6 bf16 passes) -- the 1e-4 parity default.
    'bf16x5':  exact 3-term split both operands, 5 passes (drop only
               mid*mid) -- ~1.3e-4 codes, just outside the strict
               parity bar (BENCH_NOTES UPDATE 29).
    'bf16x3':  hand-split 3-pass emulation, ~1e-4 code accuracy --
               training trajectories track f32 (the recommended speed
               tier; the dropped lo*lo product is below bf16
               representation error, BENCH_NOTES precision table).
    'bf16':    single pass, ~1e-1 code accuracy -- screening grade
               (measured to bias strongly-converged training: denser
               codes, higher final loss; see BENCH_NOTES UPDATE 20)."""
  if mxu == "bf16":
    return _bf16, _dot_b
  if mxu == "bf16x3":
    def iter_dot(z, g):
      g_hi, g_lo = g
      z_hi, z_lo = _split_hi_lo(z)
      return (_dot_b(z_hi, g_hi) + _dot_b(z_lo, g_hi)
              + _dot_b(z_hi, g_lo))

    return _split_hi_lo, iter_dot
  if mxu == "bf16x5":
    # EXACT 3-term split of BOTH operands (24 significand bits each,
    # _split3), keeping the 5 largest of the 9 cross products -- the
    # only dropped term of consequence is mid*mid (~2^-18 relative,
    # ~60x under the 1e-4 parity bar per product; the remaining
    # dropped terms are <= 2^-26).  5 MXU passes vs HIGHEST's 6 with
    # near-f32 accuracy (BENCH_NOTES UPDATE 29).
    def iter_dot(z, g):
      g_hi, g_mid, g_lo = g
      z_hi, z_mid, z_lo = _split3(z)
      return (_dot_b(z_hi, g_hi)
              + _dot_b(z_mid, g_hi) + _dot_b(z_hi, g_mid)
              + _dot_b(z_lo, g_hi) + _dot_b(z_hi, g_lo))

    return _split3, iter_dot
  assert mxu == "highest", mxu  # no silent fall-through on typos
  return (lambda g: g), _dot


def _make_prox_dots(mxu):
  """(pdot(x, e), pdot_t(x, e)) for the group-prox matmuls against the
  CONSTANT 0/1 membership operand ``e`` at the requested tier.  pdot
  contracts (1, 0) (squared-norm sums x^2 @ E), pdot_t contracts
  (1, 1) (broadcast scale @ E^T).  The 0/1 operand is EXACT in bf16,
  so every tier runs hand-split single-pass matmuls: 'bf16x3' keeps a
  2-term split (~16 bits, matching its iteration tier), and 'highest'
  uses the EXACT 3-term split (_split3) -- each cross product is exact
  against the 0/1 operand, so the sum matches a true f32 matmul up to
  accumulation-order rounding (tests pin rtol=1e-6), at 3 MXU passes
  instead of XLA HIGHEST's 6 (BENCH_NOTES UPDATE 28).
  Tiering these is numerically safe: the norm matmul sums squares (no
  cancellation) and the broadcast matmul copies one scale per slot
  (products against exact 0/1)."""
  if mxu == "bf16":
    return _dot_b, _dot_t_b
  if mxu == "bf16x3":
    def pdot(x, e):
      x_hi, x_lo = _split_hi_lo(x)
      return _dot_b(x_hi, e) + _dot_b(x_lo, e)

    def pdot_t(x, e):
      x_hi, x_lo = _split_hi_lo(x)
      return _dot_t_b(x_hi, e) + _dot_t_b(x_lo, e)

    return pdot, pdot_t
  assert mxu in ("highest", "bf16x5"), mxu

  def pdot_hi(x, e):
    x_hi, x_mid, x_lo = _split3(x)
    return _dot_b(x_hi, e) + _dot_b(x_mid, e) + _dot_b(x_lo, e)

  def pdot_t_hi(x, e):
    x_hi, x_mid, x_lo = _split3(x)
    return _dot_t_b(x_hi, e) + _dot_t_b(x_mid, e) + _dot_t_b(x_lo, e)

  return pdot_hi, pdot_t_hi


def _pin_hbm(src_ref, dst_ref, sem):
  """One-time DMA of a segment-constant operand from HBM into VMEM.

  Mosaic's automatic pipeline re-fetches EVERY input block at EVERY
  grid cell, even when its index map is constant -- measured at
  ~10.6 us per MB per cell on this runtime (BENCH_NOTES UPDATE 42).
  Segment-constant operands (initial dictionary, group selection /
  membership matrices, co-membership counts) therefore enter with
  ``pl.BlockSpec(memory_space=pl.ANY)`` -- no per-cell auto-copy --
  and the kernel pins them into a VMEM scratch (or a carry output
  block) exactly once at grid step 0 with this helper."""
  dma = pltpu.make_async_copy(src_ref, dst_ref, sem)
  dma.start()
  dma.wait()


def roll_prox_window(group_assignments):
  """Packed-slot window M for the lane-rotate group prox, or None.

  The packed grouped layout puts group g in slots [g*M, (g+1)*M)
  (M = max group size, short groups zero-padded -- reference
  subspace_ista_fista.py:94-100), so the group-norm reduction is a
  segmented sum over M-aligned lane windows.  When M is a power of two
  that sum (and the per-group scale broadcast back to the slots) runs
  as log2(M) lane-rotate+add rounds each -- exact f32 adds, ZERO MXU
  passes -- instead of the two 3-pass-split membership matmuls
  (BENCH_NOTES UPDATE 40).  Non-power-of-2 windows keep the matmul
  path (a power-of-2 rotate tree would sum across group boundaries).
  VTC_DISABLE_ROLL_PROX=1 forces the matmul path (A/B measurement
  escape hatch; checked at trace time only)."""
  import os
  if os.environ.get("VTC_DISABLE_ROLL_PROX"):
    return None
  m = max(len(g) for g in group_assignments)
  return m if (m & (m - 1)) == 0 else None


def _make_group_prox(mxu, hard, roll_m=None):
  """bind(expand, lam_eta, shape) -> prox(x): the group-norm shrinkage
  operator (reference subspace_ista_fista.py:149-156, zero-norm guard
  included) on the packed (rows, GM_pad) code block.

  With ``roll_m`` set (see roll_prox_window) the squared-norm segmented
  sum runs as log2(M) rotate-left+add rounds (the group's sum lands on
  its start lane) and the scale broadcast as log2(M) rotate-right+add
  rounds of the start-masked scale -- both exact f32 VPU work replacing
  6 half-width MXU passes per iteration at HIGHEST.  Padded lanes
  (>= gm) see garbage window sums, but their iterates are exact zeros
  (zero gram columns / corr), so x * scale keeps them zero.  The matmul
  path otherwise (``expand`` is the (GM_pad, G_pad) 0/1 membership
  operand, _make_prox_dots tiers).

  Call bind ONCE before the solver loop: the roll path builds its
  loop-invariant group-start lane mask there."""
  if roll_m is not None:
    shifts = []
    sh = 1
    while sh < roll_m:
      shifts.append(sh)
      sh *= 2

    def bind(expand, lam_eta, shape):
      del expand
      width = shape[-1]
      lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
      is_start = (lane & (roll_m - 1)) == 0

      def prox(x):
        s = x * x
        for sh_ in shifts:  # rotate-left: window sum onto start lanes
          s = s + pltpu.roll(s, width - sh_, 1)
        if hard:
          scale = jnp.where(jnp.sqrt(s) < lam_eta, 0.0, 1.0)
        else:
          # soft path trimmed to 4 VPU ops: max() replaces the
          # reference's norm==0 guard (any finite scale works at a
          # zero-norm group -- x is 0 there -- but inf/NaN must not
          # arise), rsqrt replaces sqrt+divide (ulp-level vs the
          # composed form), and non-start lanes skip the pre-select:
          # their garbage window sums produce a finite garbage scale
          # that the start-mask select below REPLACES (no arithmetic
          # touches it).
          scale = jnp.maximum(
              1.0 - lam_eta * jax.lax.rsqrt(jnp.maximum(s, 1e-30)),
              0.0)
        scale = jnp.where(is_start, scale, 0.0)
        for sh_ in shifts:  # rotate-right: start scale to all M slots
          scale = scale + pltpu.roll(scale, sh_, 1)
        return x * scale

      return prox

    return bind

  prox_dot, prox_dot_t = _make_prox_dots(mxu)

  def bind(expand, lam_eta, shape):
    del shape

    def prox(x):
      sums = prox_dot(x * x, expand)
      norms = jnp.sqrt(sums)
      safe = jnp.where(norms == 0.0, 1.0, norms)
      if hard:
        scale = jnp.where(norms < lam_eta, 0.0, 1.0)
      else:
        scale = jnp.maximum(1.0 - lam_eta / safe, 0.0)
      return x * prox_dot_t(scale, expand)

    return prox

  return bind


def _vmem_bytes(b_pad, s_pad, n_pad, use_n_gram, multi_tile=False):
  # NOTE on the pinned operands (_pin_hbm): the d pin landing adds one
  # s x n buffer, but the pl.ANY input it replaces was DOUBLE-buffered
  # by the pipeline (2x, never counted here) -- net VMEM went DOWN, so
  # the historical 2x dictionary accounting stays conservative.
  buffers = (
      2 * s_pad * n_pad        # dictionary in + out (pin: see NOTE)
      + s_pad * s_pad          # gram
      + (n_pad * n_pad if use_n_gram else 0)
      + 2 * b_pad * n_pad      # X double buffer
      + 4 * b_pad * s_pad      # corr, z, old, codes
      + b_pad * s_pad          # codes out block
      + b_pad * n_pad)         # update residual
  if multi_tile:
    buffers += s_pad * n_pad + s_pad * s_pad  # B and C gram accumulators
  return 4 * buffers


def _pick_batch_tile(b, s, n):
  """Smallest tile count whose per-tile working set fits, with the tile
  sized to the batch (minimal zero-row padding: the batch pads to
  num_tiles * tile <= b + num_tiles * 8)."""
  s_pad = round_up(s, _LANES)
  n_pad = round_up(n, _LANES)
  b_pad = round_up(b, _SUBLANES)
  if _vmem_bytes(b_pad, s_pad, n_pad, s > n) <= _VMEM_BUDGET_BYTES:
    return b_pad  # whole batch in one tile
  # tiles of ~<=512 rows measure fastest (better DMA/compute overlap
  # than maximal tiles: 4x512 beat 2x1024 by ~4% at b=2048), so start
  # from the smallest tile count that gets there and shrink further
  # only if VMEM demands it
  num_tiles = max(2, -(-b // 512))
  while True:
    tile = round_up(-(-b // num_tiles), _SUBLANES)
    if _vmem_bytes(tile, s_pad, n_pad, s > n,
                   multi_tile=True) <= _VMEM_BUDGET_BYTES:
      return tile
    if tile <= _SUBLANES:
      return None  # fixed (dictionary/gram) buffers alone do not fit
    num_tiles += 1


def fused_segment_supported(mode, inference_alg, update_alg, *,
                            group_assignments=None, nonneg=False,
                            hard_threshold=False, batch_size=None,
                            code_size=None, input_size=None,
                            upd_num_iters=1,
                            early_stopping_epsilon=None):
  """True when `fused_train_segment_pallas` covers this configuration.
  In-kernel early stopping (``early_stopping_epsilon``) additionally
  needs the whole batch in ONE VMEM tile (the stop test is a
  batch-global mean; independent tiles cannot share it)."""
  del nonneg, hard_threshold  # both supported
  if mode != "fully-connected" or group_assignments is not None:
    return False
  if inference_alg not in ("ista", "fista"):
    return False
  if update_alg not in ("sc_steepest_descent",
                        "sc_cheap_quadratic_descent"):
    return False
  if None in (batch_size, code_size, input_size):
    return True  # shape-independent eligibility
  del upd_num_iters  # gram-form accumulation supports any count
  tile = _pick_batch_tile(batch_size, code_size, input_size)
  if tile is None:
    return False
  if early_stopping_epsilon is not None:
    return tile >= round_up(batch_size, _SUBLANES)
  return True


def _make_kernel(variant, nonneg, hard, uses_hessian, renormalize,
                 upd_num_iters, power_iters, use_n_gram,
                 lowest_code_val, mxu="highest", early_eps=None):
  use_fista = variant == "fista"
  # training-speed tiers (see _make_iter_dot): ONLY the FISTA iteration
  # matmuls (+ corr, in the 'bf16' tier) drop precision.  The Gram
  # build / power refresh stay HIGHEST (eta accuracy guards FISTA
  # stability) and so do the UPDATE matmuls: as training converges the
  # residual codes @ D - X shrinks below the bf16 absolute error of
  # the codes @ D product, so a low-precision update gradient becomes
  # pure noise exactly when training is going well (measured on-chip:
  # 2000 structured-data steps diverged from LASSO 2.17 to 283).  The
  # update is 2 of ~28 matmuls per step -- keeping it full precision
  # costs little.
  prep_gram, iter_dot = _make_iter_dot(mxu)
  dot_t_ = _dot_t_b if mxu == "bf16" else _dot_t

  def kernel(niter_ref, scalars_ref, d_ref, h_ref, v_ref, x_ref,
             d_out, h_out, v_out, codes_out, d_pin, d_sem):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
      # d rides pl.ANY (segment-constant; see _pin_hbm) -- one DMA
      # into VMEM scratch (the distributed-interpret mode cannot
      # target pipelined output refs), then one VPU copy into the
      # carry output block
      _pin_hbm(d_ref, d_pin, d_sem)
      d_out[:] = d_pin[:]
      h_out[:] = h_ref[:]
      v_out[:] = v_ref[:]

    num_iters = niter_ref[0]
    sw = scalars_ref[0]
    upd_step = scalars_ref[1]
    inv_b = scalars_ref[2]

    dictionary = d_out[:]
    images = x_ref[0]
    gram = _dot_t(dictionary, dictionary)           # (s_pad, s_pad)
    # power iteration runs on the smaller Gram (lipschitz.power_iterate
    # semantics); the nonzero spectra coincide so eta is the same
    power_gram = _tdot(dictionary, dictionary) if use_n_gram else gram

    v = v_out[:]
    v = v / jnp.sqrt(jnp.sum(v * v))

    def power_body(_, vec):
      w = _dot(vec, power_gram)
      return w / jnp.sqrt(jnp.sum(w * w))

    v = jax.lax.fori_loop(0, power_iters, power_body, v)
    v_out[:] = v
    eigval = jnp.sum(_dot(v, power_gram) * v)
    eta = 1.0 / eigval
    lam_eta = sw * eta

    corr = dot_t_(images, dictionary)               # (b_pad, s_pad)

    def threshold(x):
      if hard:
        if nonneg:
          return jnp.where(x < lam_eta, 0.0, x)
        return jnp.where(jnp.abs(x) < lam_eta, 0.0, x)
      if nonneg:
        return jnp.maximum(x - lam_eta, 0.0)
      # soft shrink as x - clip(x): one min/max pair fewer VPU passes
      # than sign(x)*max(|x|-t, 0)
      return x - jnp.clip(x, -lam_eta, lam_eta)

    # fold eta into the iteration operator ONCE: the gradient step
    # z - eta*(z G - corr) becomes z + z @ (-eta G) + eta corr, saving
    # two full-width VPU multiplies per iteration.  The identity term
    # stays OUTSIDE the matmul so the MXU accumulation order matches
    # the XLA gram path (fc ista_fista._solve) exactly -- folding it
    # into the operator shifts per-iteration rounding enough to flip
    # shrinkage boundaries vs the composed path.
    neg_eta_gram = prep_gram(-eta * gram)  # tier prep once, not per iter
    corr_eta = eta * corr
    init = jnp.zeros_like(corr)

    def fista_body(_, carry):
      z, old, t_k = carry
      codes = threshold(z + iter_dot(z, neg_eta_gram) + corr_eta)
      if use_fista:
        t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t_k * t_k)) / 2.0
        beta = (t_k - 1.0) / t_next
        return codes + beta * (codes - old), codes, t_next
      return codes, codes, t_k

    if early_eps is None:
      _, codes, _ = jax.lax.fori_loop(
          0, num_iters, fista_body, (init, init, jnp.float32(1.0)))
    else:
      # reference stop rule (fc/ista_fista.py:135-144, same in-kernel
      # while_loop as ops/pallas_fista): mean |codes - old_codes| / eta
      # < eps after the first iteration, over the REAL element count
      # (padded rows/cols hold exact zeros every iteration).  Exact
      # because this kernel is single-tile (the batch-global mean needs
      # the whole batch in VMEM; fused_segment_supported gates).
      inv_count = scalars_ref[3]

      def stop_cond(carry):
        k, _, _, _, _, stop = carry
        return jnp.logical_and(k < num_iters, jnp.logical_not(stop))

      def stop_body(carry):
        k, z, old, _, t_k, _ = carry
        z_next, codes, t_next = fista_body(None, (z, old, t_k))
        avg_delta = (jnp.sum(jnp.abs(codes - old)) * inv_count) / eta
        stop = jnp.logical_and(avg_delta < early_eps, k > 0)
        return k + 1, z_next, codes, codes, t_next, stop

      _, _, _, codes, _, _ = jax.lax.while_loop(
          stop_cond, stop_body,
          (jnp.int32(0), init, init, init, jnp.float32(1.0),
           jnp.bool_(False)))
    codes_out[:] = codes

    if uses_hessian:
      hessian = (0.99 * h_out[:]
                 + (jnp.sum(codes * codes, axis=0, keepdims=True)
                    * inv_b) / 100.0)
      h_out[:] = hessian
      scale = jnp.transpose(hessian) + lowest_code_val  # (s_pad, 1)

    def update_body(_, d):
      resid = _dot(codes, d) - images                 # (b_pad, n_pad)
      grad = _tdot(codes, resid) * inv_b              # (s_pad, n_pad)
      if uses_hessian:
        grad = grad / scale
      d = d - upd_step * grad
      if renormalize:
        norms = jnp.sqrt(jnp.sum(d * d, axis=1, keepdims=True))
        d = d / jnp.maximum(norms, 1e-30)  # zero-padded rows stay zero
      return d

    d_out[:] = jax.lax.fori_loop(0, upd_num_iters, update_body,
                                 dictionary)

  return kernel


def _make_group_kernel(variant, hard, uses_hessian, renormalize,
                       upd_num_iters, power_iters, use_n_gram,
                       lowest_code_val, use_reg=False, mxu="highest",
                       early_eps=None, roll_m=None, gsel_identity=False):
  """Subspace (group-sparse) whole-segment kernel.  Same state-in-VMEM
  design as _make_kernel; the group structure enters as two static 0/1
  matrices so every ragged operation is an MXU matmul:
    gsel   (GM, s): grouped_dict = gsel @ D (duplicated, zero-padded
           rows -- build_grouped_dictionary semantics) and
           codes_s = codes_gm @ gsel (duplicate-summed unpack).
    expand (GM, G): group-norm shrinkage via squared-sum + broadcast
           matmuls (see ops/pallas_group_fista.py; the folded E E^T
           one-matmul prox was measured on-chip as a regression -- see
           that module's docstring -- so the two-matmul form stays).
  The stepsize is folded into the iteration operator once per step
  (z + z @ (-eta G) + eta c, identity outside the matmul -- same
  accumulation-order note as _make_kernel), saving two full-width VPU
  multiplies per iteration.
  With ``use_reg`` the within-group anti-alignment regularizer runs
  in-kernel too: for unit-norm dictionaries its gradient is
  sum_j A_ij sign(C_ij) (D_j - C_ij D_i) with C = D D^T and A the
  static zero-diagonal co-membership COUNT matrix (overlapping groups
  contribute once per shared group) -- i.e. S @ D - rowsum(S*C) * D
  with S = A * sign(C): one extra (s, s) Gram + matmul per update
  iteration, no gathers (dict_update_rules/fully_connected/
  _subspace_common.py is the reference formulation).
  ``mxu``: opt-in training-speed tiering as in _make_kernel -- the
  iteration matmul AND the per-iteration prox matmuls run at the
  requested tier ('bf16x3' recommended; the prox 3-pass collapses to
  2 against the exact-in-bf16 0/1 membership operand -- see
  _make_prox_dots); in the 'bf16' tier corr and the summed unpack
  drop to single-pass bf16 too.  The grouped build, grouped Gram,
  power refresh, the UPDATE matmuls (converged residuals sink below
  bf16 noise -- see _make_kernel), and the sign-sensitive regularizer
  Gram always stay HIGHEST.
  ``roll_m``: power-of-2 packed-group window -> the prox runs as lane
  rotations instead of membership matmuls (_make_group_prox).
  ``gsel_identity``: static; when the groups tile range(s) in order
  (the grouped dictionary is exactly D), the build and unpack matmuls
  are skipped (bitwise-identical at HIGHEST: I @ D is exact; in the
  'bf16' tier the identity path SKIPS the unpack's bf16 rounding, i.e.
  it is slightly MORE accurate than the matmul form).
  Segment-constant operands (d, gsel, expand, comem) ride pl.ANY and
  are pinned into VMEM once at step 0 (_pin_hbm) instead of being
  re-fetched by the pipeline every cell."""
  use_fista = variant == "fista"
  prep_gram, iter_dot = _make_iter_dot(mxu)
  bind_prox = _make_group_prox(mxu, hard, roll_m)
  dot_ = _dot_b if mxu == "bf16" else _dot
  dot_t_ = _dot_t_b if mxu == "bf16" else _dot_t
  use_gsel = not gsel_identity
  use_expand = roll_m is None

  def _kernel(*refs):
    it = iter(refs)
    niter_ref, scalars_ref, d_ref, h_ref, v_ref = (
        next(it), next(it), next(it), next(it), next(it))
    gsel_hbm = next(it) if use_gsel else None
    expand_hbm = next(it) if use_expand else None
    comem_hbm = next(it) if use_reg else None
    x_ref, d_out, h_out, v_out, codes_out = (
        next(it), next(it), next(it), next(it), next(it))
    d_pin = next(it)
    gsel_vmem = next(it) if use_gsel else None
    expand_vmem = next(it) if use_expand else None
    comem_vmem = next(it) if use_reg else None
    sems = next(it)
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
      # DMA into scratch, VPU copy into the carry block (the
      # distributed-interpret mode cannot DMA into output refs)
      _pin_hbm(d_ref, d_pin, sems.at[0])
      d_out[:] = d_pin[:]
      if use_gsel:
        _pin_hbm(gsel_hbm, gsel_vmem, sems.at[1])
      if use_expand:
        _pin_hbm(expand_hbm, expand_vmem, sems.at[2])
      if use_reg:
        _pin_hbm(comem_hbm, comem_vmem, sems.at[3])
      h_out[:] = h_ref[:]
      v_out[:] = v_ref[:]

    num_iters = niter_ref[0]
    sw = scalars_ref[0]
    upd_step = scalars_ref[1]
    inv_b = scalars_ref[2]

    dictionary = d_out[:]
    gsel = gsel_vmem[:] if use_gsel else None
    expand = expand_vmem[:] if use_expand else None
    images = x_ref[0]
    grouped = (_dot(gsel, dictionary) if use_gsel
               else dictionary)                   # (GM_pad, n_pad)
    gram = _dot_t(grouped, grouped)               # (GM_pad, GM_pad)
    power_gram = _tdot(grouped, grouped) if use_n_gram else gram

    v = v_out[:]
    v = v / jnp.sqrt(jnp.sum(v * v))

    def power_body(_, vec):
      w = _dot(vec, power_gram)
      return w / jnp.sqrt(jnp.sum(w * w))

    v = jax.lax.fori_loop(0, power_iters, power_body, v)
    v_out[:] = v
    eta = 1.0 / jnp.sum(_dot(v, power_gram) * v)
    lam_eta = sw * eta

    corr = dot_t_(images, grouped)                # (b_pad, GM_pad)
    prox = bind_prox(expand, lam_eta, corr.shape)

    neg_eta_gram = prep_gram(-eta * gram)  # tier prep once, not per iter
    corr_eta = eta * corr
    init = jnp.zeros_like(corr)

    def fista_body(_, carry):
      z, old, t_k = carry
      codes = prox(z + iter_dot(z, neg_eta_gram) + corr_eta)
      if use_fista:
        t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t_k * t_k)) / 2.0
        beta = (t_k - 1.0) / t_next
        return codes + beta * (codes - old), codes, t_next
      return codes, codes, t_k

    if early_eps is None:
      _, grouped_codes, _ = jax.lax.fori_loop(
          0, num_iters, fista_body, (init, init, jnp.float32(1.0)))
    else:
      # reference stop rule on the GROUPED tensor (same count
      # semantics as ops/pallas_group_fista: mean over the real
      # b * G * M entries -- padded slots are exact zeros every
      # iteration).  Single-tile by construction: this segment kernel
      # holds the whole batch in VMEM.
      inv_gcount = scalars_ref[4]

      def stop_cond(carry):
        j, _, _, _, _, stop = carry
        return jnp.logical_and(j < num_iters, jnp.logical_not(stop))

      def stop_body(carry):
        j, z, old, _, t_k, _ = carry
        z_next, codes_, t_next = fista_body(None, (z, old, t_k))
        avg_delta = (jnp.sum(jnp.abs(codes_ - old)) * inv_gcount) / eta
        stop = jnp.logical_and(avg_delta < early_eps, j > 0)
        return j + 1, z_next, codes_, codes_, t_next, stop

      _, _, _, grouped_codes, _, _ = jax.lax.while_loop(
          stop_cond, stop_body,
          (jnp.int32(0), init, init, init, jnp.float32(1.0),
           jnp.bool_(False)))
    codes = (dot_(grouped_codes, gsel) if use_gsel
             else grouped_codes)       # (b_pad, s_pad) summed
    codes_out[:] = codes

    if uses_hessian:
      hessian = (0.99 * h_out[:]
                 + (jnp.sum(codes * codes, axis=0, keepdims=True)
                    * inv_b) / 100.0)
      h_out[:] = hessian
      scale = jnp.transpose(hessian) + lowest_code_val

    def update_body(_, d):
      resid = _dot(codes, d) - images
      grad = _tdot(codes, resid) * inv_b
      if use_reg:
        # anti-alignment regularizer (unit-norm form; see docstring).
        # Zero-padded rows have zero cosines -> sign 0 -> no effect.
        penalty = scalars_ref[3]
        cmat = _dot_t(d, d)
        smat = comem_vmem[:] * jnp.sign(cmat)
        reg = (_dot(smat, d)
               - jnp.sum(smat * cmat, axis=1, keepdims=True) * d)
        grad = grad + penalty * reg
      if uses_hessian:
        grad = grad / scale
      d = d - upd_step * grad
      if renormalize:
        norms = jnp.sqrt(jnp.sum(d * d, axis=1, keepdims=True))
        d = d / jnp.maximum(norms, 1e-30)
      return d

    d_out[:] = jax.lax.fori_loop(0, upd_num_iters, update_body,
                                 dictionary)

  return _kernel


def _make_tiled_kernel(variant, nonneg, hard, uses_hessian, renormalize,
                       upd_num_iters, power_iters, use_n_gram,
                       lowest_code_val, num_tiles, mxu="highest"):
  """Batch-tiled variant: grid (step, tile) with tile fastest.  The
  dictionary gradient is accumulated in GRAM form: with
  C = sum_t codes_t^T codes_t and B = sum_t codes_t^T X_t in VMEM
  scratch, the full-batch gradient at ANY dictionary D' is exactly
  (C D' - B)/b -- so the step's last tile can run `upd_num_iters`
  descent iterations against the updated dictionary (the same
  semantics as the reference's multi-iteration update,
  sc_cheap_quadratic_descent.py:44-49) without keeping any tile's
  codes or images alive."""
  use_fista = variant == "fista"
  # training-speed tiering (see _make_iter_dot / _make_kernel): ONLY
  # the FISTA iteration matmuls (+ corr in the 'bf16' tier) drop
  # precision.  The gram-form stats (C, B) and the C D' - B update
  # MUST stay HIGHEST: the gradient is a small difference of large
  # matrices, so bf16 there is catastrophic cancellation (measured:
  # LASSO loss 3x worse).  They run once per step -- negligible next
  # to the iteration loop.
  prep_gram, iter_dot = _make_iter_dot(mxu)
  dot_t_ = _dot_t_b if mxu == "bf16" else _dot_t

  def kernel(niter_ref, scalars_ref, d_ref, h_ref, v_ref, x_ref,
             d_out, h_out, v_out, codes_out,
             cacc, bacc, statacc, eta_ref, d_pin, d_sem):
    step = pl.program_id(0)
    tile = pl.program_id(1)

    @pl.when((step == 0) & (tile == 0))
    def _():
      # d rides pl.ANY (segment-constant; see _pin_hbm): DMA into
      # scratch, VPU copy into the carry output block
      _pin_hbm(d_ref, d_pin, d_sem)
      d_out[:] = d_pin[:]
      h_out[:] = h_ref[:]
      v_out[:] = v_ref[:]

    num_iters = niter_ref[0]
    sw = scalars_ref[0]
    upd_step = scalars_ref[1]
    inv_b = scalars_ref[2]

    dictionary = d_out[:]
    gram = _dot_t(dictionary, dictionary)

    @pl.when(tile == 0)
    def _():
      power_gram = (_tdot(dictionary, dictionary) if use_n_gram
                    else gram)
      v = v_out[:]
      v = v / jnp.sqrt(jnp.sum(v * v))

      def power_body(_, vec):
        w = _dot(vec, power_gram)
        return w / jnp.sqrt(jnp.sum(w * w))

      v = jax.lax.fori_loop(0, power_iters, power_body, v)
      v_out[:] = v
      eta_ref[0] = 1.0 / jnp.sum(_dot(v, power_gram) * v)
      cacc[:] = jnp.zeros_like(cacc)
      bacc[:] = jnp.zeros_like(bacc)
      statacc[:] = jnp.zeros_like(statacc)

    eta = eta_ref[0]
    lam_eta = sw * eta
    images = x_ref[0]
    corr = dot_t_(images, dictionary)

    def threshold(x):
      if hard:
        if nonneg:
          return jnp.where(x < lam_eta, 0.0, x)
        return jnp.where(jnp.abs(x) < lam_eta, 0.0, x)
      if nonneg:
        return jnp.maximum(x - lam_eta, 0.0)
      return jnp.sign(x) * jnp.maximum(jnp.abs(x) - lam_eta, 0.0)

    init = jnp.zeros_like(corr)

    iter_gram = prep_gram(gram)

    def fista_body(_, carry):
      z, old, t_k = carry
      codes = threshold(z - eta * iter_dot(z, iter_gram) + eta * corr)
      if use_fista:
        t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t_k * t_k)) / 2.0
        beta = (t_k - 1.0) / t_next
        return codes + beta * (codes - old), codes, t_next
      return codes, codes, t_k

    _, codes, _ = jax.lax.fori_loop(
        0, num_iters, fista_body, (init, init, jnp.float32(1.0)))
    codes_out[:] = codes

    if uses_hessian:
      statacc[:] = statacc[:] + jnp.sum(codes * codes, axis=0,
                                        keepdims=True)
    cacc[:] = cacc[:] + _tdot(codes, codes)
    bacc[:] = bacc[:] + _tdot(codes, images)

    @pl.when(tile == num_tiles - 1)
    def _():
      cmat = cacc[:]
      bmat = bacc[:]
      if uses_hessian:
        hessian = 0.99 * h_out[:] + (statacc[:] * inv_b) / 100.0
        h_out[:] = hessian
        scale = jnp.transpose(hessian) + lowest_code_val

      def update_body(_, d):
        grad = (_dot(cmat, d) - bmat) * inv_b
        if uses_hessian:
          grad = grad / scale
        d = d - upd_step * grad
        if renormalize:
          norms = jnp.sqrt(jnp.sum(d * d, axis=1, keepdims=True))
          d = d / jnp.maximum(norms, 1e-30)
        return d

      d_out[:] = jax.lax.fori_loop(0, upd_num_iters, update_body,
                                   dictionary)

  return kernel


def _make_solve_stats_kernel(variant, nonneg, hard, power_iters,
                             use_n_gram, mxu="highest"):
  """Per-shard kernel for the data-parallel composition: warm Lipschitz
  refresh + the full VMEM-resident FISTA solve + the shard's update
  STATISTICS (C = codes^T codes, B = codes^T X, hessian stat), leaving
  the psum + dictionary update to a thin XLA epilogue outside the
  kernel (the update needs the cross-chip reduction, which runs over
  ICI between kernel launches; see parallel/data_parallel.py
  build_dp_fused_local_step).  ``mxu``: the iteration matmul runs at
  the requested tier (+ corr in 'bf16'); the Gram/power refresh and
  the gram-form stats (which feed the cancellation-prone C D' - B
  epilogue) stay HIGHEST."""
  use_fista = variant == "fista"
  prep_gram, iter_dot = _make_iter_dot(mxu)
  dot_t_ = _dot_t_b if mxu == "bf16" else _dot_t

  def kernel(niter_ref, scalars_ref, d_ref, v_ref, x_ref,
             codes_out, c_out, b_out, stat_out, v_out, eta_out):
    num_iters = niter_ref[0]
    sw = scalars_ref[0]
    dictionary = d_ref[:]
    images = x_ref[:]
    gram = _dot_t(dictionary, dictionary)
    power_gram = _tdot(dictionary, dictionary) if use_n_gram else gram

    v = v_ref[:]
    v = v / jnp.sqrt(jnp.sum(v * v))

    def power_body(_, vec):
      w = _dot(vec, power_gram)
      return w / jnp.sqrt(jnp.sum(w * w))

    v = jax.lax.fori_loop(0, power_iters, power_body, v)
    v_out[:] = v
    eigval = jnp.sum(_dot(v, power_gram) * v)
    eta = 1.0 / eigval
    eta_out[:] = eta.reshape(1, 1)
    lam_eta = sw * eta

    corr = dot_t_(images, dictionary)

    def threshold(x):
      if hard:
        if nonneg:
          return jnp.where(x < lam_eta, 0.0, x)
        return jnp.where(jnp.abs(x) < lam_eta, 0.0, x)
      if nonneg:
        return jnp.maximum(x - lam_eta, 0.0)
      return x - jnp.clip(x, -lam_eta, lam_eta)

    neg_eta_gram = prep_gram(-eta * gram)
    corr_eta = eta * corr
    init = jnp.zeros_like(corr)

    def fista_body(_, carry):
      z, old, t_k = carry
      codes = threshold(z + iter_dot(z, neg_eta_gram) + corr_eta)
      if use_fista:
        t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t_k * t_k)) / 2.0
        beta = (t_k - 1.0) / t_next
        return codes + beta * (codes - old), codes, t_next
      return codes, codes, t_k

    _, codes, _ = jax.lax.fori_loop(
        0, num_iters, fista_body, (init, init, jnp.float32(1.0)))
    codes_out[:] = codes
    c_out[:] = _tdot(codes, codes)
    b_out[:] = _tdot(codes, images)
    stat_out[:] = jnp.sum(codes * codes, axis=0, keepdims=True)

  return kernel


def fused_solve_stats_supported(batch_shard_size, code_size, input_size):
  """True when the per-shard solve+stats kernel fits one VMEM tile."""
  s_pad = round_up(code_size, _LANES)
  n_pad = round_up(input_size, _LANES)
  b_pad = round_up(batch_shard_size, _SUBLANES)
  return _vmem_bytes(b_pad, s_pad, n_pad, code_size > input_size,
                     multi_tile=True) <= _VMEM_BUDGET_BYTES


@functools.partial(
    jax.jit,
    static_argnames=("variant", "nonneg", "hard", "power_iters",
                     "interpret", "mxu"))
def fused_solve_stats_pallas(dictionary, eigvec, batch, sparsity_weight,
                             inf_num_iters, *, variant="fista",
                             nonneg=False, hard=False, power_iters=12,
                             interpret=False, mxu="highest"):
  """One fused kernel: warm Lipschitz refresh + FISTA solve + gram-form
  update statistics for this batch (shard).

  Returns (codes (b, s), cmat (s, s), bmat (s, n), stat (s,),
  new_eigvec, eta).  The full-batch dictionary gradient at any D' is
  exactly (sum_shards cmat @ D' - sum_shards bmat) / global_b, so a
  data-parallel caller psums cmat/bmat/stat once per step and runs any
  number of update iterations locally (identical math to the
  single-device fused segment kernel's tiled variant)."""
  b, n = batch.shape
  s = dictionary.shape[0]
  use_n_gram = s > n
  dim = n if use_n_gram else s
  s_pad = round_up(s, _LANES)
  n_pad = round_up(n, _LANES)
  dim_pad = round_up(dim, _LANES)
  b_pad = round_up(b, _SUBLANES)

  d_in = jnp.pad(jnp.asarray(dictionary, jnp.float32),
                 ((0, s_pad - s), (0, n_pad - n)))
  v_in = jnp.pad(jnp.asarray(eigvec, jnp.float32).reshape(1, dim),
                 ((0, 0), (0, dim_pad - dim)))
  x_in = jnp.pad(jnp.asarray(batch, jnp.float32),
                 ((0, b_pad - b), (0, n_pad - n)))
  scalars = jnp.asarray(sparsity_weight, jnp.float32).reshape(1)
  niter = jnp.asarray(inf_num_iters, jnp.int32).reshape(1)

  kernel = _make_solve_stats_kernel(variant, bool(nonneg), bool(hard),
                                    int(power_iters), use_n_gram,
                                    mxu=str(mxu))
  const = lambda *_: (0, 0)
  out = pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=2,
          grid=(1,),
          in_specs=[
              pl.BlockSpec((s_pad, n_pad), const),
              pl.BlockSpec((1, dim_pad), const),
              pl.BlockSpec((b_pad, n_pad), const),
          ],
          out_specs=[
              pl.BlockSpec((b_pad, s_pad), const),
              pl.BlockSpec((s_pad, s_pad), const),
              pl.BlockSpec((s_pad, n_pad), const),
              pl.BlockSpec((1, s_pad), const),
              pl.BlockSpec((1, dim_pad), const),
              pl.BlockSpec((1, 1), const),
          ]),
      out_shape=[
          jax.ShapeDtypeStruct((b_pad, s_pad), jnp.float32),
          jax.ShapeDtypeStruct((s_pad, s_pad), jnp.float32),
          jax.ShapeDtypeStruct((s_pad, n_pad), jnp.float32),
          jax.ShapeDtypeStruct((1, s_pad), jnp.float32),
          jax.ShapeDtypeStruct((1, dim_pad), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
      ],
      interpret=interpret,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=32 * 1024 * 1024) if not interpret else None,
  )(niter, scalars, d_in, v_in, x_in)
  codes, cmat, bmat, stat, v_new, eta = out
  return (codes[:b, :s], cmat[:s, :s], bmat[:s, :n], stat[0, :s],
          v_new[0, :dim], eta[0, 0])


def _make_group_solve_stats_kernel(variant, hard, power_iters,
                                   use_n_gram, mxu="highest",
                                   roll_m=None):
  """Group-sparse counterpart of _make_solve_stats_kernel: warm
  Lipschitz refresh on the grouped Gram + the whole VMEM-resident
  group FISTA solve + this shard's gram-form update statistics
  (C = codes^T codes, B = codes^T X, hessian stat) over the SUMMED
  (b, s) codes.  The psum + subspace dictionary update stay in the XLA
  epilogue (parallel/data_parallel.build_dp_group_fused_local_step);
  the alignment regularizer depends only on the replicated dictionary,
  so it needs no cross-chip reduction and runs in the epilogue too.
  ``mxu``: same solve-tier / stats-HIGHEST tiering as
  _make_solve_stats_kernel (prox matmuls ride the iteration tier via
  _make_prox_dots, as in _make_group_kernel; the lane-rotate prox
  rides ``roll_m`` as there too)."""
  use_fista = variant == "fista"
  prep_gram, iter_dot = _make_iter_dot(mxu)
  bind_prox = _make_group_prox(mxu, hard, roll_m)
  dot_ = _dot_b if mxu == "bf16" else _dot
  dot_t_ = _dot_t_b if mxu == "bf16" else _dot_t

  def kernel(niter_ref, scalars_ref, d_ref, v_ref, gsel_ref, expand_ref,
             x_ref, codes_out, c_out, b_out, stat_out, v_out, eta_out):
    num_iters = niter_ref[0]
    sw = scalars_ref[0]
    dictionary = d_ref[:]
    images = x_ref[:]
    gsel = gsel_ref[:]
    expand = expand_ref[:]
    grouped = _dot(gsel, dictionary)              # (GM_pad, n_pad)
    gram = _dot_t(grouped, grouped)               # (GM_pad, GM_pad)
    power_gram = _tdot(grouped, grouped) if use_n_gram else gram

    v = v_ref[:]
    v = v / jnp.sqrt(jnp.sum(v * v))

    def power_body(_, vec):
      w = _dot(vec, power_gram)
      return w / jnp.sqrt(jnp.sum(w * w))

    v = jax.lax.fori_loop(0, power_iters, power_body, v)
    v_out[:] = v
    eta = 1.0 / jnp.sum(_dot(v, power_gram) * v)
    eta_out[:] = eta.reshape(1, 1)
    lam_eta = sw * eta

    corr = dot_t_(images, grouped)                # (b_pad, GM_pad)
    prox = bind_prox(expand, lam_eta, corr.shape)

    neg_eta_gram = prep_gram(-eta * gram)
    corr_eta = eta * corr
    init = jnp.zeros_like(corr)

    def fista_body(_, carry):
      z, old, t_k = carry
      codes = prox(z + iter_dot(z, neg_eta_gram) + corr_eta)
      if use_fista:
        t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t_k * t_k)) / 2.0
        beta = (t_k - 1.0) / t_next
        return codes + beta * (codes - old), codes, t_next
      return codes, codes, t_k

    _, grouped_codes, _ = jax.lax.fori_loop(
        0, num_iters, fista_body, (init, init, jnp.float32(1.0)))
    codes = dot_(grouped_codes, gsel)             # (b_pad, s_pad) summed
    codes_out[:] = codes
    c_out[:] = _tdot(codes, codes)
    b_out[:] = _tdot(codes, images)
    stat_out[:] = jnp.sum(codes * codes, axis=0, keepdims=True)

  return kernel


def _group_stats_vmem_bytes(b_pad, s_pad, n_pad, gm_pad, g_pad,
                            use_n_gram):
  buffers = (
      s_pad * n_pad                     # dictionary
      + gm_pad * n_pad                  # grouped dictionary
      + 2 * gm_pad * gm_pad             # grouped gram + folded -eta*gram
      + (n_pad * n_pad if use_n_gram else 0)
      + gm_pad * s_pad + gm_pad * g_pad  # gsel, expand
      + b_pad * n_pad                   # X block
      + 5 * b_pad * gm_pad              # corr, eta*corr, z, old, codes
      + 2 * b_pad * s_pad               # summed codes + out block
      + s_pad * s_pad + s_pad * n_pad   # C, B stat outputs
      + b_pad * g_pad)                  # group norms
  return 4 * buffers


def fused_group_solve_stats_supported(batch_shard_size, code_size,
                                      input_size, group_assignments):
  """True when the per-shard group solve+stats kernel fits VMEM."""
  num_groups = len(group_assignments)
  max_gs = max(len(g) for g in group_assignments)
  gm = num_groups * max_gs
  return _group_stats_vmem_bytes(
      round_up(batch_shard_size, _SUBLANES), round_up(code_size, _LANES),
      round_up(input_size, _LANES), round_up(gm, _LANES),
      round_up(num_groups, _LANES),
      gm > input_size) <= _VMEM_BUDGET_BYTES


def fused_group_solve_stats_pallas(dictionary, eigvec, batch,
                                   sparsity_weight, inf_num_iters, *,
                                   group_assignments, variant="fista",
                                   hard=False, power_iters=12,
                                   interpret=False, mxu="highest"):
  """One fused kernel: warm grouped-Lipschitz refresh + group FISTA
  solve + gram-form update statistics for this batch (shard).

  Returns (codes (b, s) summed, cmat (s, s), bmat (s, n), stat (s,),
  new_eigvec (min(G*M, n),), eta).  Same DP contract as
  fused_solve_stats_pallas: the full-batch subspace dictionary gradient
  at any D' is (sum_shards cmat @ D' - sum_shards bmat) / global_b."""
  groups = tuple(tuple(int(m) for m in g) for g in group_assignments)
  return _fused_group_solve_stats_impl(
      dictionary, eigvec, batch, sparsity_weight, inf_num_iters,
      group_assignments=groups, variant=variant, hard=hard,
      power_iters=power_iters, interpret=interpret,
      mxu=mxu)


@functools.partial(
    jax.jit,
    static_argnames=("group_assignments", "variant", "hard",
                     "power_iters", "interpret", "mxu"))
def _fused_group_solve_stats_impl(dictionary, eigvec, batch,
                                  sparsity_weight, inf_num_iters, *,
                                  group_assignments, variant, hard,
                                  power_iters, interpret,
                                  mxu="highest"):
  b, n = batch.shape
  s = dictionary.shape[0]
  num_groups = len(group_assignments)
  max_gs = max(len(g) for g in group_assignments)
  gm = num_groups * max_gs
  gsel = group_selection_matrix(group_assignments, s)
  expand = group_expand_matrix(group_assignments)
  use_n_gram = gm > n
  dim = n if use_n_gram else gm

  s_pad = round_up(s, _LANES)
  n_pad = round_up(n, _LANES)
  gm_pad = round_up(gm, _LANES)
  g_pad = round_up(num_groups, _LANES)
  dim_pad = round_up(dim, _LANES)
  b_pad = round_up(b, _SUBLANES)

  d_in = jnp.pad(jnp.asarray(dictionary, jnp.float32),
                 ((0, s_pad - s), (0, n_pad - n)))
  v_in = jnp.pad(jnp.asarray(eigvec, jnp.float32).reshape(1, dim),
                 ((0, 0), (0, dim_pad - dim)))
  gsel_in = jnp.pad(jnp.asarray(gsel),
                    ((0, gm_pad - gm), (0, s_pad - s)))
  expand_in = jnp.pad(jnp.asarray(expand, jnp.float32),
                      ((0, gm_pad - gm), (0, g_pad - num_groups)))
  x_in = jnp.pad(jnp.asarray(batch, jnp.float32),
                 ((0, b_pad - b), (0, n_pad - n)))
  scalars = jnp.asarray(sparsity_weight, jnp.float32).reshape(1)
  niter = jnp.asarray(inf_num_iters, jnp.int32).reshape(1)

  kernel = _make_group_solve_stats_kernel(
      variant, bool(hard), int(power_iters), use_n_gram,
      mxu=str(mxu), roll_m=roll_prox_window(group_assignments))
  const = lambda *_: (0, 0)
  out = pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=2,
          grid=(1,),
          in_specs=[
              pl.BlockSpec((s_pad, n_pad), const),
              pl.BlockSpec((1, dim_pad), const),
              pl.BlockSpec((gm_pad, s_pad), const),
              pl.BlockSpec((gm_pad, g_pad), const),
              pl.BlockSpec((b_pad, n_pad), const),
          ],
          out_specs=[
              pl.BlockSpec((b_pad, s_pad), const),
              pl.BlockSpec((s_pad, s_pad), const),
              pl.BlockSpec((s_pad, n_pad), const),
              pl.BlockSpec((1, s_pad), const),
              pl.BlockSpec((1, dim_pad), const),
              pl.BlockSpec((1, 1), const),
          ]),
      out_shape=[
          jax.ShapeDtypeStruct((b_pad, s_pad), jnp.float32),
          jax.ShapeDtypeStruct((s_pad, s_pad), jnp.float32),
          jax.ShapeDtypeStruct((s_pad, n_pad), jnp.float32),
          jax.ShapeDtypeStruct((1, s_pad), jnp.float32),
          jax.ShapeDtypeStruct((1, dim_pad), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
      ],
      interpret=interpret,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=32 * 1024 * 1024) if not interpret else None,
  )(niter, scalars, d_in, v_in, gsel_in, expand_in, x_in)
  codes, cmat, bmat, stat, v_new, eta = out
  return (codes[:b, :s], cmat[:s, :s], bmat[:s, :n], stat[0, :s],
          v_new[0, :dim], eta[0, 0])


def _group_vmem_bytes(b_pad, s_pad, n_pad, gm_pad, g_pad, use_n_gram):
  # pinned-operand accounting: see the _vmem_bytes NOTE (the pins
  # replace double-buffered pipeline inputs; net VMEM shrinks)
  buffers = (
      2 * s_pad * n_pad                 # dictionary in + out
      + gm_pad * n_pad                  # grouped dictionary
      + 2 * gm_pad * gm_pad             # grouped gram + folded -eta*gram
      + (n_pad * n_pad if use_n_gram else 0)
      + gm_pad * s_pad + gm_pad * g_pad  # gsel, expand
      + 2 * b_pad * n_pad               # X double buffer
      + 5 * b_pad * gm_pad              # corr, eta*corr, z, old, codes
      + 2 * b_pad * s_pad               # summed codes + out block
      + b_pad * n_pad                   # update residual
      + b_pad * g_pad)                  # group norms
  return 4 * buffers


def fused_group_segment_supported(inference_alg, update_alg,
                                  group_assignments, *,
                                  alignment_penalty=0.0, batch_size=None,
                                  code_size=None, input_size=None,
                                  renormalize=True):
  """True when `fused_group_train_segment_pallas` covers this config."""
  if group_assignments is None:
    return False
  if inference_alg not in ("subspace_ista", "subspace_fista"):
    return False
  if update_alg not in ("subspace_sc_steepest_descent",
                        "subspace_sc_cheap_quadratic_descent"):
    return False
  if alignment_penalty != 0.0 and not renormalize:
    # the in-kernel regularizer uses the unit-norm gradient form
    return False
  if None in (batch_size, code_size, input_size):
    return True
  num_groups = len(group_assignments)
  max_gs = max(len(g) for g in group_assignments)
  gm = num_groups * max_gs
  return _group_vmem_bytes(
      round_up(batch_size, _SUBLANES), round_up(code_size, _LANES),
      round_up(input_size, _LANES), round_up(gm, _LANES),
      round_up(num_groups, _LANES),
      gm > input_size) <= _VMEM_BUDGET_BYTES


def group_selection_matrix(group_assignments, code_size):
  """(G*M, s) 0/1 matrix: row g*M+m is one-hot at the member's code
  index (zero row for group padding).  grouped_dict = gsel @ D and
  summed codes = grouped_codes @ gsel."""
  import numpy as np
  num_groups = len(group_assignments)
  max_gs = max(len(g) for g in group_assignments)
  gsel = np.zeros((num_groups * max_gs, code_size), np.float32)
  for g_idx, members in enumerate(group_assignments):
    for m_idx, member in enumerate(members):
      gsel[g_idx * max_gs + m_idx, member] = 1.0
  return gsel


def group_expand_matrix(group_assignments):
  """(G*M, G) 0/1 membership matrix (zero rows for group padding)."""
  import numpy as np
  num_groups = len(group_assignments)
  max_gs = max(len(g) for g in group_assignments)
  expand = np.zeros((num_groups * max_gs, num_groups), np.float32)
  for g_idx, members in enumerate(group_assignments):
    for m_idx in range(len(members)):
      expand[g_idx * max_gs + m_idx, g_idx] = 1.0
  return expand


def fused_group_train_segment_pallas(dictionary, hessian, eigvec,
                                     batches, sparsity_weight,
                                     inf_num_iters, upd_stepsize, *,
                                     group_assignments, **kwargs):
  """Subspace counterpart of `fused_train_segment_pallas`: one kernel
  launch per segment for the group-sparse solver + subspace update
  (alignment penalty 0).  eigvec has dim min(G*M, n) -- the grouped
  Gram's, matching lipschitz.power_iterate on the grouped dictionary."""
  groups = tuple(tuple(int(m) for m in g) for g in group_assignments)
  return _fused_group_impl(dictionary, hessian, eigvec, batches,
                           sparsity_weight, inf_num_iters, upd_stepsize,
                           group_assignments=groups, **kwargs)


@functools.partial(
    jax.jit,
    static_argnames=("group_assignments", "variant", "update_alg",
                     "upd_num_iters", "hard", "renormalize",
                     "power_iters", "lowest_code_val",
                     "alignment_penalty", "interpret", "mxu",
                     "early_stopping_epsilon"))
def _fused_group_impl(dictionary, hessian, eigvec,
                      batches, sparsity_weight,
                      inf_num_iters, upd_stepsize, *,
                      group_assignments, variant="fista",
                      update_alg=(
                          "subspace_sc_cheap_quadratic"
                          "_descent"),
                      upd_num_iters=1, hard=False,
                      renormalize=True, power_iters=12,
                      lowest_code_val=0.001, alignment_penalty=0.0,
                      interpret=False, mxu="highest",
                      early_stopping_epsilon=None):
  use_reg = float(alignment_penalty) != 0.0
  if use_reg:
    assert renormalize, (
        "the in-kernel anti-alignment regularizer uses the unit-norm "
        "gradient form; renormalize=False stays on the XLA path")
  k, b, n = batches.shape
  s = dictionary.shape[0]
  num_groups = len(group_assignments)
  max_gs = max(len(g) for g in group_assignments)
  gm = num_groups * max_gs
  gsel = group_selection_matrix(group_assignments, s)
  expand = group_expand_matrix(group_assignments)
  use_n_gram = gm > n
  dim = n if use_n_gram else gm

  s_pad = round_up(s, _LANES)
  n_pad = round_up(n, _LANES)
  gm_pad = round_up(gm, _LANES)
  g_pad = round_up(num_groups, _LANES)
  dim_pad = round_up(dim, _LANES)
  b_pad = round_up(b, _SUBLANES)
  uses_hessian = update_alg == "subspace_sc_cheap_quadratic_descent"

  d_in = jnp.pad(jnp.asarray(dictionary, jnp.float32),
                 ((0, s_pad - s), (0, n_pad - n)))
  h_in = jnp.pad(jnp.asarray(hessian, jnp.float32).reshape(1, s),
                 ((0, 0), (0, s_pad - s)))
  v_in = jnp.pad(jnp.asarray(eigvec, jnp.float32).reshape(1, dim),
                 ((0, 0), (0, dim_pad - dim)))
  gsel_in = jnp.pad(jnp.asarray(gsel),
                    ((0, gm_pad - gm), (0, s_pad - s)))
  expand_in = jnp.pad(jnp.asarray(expand, jnp.float32),
                      ((0, gm_pad - gm), (0, g_pad - num_groups)))
  x_in = jnp.pad(jnp.asarray(batches, jnp.float32),
                 ((0, 0), (0, b_pad - b), (0, n_pad - n)))

  scalars = jnp.stack([jnp.asarray(sparsity_weight, jnp.float32),
                       jnp.asarray(upd_stepsize, jnp.float32),
                       jnp.float32(1.0 / b),
                       jnp.float32(alignment_penalty),
                       # grouped element count for the early-stop mean
                       jnp.float32(1.0 / (b * gm))])
  niter = jnp.asarray(inf_num_iters, jnp.int32).reshape(1)

  if use_reg:
    # zero-diagonal co-membership counts (overlapping groups add)
    comem = np.zeros((s, s), np.float32)
    for g in group_assignments:
      for gi_ in g:
        for gj_ in g:
          if gi_ != gj_:
            comem[gi_, gj_] += 1.0
    comem_in = jnp.pad(jnp.asarray(comem),
                       ((0, s_pad - s), (0, s_pad - s)))

  roll_m = roll_prox_window(group_assignments)
  # the grouped dictionary is exactly D when the groups tile range(s)
  # in order (no duplicates / padding): skip the build+unpack matmuls
  gsel_identity = bool(gm == s and np.array_equal(gsel, np.eye(s)))
  kernel = _make_group_kernel(variant, hard, uses_hessian, renormalize,
                              int(upd_num_iters), int(power_iters),
                              use_n_gram, float(lowest_code_val),
                              use_reg=use_reg, mxu=str(mxu),
                              early_eps=(
                                  None if early_stopping_epsilon is None
                                  else float(early_stopping_epsilon)),
                              roll_m=roll_m,
                              gsel_identity=gsel_identity)
  use_gsel = not gsel_identity
  use_expand = roll_m is None
  const = lambda i, *_: (0, 0)
  # segment-constant operands ride pl.ANY + a step-0 pin (_pin_hbm)
  any_spec = pl.BlockSpec(memory_space=pl.ANY)
  pin_specs, pin_args, pin_scratch = [], [], []
  if use_gsel:
    pin_specs.append(any_spec)
    pin_args.append(gsel_in)
    pin_scratch.append(pltpu.VMEM((gm_pad, s_pad), jnp.float32))
  if use_expand:
    pin_specs.append(any_spec)
    pin_args.append(expand_in)
    pin_scratch.append(pltpu.VMEM((gm_pad, g_pad), jnp.float32))
  if use_reg:
    pin_specs.append(any_spec)
    pin_args.append(comem_in)
    pin_scratch.append(pltpu.VMEM((s_pad, s_pad), jnp.float32))
  d_new, h_new, v_new, codes = pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=2,
          grid=(k,),
          in_specs=[
              any_spec,  # d: pinned into the carry output at step 0
              pl.BlockSpec((1, s_pad), const),
              pl.BlockSpec((1, dim_pad), const),
          ] + pin_specs + [
              pl.BlockSpec((1, b_pad, n_pad), lambda i, *_: (i, 0, 0)),
          ],
          out_specs=[
              pl.BlockSpec((s_pad, n_pad), const),
              pl.BlockSpec((1, s_pad), const),
              pl.BlockSpec((1, dim_pad), const),
              pl.BlockSpec((b_pad, s_pad), const),
          ],
          scratch_shapes=([pltpu.VMEM((s_pad, n_pad), jnp.float32)]
                          + pin_scratch
                          + [pltpu.SemaphoreType.DMA((4,))])),
      out_shape=[
          jax.ShapeDtypeStruct((s_pad, n_pad), jnp.float32),
          jax.ShapeDtypeStruct((1, s_pad), jnp.float32),
          jax.ShapeDtypeStruct((1, dim_pad), jnp.float32),
          jax.ShapeDtypeStruct((b_pad, s_pad), jnp.float32),
      ],
      interpret=interpret,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=32 * 1024 * 1024) if not interpret else None,
  )(niter, scalars, d_in, h_in, v_in, *pin_args, x_in)
  return (d_new[:s, :n], h_new[0, :s], v_new[0, :dim], codes[:b, :s])


@functools.partial(
    jax.jit,
    static_argnames=("variant", "update_alg", "upd_num_iters", "nonneg",
                     "hard", "renormalize", "power_iters",
                     "lowest_code_val", "interpret", "batch_tile",
                     "mxu", "early_stopping_epsilon"))
def fused_train_segment_pallas(dictionary, hessian, eigvec, batches,
                               sparsity_weight, inf_num_iters,
                               upd_stepsize, *, variant="fista",
                               update_alg="sc_cheap_quadratic_descent",
                               upd_num_iters=1, nonneg=False, hard=False,
                               renormalize=True, power_iters=12,
                               lowest_code_val=0.001, interpret=False,
                               batch_tile=None, mxu="highest",
                               early_stopping_epsilon=None):
  """Run `batches.shape[0]` fused train steps in one kernel launch.

  ``mxu`` is the OPT-IN training-speed tier for the FISTA iteration
  matmuls: 'highest' (parity default) | 'bf16x3' (3-pass split,
  ~1e-4 code accuracy -- training tracks the f32 trajectory; the
  RECOMMENDED speed tier) | 'bf16' (single pass, ~1e-1 -- screening
  grade; measured to bias strongly-converged training toward denser
  codes).  The Gram build, Lipschitz refresh, and update matmuls stay
  full precision in every tier.  The scanned trainer exposes this as
  all_params['train_precision'].

  Args:
    dictionary: (s, n) float32.
    hessian: (s,) Hessian-diagonal EMA (ignored for steepest descent).
    eigvec: (min(s, n),) warm Lipschitz eigenvector (unit norm not
      required; normalized in-kernel like lipschitz.power_iterate).
    batches: (k, b, n) float32, each row a training batch.
    sparsity_weight, inf_num_iters, upd_stepsize: dynamic scalars
      (inf_num_iters changes never recompile -- scalar prefetch).
    power_iters: warm Lipschitz refresh iterations per step.  The
      default 12 is robust to an arbitrary (e.g. random) eigvec seed;
      callers that seed with lipschitz.top_gram_eigenpair (the trainer,
      bench.py) pass 2 -- measured identical tracking accuracy from an
      exact seed (BENCH_NOTES.md UPDATE 5).

  Returns:
    (new_dictionary, new_hessian, new_eigvec, last_codes) where
    last_codes is the (b, s) code matrix of the FINAL step.
  """
  k, b, n = batches.shape
  s = dictionary.shape[0]
  use_n_gram = s > n
  dim = n if use_n_gram else s
  s_pad = round_up(s, _LANES)
  n_pad = round_up(n, _LANES)
  dim_pad = round_up(dim, _LANES)
  tile = batch_tile if batch_tile is not None else _pick_batch_tile(
      b, s, n)
  if tile is None:
    raise ValueError("shapes exceed the fused kernel's VMEM budget; "
                     "use the scan-of-steps path")
  multi_tile = tile < round_up(b, _SUBLANES)
  b_pad = round_up(b, tile) if multi_tile else round_up(b, _SUBLANES)
  uses_hessian = update_alg == "sc_cheap_quadratic_descent"

  d_in = jnp.pad(jnp.asarray(dictionary, jnp.float32),
                 ((0, s_pad - s), (0, n_pad - n)))
  h_in = jnp.pad(jnp.asarray(hessian, jnp.float32).reshape(1, s),
                 ((0, 0), (0, s_pad - s)))
  v_in = jnp.pad(jnp.asarray(eigvec, jnp.float32).reshape(1, dim),
                 ((0, 0), (0, dim_pad - dim)))
  x_in = jnp.pad(jnp.asarray(batches, jnp.float32),
                 ((0, 0), (0, b_pad - b), (0, n_pad - n)))

  scalars = jnp.stack([jnp.asarray(sparsity_weight, jnp.float32),
                       jnp.asarray(upd_stepsize, jnp.float32),
                       jnp.float32(1.0 / b),
                       jnp.float32(1.0 / (b * s))])  # early-stop mean
  niter = jnp.asarray(inf_num_iters, jnp.int32).reshape(1)

  out_shape = [
      jax.ShapeDtypeStruct((s_pad, n_pad), jnp.float32),
      jax.ShapeDtypeStruct((1, s_pad), jnp.float32),
      jax.ShapeDtypeStruct((1, dim_pad), jnp.float32),
      jax.ShapeDtypeStruct((b_pad, s_pad), jnp.float32),
  ]
  cost = pl.CostEstimate(
      flops=2 * k * (s_pad * n_pad * s_pad + b_pad * s_pad * n_pad
                     + 30 * b_pad * s_pad * s_pad
                     + 2 * upd_num_iters * b_pad * s_pad * n_pad),
      bytes_accessed=4 * k * (b_pad * n_pad + b_pad * s_pad),
      transcendentals=0)

  if early_stopping_epsilon is not None:
    assert not multi_tile, (
        "in-kernel early stopping needs the whole batch in one tile "
        "(caller must check fused_segment_supported)")
  if multi_tile:
    num_tiles = b_pad // tile
    kernel = _make_tiled_kernel(
        variant, nonneg, hard, uses_hessian, renormalize,
        int(upd_num_iters), int(power_iters), use_n_gram,
        float(lowest_code_val), num_tiles, mxu=str(mxu))
    const = lambda i, t, *_: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # d: pinned at step 0
            pl.BlockSpec((1, s_pad), const),
            pl.BlockSpec((1, dim_pad), const),
            pl.BlockSpec((1, tile, n_pad), lambda i, t, *_: (i, t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((s_pad, n_pad), const),
            pl.BlockSpec((1, s_pad), const),
            pl.BlockSpec((1, dim_pad), const),
            pl.BlockSpec((tile, s_pad), lambda i, t, *_: (t, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((s_pad, s_pad), jnp.float32),  # C = sum codes^T codes
            pltpu.VMEM((s_pad, n_pad), jnp.float32),  # B = sum codes^T X
            pltpu.VMEM((1, s_pad), jnp.float32),      # stat accumulator
            pltpu.SMEM((1,), jnp.float32),            # eta for the step
            pltpu.VMEM((s_pad, n_pad), jnp.float32),  # d pin landing
            pltpu.SemaphoreType.DMA(()),              # d pin
        ])
  else:
    kernel = _make_kernel(variant, nonneg, hard, uses_hessian,
                          renormalize, int(upd_num_iters),
                          int(power_iters), use_n_gram,
                          float(lowest_code_val),
                          mxu=str(mxu),
                          early_eps=(
                              None if early_stopping_epsilon is None
                              else float(early_stopping_epsilon)))
    const = lambda i, *_: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # d: pinned at step 0
            pl.BlockSpec((1, s_pad), const),
            pl.BlockSpec((1, dim_pad), const),
            pl.BlockSpec((1, b_pad, n_pad), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((s_pad, n_pad), const),
            pl.BlockSpec((1, s_pad), const),
            pl.BlockSpec((1, dim_pad), const),
            pl.BlockSpec((b_pad, s_pad), const),
        ],
        scratch_shapes=[pltpu.VMEM((s_pad, n_pad), jnp.float32),
                        pltpu.SemaphoreType.DMA(())])

  # the default scoped-vmem limit is 16MB; 32MB is validated on v5e and
  # the tile picker's 12MB self-budget (a ~2x underestimate of the
  # compiler's scoped footprint) keeps actual usage safely under it
  d_new, h_new, v_new, codes = pl.pallas_call(
      kernel, grid_spec=grid_spec, out_shape=out_shape,
      interpret=interpret, cost_estimate=cost,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=32 * 1024 * 1024) if not interpret else None,
  )(niter, scalars, d_in, h_in, v_in, x_in)
  return (d_new[:s, :n], h_new[0, :s], v_new[0, :dim], codes[:b, :s])
