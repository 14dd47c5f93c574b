"""Whole CONV training segments as ONE fused Pallas TPU kernel.

Convolutional counterpart of ops/pallas_train_step.py: the scanned conv
trainer's hot loop (`power-refresh -> conv FISTA solve -> Hessian EMA ->
dictionary update -> renormalize` per batch) previously ran as a
lax.scan of separate ops, so the dictionary and the per-batch code
canvases round-tripped HBM at every op boundary.  This kernel runs the
ENTIRE segment on-core in the stride-block-space formulation of
ops/pallas_conv_direct.py (non-stride-multiple kernels run
zero-extended with the update gradient projected back onto the real
support -- see pallas_conv_direct._geometry and the `supp` mask):

  grid = (num_steps,) or (num_steps, batch_tiles) -- TPU grid cells
        execute sequentially, so the packed dictionary (dstk), the
        Hessian diagonal and the Lipschitz eigenvector live in
        VMEM-resident output blocks that carry across steps; the
        per-step image-block canvases stream HBM->VMEM with automatic
        double buffering.
  per step (all HIGHEST-precision MXU matmuls, state in VMEM):
      dall  = per-part transposes of dstk       (analysis weights)
      G     = dall dall^T                       (flat-kernel Gram)
      v     = power^k(G, v); eta = 1/(v^T G v)  (warm Lipschitz)
      corr  = dall @ rolled(xcv)                (b-term A(mask*X))
      FISTA on the code canvas (pltpu.roll shifts, deep-contraction
        matmuls -- identical math to conv_direct_solve_pallas)
      h     = 0.99 h + mean_b(sum_spatial codes^2)/100   (conv EMA)
      dstk <- renorm(dstk - lr * Fnorm_rescale(grad / (h + eps))),
        with grad = (mask*(dstk@zstack) - xcv) @ zstack^T / b the
        stride-block-space kernel gradient (== ops/pallas_conv_direct.
        dictionary_gradient_from_block_stats), upd_num_iters times.

Semantics are identical (same float32 contract) to the composition
`lipschitz.power_iterate` + `training.sparse_coding.build_raw_step_fn`
in convolutional mode with the block update formulation -- trajectory
equivalence is tested in tests/test_pallas_conv_train.py.  Reference
semantics mirrored: convolutional/ista_fista.py:100-195 (solve),
dict_update_rules/convolutional/sc_steepest_descent.py:59-73 and
sc_cheap_quadratic_descent.py:64-79 (masked-residual kernel gradient,
Hessian scaling THEN Frobenius-norm rescale, per-kernel renorm),
training/sparse_coding.py:158-161 (conv Hessian-diagonal EMA).

Per-kernel reductions over the packed (cpx, R*s) dictionary layout
(Hessian scaling, renormalization) are 0/1 selection-matrix matmuls
(`sel` / `selT`), not gathers -- kernel j owns columns {r*s + j}.

Batch tiling (grid (step, tile)): the kernel gradient is additive over
batch tiles, so tiles accumulate `grad` / the Hessian statistic in VMEM
scratch and the step's LAST tile applies the update.  With
upd_num_iters == 1 the gradient accumulates directly (any mask); with
more iterations and a stride-block-uniform mask (the reference
config's padding is stride-aligned) the tiles instead accumulate the
gram-form stats C_m = (Z o m) Z^T and B_x = X Z^T, whose recombination
(D' C_m - B_x)/b is the exact gradient at ANY dictionary -- so the
last tile runs exact multi-iteration updates
(`fused_conv_segment_supported` gates the combination).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vtc_tpu.ops.pallas_train_step import _pin_hbm
from vtc_tpu.ops.pallas_common import (make_threshold,
                                       pick_divisor_batch_tile)
from vtc_tpu.ops.pallas_conv_direct import (_VMEM_LIMIT, _blockify,
                                            _block_mask_canvas,
                                            _geometry, _pack_weights,
                                            _to_canvas, _unpack_dstk,
                                            supported as _geo_supported)

_HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
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


# single-pass bf16 MXU variant (f32 accumulate) for the opt-in
# training-speed mode (mxu_bf16; see ops/pallas_train_step.py): used
# ONLY by the tile solver's deep-contraction matmuls.  Every
# update-path matmul (residual form included) and the gram-form
# accumulators stay HIGHEST: a converged residual sinks below the bf16
# absolute error of the synthesis product, and C D' - B is a small
# difference of large matrices -- both measured to wreck training
# (BENCH_NOTES UPDATE 20).
def _b16(x):
  return x.astype(jnp.bfloat16)


def _dot_b(a, b):
  return jax.lax.dot_general(_b16(a), _b16(b), (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)


def _fits(tile, geo):
  """VMEM working set of one batch tile (solve + update buffers).

  The 2.8x factor on the named-buffer row count calibrates for
  Mosaic's scoped-stack accounting of loop-body transients (measured:
  tile=10 at the reference geometry allocates 115.7 MB against a
  named-buffer estimate of 42.6 MB).  The tile-independent (R*s, R*s)
  gram accumulator (C_m, worst case) is budgeted explicitly."""
  s, cpx, r = geo["s"], geo["cpx"], geo["r"]
  rows = 6 * s + 3 * cpx + r * max(s, cpx)
  fixed = 4 * (r * s) ** 2
  return (4 * rows * tile * geo["ells"] * 2.8 + fixed
          <= int(_VMEM_LIMIT * 0.9))


def _pick_tile(b, geo):
  """(tile, num_tiles): whole batch if it fits, else the largest
  divisor-preferring tile (mirrors pallas_conv_direct._pick_batch_tile
  but with the update working set included)."""
  if _fits(b, geo):
    return b, 1
  tile = pick_divisor_batch_tile(b, lambda t: _fits(t, geo))
  if tile is None:
    return None, None
  return tile, -(-b // tile)


def _mask_block_uniform(padding, kernel_stride):
  """True when the padding mask is constant within every stride block
  (each padding amount is a multiple of the corresponding stride), so
  the mask factors as 1_cpx (x) m_lanes and the masked gradient has an
  exact gram form (D' Zm Z^T)."""
  if padding is None:
    return True
  (pv0, pv1), (ph0, ph1) = padding
  sv, sh_ = kernel_stride
  return (pv0 % sv == 0 and pv1 % sv == 0
          and ph0 % sh_ == 0 and ph1 % sh_ == 0)


def gram_stats_supported(img_shape, dict_shape, kernel_stride, padding):
  """True when the gram-form update stats (C_m, B_x) are exact: the
  mask must factor per stride block, which needs BOTH stride-multiple
  padding amounts AND no kernel zero-extension (the extension zeroes
  individual pixels WITHIN the trailing blocks, breaking the
  1_cpx (x) m_lanes factorization -- pallas_conv_direct._geometry)."""
  if not _mask_block_uniform(padding, kernel_stride):
    return False
  _, _, kh, kw = dict_shape
  sv, sh_ = kernel_stride
  return kh % sv == 0 and kw % sh_ == 0


def fused_conv_segment_supported(img_shape, dict_shape, kernel_stride,
                                 inference_alg, update_alg, *,
                                 group_assignments=None,
                                 upd_num_iters=1, padding=None,
                                 early_stopping_epsilon=None):
  """True when `fused_conv_train_segment_pallas` covers this config.

  ``padding`` (optional) enables the batch-tiled + upd_num_iters > 1
  combination when the mask is stride-block-uniform (the reference
  config's padding is stride-aligned); without it that combination is
  conservatively rejected.  In-kernel early stopping
  (``early_stopping_epsilon``) additionally needs the whole batch as
  ONE tile: the stop test is a batch-global mean that independent
  tiles cannot share (covers the reference's own conv config, batch 5;
  cross-tile batches keep the XLA per-step path)."""
  if group_assignments is not None:
    return False
  if inference_alg not in ("ista", "fista"):
    return False
  if update_alg not in ("sc_steepest_descent",
                        "sc_cheap_quadratic_descent"):
    return False
  kernel_stride = tuple(int(x) for x in kernel_stride)
  if not _geo_supported(img_shape, dict_shape, kernel_stride):
    return False
  geo = _geometry(img_shape, dict_shape, kernel_stride)
  if geo["s"] > geo["r"] * geo["cpx"]:
    return False  # flat-kernel Gram must be the (s, s) one
  tile, num_tiles = _pick_tile(img_shape[0], geo)
  if tile is None:
    return False
  if early_stopping_epsilon is not None and num_tiles != 1:
    return False
  if num_tiles == 1 or int(upd_num_iters) == 1:
    return True
  # batch-tiled + multi-iteration updates need the gram-form
  # accumulators (C_m = Zm Z^T, B_x = X Z^T), exact only for a
  # block-factorizable mask (block-uniform padding, no zero-extension)
  return padding is not None and gram_stats_supported(
      img_shape, dict_shape, kernel_stride,
      tuple(tuple(int(x) for x in p) for p in padding))


def _selection_matrices(geo):
  """sel (R*s, s) with sel[r*s+j, j] = 1; kernel j's per-part columns."""
  s, r = geo["s"], geo["r"]
  sel = np.zeros((r * s, s), np.float32)
  for rr in range(r):
    sel[rr * s + np.arange(s), np.arange(s)] = 1.0
  return sel, np.ascontiguousarray(sel.T)


def _placement_matrices(geo):
  """pmats (R, cpx, R*cpx) with pmats[r, i, r*cpx+i] = 1: the analysis
  weight matrix is the pure matmul accumulation
    dall = sum_r dstk[:, r*s:(r+1)*s]^T @ pmats[r]
  (per-part transpose + lane placement with no strided stores)."""
  cpx, r = geo["cpx"], geo["r"]
  p = np.zeros((r, cpx, r * cpx), np.float32)
  for rr in range(r):
    p[rr, np.arange(cpx), rr * cpx + np.arange(cpx)] = 1.0
  return p


def _split_hi_lo(x):
  """bf16 hi + lo split (the bf16x3 3-pass operand form; see
  ops/pallas_train_step._make_iter_dot)."""
  hi = x.astype(jnp.bfloat16)
  lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
  return hi, lo


def _make_deep_dot(mxu):
  """(prep(weights) -> operand, deep_dot(operand, stack_slice)) for the
  solver's deep-contraction matmuls at the requested tier.  'bf16x3'
  splits the (constant-per-step) weights once and the stack slice per
  use: 3 single-pass products vs HIGHEST's 6, ~1e-4 accuracy."""
  if mxu == "bf16":
    return _b16, _dot_b
  if mxu == "bf16x3":
    def deep_dot(w, b):
      w_hi, w_lo = w
      b_hi, b_lo = _split_hi_lo(b)
      return (_dot_b(w_hi, b_hi) + _dot_b(w_lo, b_hi)
              + _dot_b(w_hi, b_lo))

    return _split_hi_lo, deep_dot
  if mxu == "bf16x5":
    from vtc_tpu.ops.pallas_train_step import _split3

    def deep_dot(w, b):
      w_hi, w_mid, w_lo = w
      b_hi, b_mid, b_lo = _split3(b)
      return (_dot_b(w_hi, b_hi)
              + _dot_b(w_mid, b_hi) + _dot_b(w_hi, b_mid)
              + _dot_b(w_lo, b_hi) + _dot_b(w_hi, b_lo))

    return _split3, deep_dot
  assert mxu == "highest", mxu  # no silent fall-through on typos
  return (lambda w: w), _dot


def _make_tile_solver(variant, nonneg, hard, geo, tl, mxu="highest",
                      early_eps=None):
  """FISTA/ISTA solve of one batch tile on the code canvas (shared by
  the segment kernel and the DP solve+stats kernel).  Returns
  codes (s, tl); `stack` is the caller's VMEM scratch.

  ``early_eps`` switches the fori_loop to the reference stop rule
  (convolutional/ista_fista.py:156-195 semantics, same rule as
  ops/pallas_conv_direct): mean |codes - old| / eta < eps after the
  first iteration, over the REAL element count (padded canvas / batch
  positions hold exact zeros every iteration, so the canvas |delta|
  sum IS the real-element sum).  The caller then passes ``inv_count``
  (1 / real element count) to ``solve``.  Exact only when the tile is
  the whole (per-chip) batch -- callers gate.  ``solve``'s optional
  ``stop_reduce`` maps the tile-local |delta| sum to the batch-global
  one (identity when None; the DP kernel passes an in-kernel slot
  all-reduce built on ITS refs, so every chip takes the identical trip
  count)."""
  use_fista = variant == "fista"
  s, cpx, r = geo["s"], geo["cpx"], geo["r"]
  rolls = geo["rolls"]
  prep_w, deep_dot = _make_deep_dot(mxu)

  threshold = make_threshold(nonneg, hard)

  def solve(dstk, dallv, xcv, mblk, zmask, eta, lam_eta, num_iters,
            stack, inv_count=None, stop_reduce=None):
    dstk_t = prep_w(dstk)    # tier prep once per step, not per iter
    dallv_t = prep_w(dallv)
    for i, roll in enumerate(rolls):
      stack[i * cpx:(i + 1) * cpx, :] = pltpu.roll(xcv, (-roll) % tl, 1)
    corr = deep_dot(dallv_t, stack[0:r * cpx, :])

    def fista_body(_, carry):
      z, old, t_k = carry
      for i, roll in enumerate(rolls):
        stack[i * s:(i + 1) * s, :] = pltpu.roll(z, roll % tl, 1)
      img = deep_dot(dstk_t, stack[0:r * s, :]) * mblk
      for i, roll in enumerate(rolls):
        stack[i * cpx:(i + 1) * cpx, :] = pltpu.roll(
            img, (-roll) % tl, 1)
      grad = deep_dot(dallv_t, stack[0:r * cpx, :]) - corr
      codes = zmask * threshold(z - eta * grad, lam_eta)
      if use_fista:
        t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t_k * t_k)) / 2.0
        beta = (t_k - 1.0) / t_next
        return codes + beta * (codes - old), codes, t_next
      return codes, codes, t_k

    init = jnp.zeros((s, tl), jnp.float32)
    if early_eps is None:
      _, codes, _ = jax.lax.fori_loop(
          0, num_iters, fista_body, (init, init, jnp.float32(1.0)))
      return codes

    def stop_cond(carry):
      j, _, _, _, _, stop = carry
      return jnp.logical_and(j < num_iters, jnp.logical_not(stop))

    def stop_body(carry):
      j, z, old, _, t_k, _ = carry
      z_next, codes, t_next = fista_body(None, (z, old, t_k))
      local = jnp.sum(jnp.abs(codes - old))
      total = local if stop_reduce is None else stop_reduce(local)
      avg_delta = (total * inv_count) / eta
      stop = jnp.logical_and(avg_delta < early_eps, j > 0)
      return j + 1, z_next, codes, codes, t_next, stop

    _, _, _, codes, _, _ = jax.lax.while_loop(
        stop_cond, stop_body,
        (jnp.int32(0), init, init, init, jnp.float32(1.0),
         jnp.bool_(False)))
    return codes

  return solve


def _build_dall(dstk, p_ref, s, r):
  """Analysis weights as a pure matmul accumulation (per-part
  transpose + lane placement; see _placement_matrices) -- dall is a
  permutation of dstk."""
  dallv = _tdot(dstk[:, 0:s], p_ref[0])
  for rr in range(1, r):
    dallv = dallv + _tdot(dstk[:, rr * s:(rr + 1) * s], p_ref[rr])
  return dallv


def _power_refresh(dallv, v_ref, power_iters):
  """Warm Lipschitz refresh on the flat-kernel Gram D_flat D_flat^T
  (rows of dall ARE the flattened kernels up to column order).
  Returns eta; writes the refreshed eigenvector back to v_ref."""
  gram = _dot_t(dallv, dallv)                        # (s, s)
  v = v_ref[:]
  v = v / jnp.sqrt(jnp.sum(v * v))

  def power_body(_, vec):
    w = _dot(vec, gram)
    return w / jnp.sqrt(jnp.sum(w * w))

  v = jax.lax.fori_loop(0, power_iters, power_body, v)
  v_ref[:] = v
  return 1.0 / jnp.sum(_dot(v, gram) * v)


def _make_segment_kernel(variant, nonneg, hard, uses_hessian,
                         renormalize, upd_num_iters, power_iters,
                         lowest_code_val, geo, batch_tile, num_tiles,
                         gram_update=False, has_supp=False,
                         mxu="highest", early_eps=None):
  s, cpx, r = geo["s"], geo["cpx"], geo["r"]
  rolls = geo["rolls"]
  tl = batch_tile * geo["ells"]
  multi = num_tiles > 1
  # the batch-global stop test needs the whole batch in ONE tile
  # (independent tiles cannot share the mean; cross-tile configs keep
  # the XLA per-step path -- fused_conv_segment_supported gates)
  assert early_eps is None or not multi
  solve_tile = _make_tile_solver(variant, nonneg, hard, geo, tl,
                                 mxu=mxu, early_eps=early_eps)

  def kernel(niter_ref, scalars_ref, dstk_hbm, h_ref, v_ref, p_hbm,
             sel_hbm, selt_hbm, mblk_hbm, zmask_hbm, xcv_ref,
             *rest):
    # zero-extended kernels (kernel % stride != 0, see
    # pallas_conv_direct._geometry) append a 0/1 support mask in dstk
    # layout: the update gradient is projected onto the REAL kernel
    # support every iteration so the zero-extension taps stay zero
    # across the whole VMEM-resident segment
    if has_supp:
      supp_hbm, rest = rest[0], rest[1:]
    (d_out, h_out, v_out, codes_out,
     stack, gradacc, statacc, eta_ref, cmacc,
     p_ref, sel_ref, selt_ref, mblk_pin, zmask_pin, *pin_rest) = rest
    supp_ref = pin_rest[0] if has_supp else None
    d_pin, pin_sems = pin_rest[-2], pin_rest[-1]
    step = pl.program_id(0)
    tile = pl.program_id(1) if multi else None

    first = (step == 0) if tile is None else (step == 0) & (tile == 0)

    @pl.when(first)
    def _():
      # all segment-constant operands ride pl.ANY and pin into VMEM
      # scratch ONCE (see pallas_train_step._pin_hbm) -- notably mblk,
      # the pre-tiled mask block, which is by far the largest operand
      # and was re-fetched (and double-buffered) every grid cell
      _pin_hbm(dstk_hbm, d_pin, pin_sems.at[0])
      d_out[:] = d_pin[:]
      _pin_hbm(p_hbm, p_ref, pin_sems.at[1])
      _pin_hbm(sel_hbm, sel_ref, pin_sems.at[2])
      _pin_hbm(selt_hbm, selt_ref, pin_sems.at[3])
      _pin_hbm(mblk_hbm, mblk_pin, pin_sems.at[4])
      _pin_hbm(zmask_hbm, zmask_pin, pin_sems.at[5])
      if has_supp:
        _pin_hbm(supp_hbm, supp_ref, pin_sems.at[6])
      h_out[:] = h_ref[:]
      v_out[:] = v_ref[:]

    num_iters = niter_ref[0]
    sw = scalars_ref[0]
    upd_step = scalars_ref[1]
    inv_b = scalars_ref[2]

    dstk = d_out[:]
    dallv = _build_dall(dstk, p_ref, s, r)

    def refresh():
      eta_ref[0] = _power_refresh(dallv, v_out, power_iters)
      if multi:
        gradacc[:] = jnp.zeros_like(gradacc)
        statacc[:] = jnp.zeros_like(statacc)
        if gram_update:
          cmacc[:] = jnp.zeros_like(cmacc)

    if multi:
      pl.when(tile == 0)(refresh)
    else:
      refresh()

    eta = eta_ref[0]
    xcv = xcv_ref[0]
    mblk = mblk_pin[:]    # pre-tiled (cpx, tl) on the host side
    zmask = zmask_pin[:]  # pre-tiled (1, tl)
    codes = solve_tile(
        dstk, dallv, xcv, mblk, zmask, eta, sw * eta, num_iters, stack,
        inv_count=None if early_eps is None else scalars_ref[3])
    codes_out[:] = codes

    # D-independent rolled code stack for the update (synthesis layout)
    for i, roll in enumerate(rolls):
      stack[i * s:(i + 1) * s, :] = pltpu.roll(codes, roll % tl, 1)
    zstack = stack[0:r * s, :]
    ones_row = jnp.ones((1, tl), jnp.float32)
    stat = _dot_t(ones_row, codes * codes)           # (1, s) spatial sum

    def finish(stat_sum, grad_fn):
      """Hessian EMA + update iterations (runs on the step's last
      tile).  grad_fn(d) is the masked-residual block-space gradient
      at dictionary d -- exact multi-iteration semantics except the
      grad-at-init accumulation variant (constant grad_fn)."""
      if uses_hessian:
        hessian = 0.99 * h_out[:] + (stat_sum * inv_b) / 100.0
        h_out[:] = hessian
        recip = 1.0 / (hessian + lowest_code_val)    # (1, s)
        scale_row = _dot(recip, selt_ref[:])         # (1, R*s)

      def update_body(_, d):
        grad = grad_fn(d)
        if has_supp:
          # project onto the real kernel support BEFORE the Frobenius
          # rescale (the reference's gradient only has real-support
          # entries, sc_steepest_descent.py:59-69)
          grad = grad * supp_ref[:]
        if uses_hessian:
          grad = grad * scale_row
        # dimensionless stepsize (reference sc_steepest_descent.py:68):
        # rescale to the dictionary's Frobenius norm AFTER the Hessian
        # scaling (division order, sc_cheap_quadratic_descent.py:72-75)
        gn = jnp.sqrt(jnp.sum(grad * grad))
        dn = jnp.sqrt(jnp.sum(d * d))
        grad = grad * (dn / jnp.maximum(gn, 1e-30))
        d = d - upd_step * grad
        if renormalize:
          colsq = jnp.sum(d * d, axis=0, keepdims=True)  # (1, R*s)
          norms2 = _dot(colsq, sel_ref[:])               # (1, s)
          inv = jax.lax.rsqrt(jnp.maximum(norms2, 1e-30))
          d = d * _dot(inv, selt_ref[:])
        return d

      d_out[:] = jax.lax.fori_loop(0, upd_num_iters, update_body, dstk)

    if multi:
      statacc[:] = statacc[:] + stat
      if gram_update:
        # gram-form accumulators (block-uniform mask: M = 1_cpx (x) m,
        # so (D'Z o M) Z^T = D' (Z o m) Z^T): grad at ANY dictionary
        # D' is (D' C_m - B_x)/b, enabling exact multi-iteration
        # updates on the last tile
        m_row = mblk[0:1, :]
        cmacc[:] = cmacc[:] + _dot_t(zstack * m_row, zstack)
        gradacc[:] = gradacc[:] + _dot_t(xcv, zstack)  # B_x

        @pl.when(tile == num_tiles - 1)
        def _():
          cm, bx = cmacc[:], gradacc[:]
          finish(statacc[:],
                 lambda d: (_dot(d, cm) - bx) * inv_b)
      else:
        # update matmuls stay HIGHEST even under mxu_bf16: converged
        # residuals sink below the bf16 absolute error of the synthesis
        # product, turning the gradient into noise (see
        # ops/pallas_train_step._make_kernel)
        img2 = _dot(dstk, zstack) * mblk
        gradacc[:] = gradacc[:] + _dot_t(img2 - xcv, zstack)

        @pl.when(tile == num_tiles - 1)
        def _():
          g0 = gradacc[:] * inv_b
          finish(statacc[:], lambda d: g0)
    else:
      finish(stat, lambda d: _dot_t(_dot(d, zstack) * mblk - xcv,
                                    zstack) * inv_b)

  return kernel


def _segment_canvases(batches, geo, b_pad, mask_img):
  """(k, b, c, H, W) -> (k, cpx, b_pad*ells) per-step image-block
  canvases of the masked images."""

  def one(img_batch):
    return _to_canvas(_blockify(mask_img * img_batch, geo), geo["cpx"],
                      geo, b_pad)

  return jax.vmap(one)(batches)


def fused_conv_train_segment_pallas(dictionary, hessian, eigvec,
                                    batches, sparsity_weight,
                                    inf_num_iters, upd_stepsize, *,
                                    kernel_stride, padding,
                                    variant="fista",
                                    update_alg=(
                                        "sc_cheap_quadratic_descent"),
                                    upd_num_iters=1, nonneg=False,
                                    hard=False, renormalize=True,
                                    power_iters=12,
                                    lowest_code_val=0.001,
                                    batch_tile=None, interpret=False,
                                    mxu="highest",
                                    early_stopping_epsilon=None):
  """Run `batches.shape[0]` fused conv train steps in one launch.

  ``mxu`` is the opt-in training-speed tier for the solver's
  deep-contraction matmuls: 'highest' (parity default) | 'bf16x3'
  (3-pass split, ~1e-4 code accuracy -- tracks f32 training) | 'bf16'
  (single pass, ~1e-1, screening grade).  The Lipschitz refresh and
  ALL update-path matmuls stay HIGHEST in every tier (converged
  residuals sink below bf16 noise).

  Args:
    dictionary: (s, c, kh, kw) float32 kernels.
    hessian: (s,) conv Hessian-diagonal EMA (ignored for steepest
      descent).
    eigvec: (s,) warm Lipschitz eigenvector of the flat-kernel Gram
      (lipschitz.top_gram_eigenpair(D.reshape(s, -1)) seed).
    batches: (k, b, c, H, W) float32 padded image batches.
    kernel_stride / padding: static conv geometry (must pass
      `fused_conv_segment_supported`).
    power_iters: warm refresh iterations per step (12 robust default;
      the trainer passes 2 from an exact seed, see
      ops/pallas_train_step.fused_train_segment_pallas).

  Returns:
    (new_dictionary (s, c, kh, kw), new_hessian (s,), new_eigvec (s,),
     last_codes (b, s, code_h, code_w) of the FINAL step).
  """
  kernel_stride = tuple(int(x) for x in kernel_stride)
  padding_static = (None if padding is None else
                    tuple(tuple(int(x) for x in p) for p in padding))
  return _fused_conv_impl(
      jnp.asarray(dictionary, jnp.float32),
      jnp.asarray(hessian, jnp.float32),
      jnp.asarray(eigvec, jnp.float32),
      jnp.asarray(batches, jnp.float32),
      jnp.asarray(sparsity_weight, jnp.float32),
      jnp.asarray(inf_num_iters, jnp.int32),
      jnp.asarray(upd_stepsize, jnp.float32),
      kernel_stride=kernel_stride, padding=padding_static,
      variant=variant, update_alg=update_alg,
      upd_num_iters=int(upd_num_iters), nonneg=bool(nonneg),
      hard=bool(hard), renormalize=bool(renormalize),
      power_iters=int(power_iters),
      lowest_code_val=float(lowest_code_val),
      batch_tile=None if batch_tile is None else int(batch_tile),
      interpret=bool(interpret), mxu=str(mxu),
      early_eps=(None if early_stopping_epsilon is None
                 else float(early_stopping_epsilon)))


@functools.partial(
    jax.jit,
    static_argnames=("kernel_stride", "padding", "variant", "update_alg",
                     "upd_num_iters", "nonneg", "hard", "renormalize",
                     "power_iters", "lowest_code_val", "batch_tile",
                     "interpret", "mxu", "early_eps"))
def _fused_conv_impl(dictionary, hessian, eigvec, batches,
                     sparsity_weight, inf_num_iters, upd_stepsize, *,
                     kernel_stride, padding, variant, update_alg,
                     upd_num_iters, nonneg, hard, renormalize,
                     power_iters, lowest_code_val, batch_tile,
                     interpret, mxu="highest", early_eps=None):
  k, b = batches.shape[0], batches.shape[1]
  img_shape = batches.shape[1:]
  geo = _geometry(img_shape, dictionary.shape, kernel_stride)
  s, cpx = geo["s"], geo["cpx"]
  if batch_tile is not None:
    tile, num_tiles = min(batch_tile, b), -(-b // min(batch_tile, b))
  else:
    tile, num_tiles = _pick_tile(b, geo)
  assert tile is not None, "caller must check fused_conv_segment_supported"
  assert early_eps is None or num_tiles == 1, (
      "in-kernel early stopping needs the whole batch in one tile "
      "(caller must check fused_conv_segment_supported)")
  gram_update = (num_tiles > 1 and upd_num_iters > 1)
  assert not gram_update or gram_stats_supported(
      img_shape, dictionary.shape, kernel_stride, padding), (
      "batch-tiled multi-iteration updates need a block-factorizable "
      "mask (caller must check fused_conv_segment_supported)")
  b_pad = tile * num_tiles
  tl = tile * geo["ells"]
  uses_hessian = update_alg == "sc_cheap_quadratic_descent"

  from vtc_tpu.ops.precision import matmul_precision
  with matmul_precision():
    mask_img, mblk_cv = _block_mask_canvas(img_shape, padding, geo)
    dstk0, _ = _pack_weights(dictionary, geo)
    xcv_all = _segment_canvases(batches, geo, b_pad, mask_img)

  zmask_np = np.zeros((1, geo["rc"], geo["wc"]), np.float32)
  zmask_np[0, :geo["code_h"], :geo["code_w"]] = 1.0
  zmask_cv = _to_canvas(jnp.asarray(zmask_np)[None], 1, geo, 1)
  sel, selt = _selection_matrices(geo)
  pmats = _placement_matrices(geo)

  h_in = hessian.reshape(1, s)
  v_in = eigvec.reshape(1, s)
  # real element count for the early-stop mean (matches
  # pallas_conv_direct: padded canvas/batch positions are exact zeros)
  scalars = jnp.stack([sparsity_weight, upd_stepsize,
                       jnp.float32(1.0 / b),
                       jnp.float32(1.0 / (b * s * geo["code_h"]
                                          * geo["code_w"]))])
  niter = inf_num_iters.reshape(1)

  # kernel % stride != 0: the packed dictionary carries zero-extension
  # taps (pallas_conv_direct._geometry); the in-kernel update projects
  # the gradient onto the real support with this 0/1 dstk-layout mask
  has_supp = bool(geo["ekh"] or geo["ekw"])
  if has_supp:
    supp0, _ = _pack_weights(
        jnp.ones(dictionary.shape, jnp.float32), geo)

  kernel = _make_segment_kernel(
      variant, nonneg, hard, uses_hessian, renormalize, upd_num_iters,
      power_iters, lowest_code_val, geo, tile, num_tiles,
      gram_update=gram_update, has_supp=has_supp, mxu=mxu,
      early_eps=early_eps)
  grid = (k,) if num_tiles == 1 else (k, num_tiles)
  if num_tiles == 1:
    bcast = lambda shape: pl.BlockSpec(shape, lambda i, *_: (0,) * len(
        shape))
    xcv_spec = pl.BlockSpec((1, cpx, tl), lambda i, *_: (i, 0, 0))
    out_tile = lambda rows: pl.BlockSpec((rows, tl),
                                         lambda i, *_: (0, 0))
  else:
    bcast = lambda shape: pl.BlockSpec(shape, lambda i, j, *_: (0,) *
                                       len(shape))
    xcv_spec = pl.BlockSpec((1, cpx, tl), lambda i, j, *_: (i, 0, j))
    out_tile = lambda rows: pl.BlockSpec((rows, tl),
                                         lambda i, j, *_: (0, j))

  d_new, h_new, v_new, codes = pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=2,
          grid=grid,
          in_specs=[
              pl.BlockSpec(memory_space=pl.ANY),  # dstk (pinned)
              bcast((1, s)),               # hessian
              bcast((1, s)),               # eigvec
              pl.BlockSpec(memory_space=pl.ANY),  # pmats (pinned)
              pl.BlockSpec(memory_space=pl.ANY),  # sel (pinned)
              pl.BlockSpec(memory_space=pl.ANY),  # selT (pinned)
              pl.BlockSpec(memory_space=pl.ANY),  # mblk (pinned)
              pl.BlockSpec(memory_space=pl.ANY),  # zmask (pinned)
              xcv_spec,
          ] + ([pl.BlockSpec(memory_space=pl.ANY)]
               if has_supp else []),       # supp mask (pinned)
          out_specs=[
              bcast(dstk0.shape),
              bcast((1, s)),
              bcast((1, s)),
              out_tile(s),
          ],
          scratch_shapes=[
              pltpu.VMEM((geo["r"] * max(s, cpx), tl), jnp.float32),
              pltpu.VMEM(dstk0.shape, jnp.float32),     # gradacc / B_x
              pltpu.VMEM((1, s), jnp.float32),          # statacc
              pltpu.SMEM((1,), jnp.float32),            # eta
              pltpu.VMEM(                               # C_m accumulator
                  (geo["r"] * s, geo["r"] * s) if gram_update
                  else (1, 1), jnp.float32),
              pltpu.VMEM(pmats.shape, jnp.float32),     # pmats pin
              pltpu.VMEM(sel.shape, jnp.float32),       # sel pin
              pltpu.VMEM(selt.shape, jnp.float32),      # selT pin
              pltpu.VMEM((cpx, tl), jnp.float32),       # mblk pin
              pltpu.VMEM((1, tl), jnp.float32),         # zmask pin
          ] + ([pltpu.VMEM(dstk0.shape, jnp.float32)]
               if has_supp else []) + [
              pltpu.VMEM(dstk0.shape, jnp.float32),     # d pin landing
              pltpu.SemaphoreType.DMA((7,)),
          ]),
      out_shape=[
          jax.ShapeDtypeStruct(dstk0.shape, jnp.float32),
          jax.ShapeDtypeStruct((1, s), jnp.float32),
          jax.ShapeDtypeStruct((1, s), jnp.float32),
          jax.ShapeDtypeStruct((s, b_pad * geo["ells"]), jnp.float32),
      ],
      interpret=interpret,
      compiler_params=(None if interpret else pltpu.CompilerParams(
          vmem_limit_bytes=_VMEM_LIMIT)),
      cost_estimate=pl.CostEstimate(
          flops=k * 2 * 2 * s * geo["r"] * cpx * b_pad * geo["ell"] * 30,
          bytes_accessed=4 * k * (2 * cpx * b_pad * geo["ell"]),
          transcendentals=0),
  )(niter, scalars, jnp.asarray(dstk0), h_in, v_in, jnp.asarray(pmats),
    jnp.asarray(sel), jnp.asarray(selt), jnp.tile(mblk_cv, (1, tile)),
    jnp.tile(zmask_cv, (1, tile)), xcv_all,
    *((jnp.asarray(supp0),) if has_supp else ()))

  new_dict = _unpack_dstk(d_new, geo, dictionary.shape)
  canv = codes.reshape(s, b_pad, geo["ells"])[:, :, :geo["ell"]].reshape(
      s, b_pad, geo["rc"], geo["wc"]).transpose(1, 0, 2, 3)
  last_codes = canv[:b, :, :geo["code_h"], :geo["code_w"]]
  return new_dict, h_new[0], v_new[0], last_codes


def conv_solve_stats_supported(img_shape, dict_shape, kernel_stride,
                               inference_alg, update_alg, *,
                               upd_num_iters=1, padding=None):
  """True when `conv_solve_stats_pallas` covers this configuration
  (the DP local step).  upd_num_iters == 1 always works (the psum'd
  gradient is exact at the solve dictionary); more iterations need
  the gram-form stats, i.e. a stride-block-uniform mask."""
  if not fused_conv_segment_supported(
      img_shape, dict_shape, kernel_stride, inference_alg, update_alg,
      upd_num_iters=1):
    return False
  if int(upd_num_iters) == 1:
    return True
  return padding is not None and gram_stats_supported(
      img_shape, dict_shape, tuple(int(x) for x in kernel_stride),
      tuple(tuple(int(x) for x in p) for p in padding))


def _make_stats_kernel(variant, nonneg, hard, power_iters, geo,
                       batch_tile, num_tiles, emit_gram=False,
                       mxu="highest"):
  s, cpx, r = geo["s"], geo["cpx"], geo["r"]
  rolls = geo["rolls"]
  tl = batch_tile * geo["ells"]
  solve_tile = _make_tile_solver(variant, nonneg, hard, geo, tl,
                                 mxu=mxu)


  def kernel(niter_ref, scalars_ref, dstk_ref, v_ref, p_ref, mblk_ref,
             zmask_ref, xcv_ref,
             codes_out, grad_out, stat_out, v_out, eta_out, cm_out,
             stack, eta_ref):
    tile = pl.program_id(0)
    num_iters = niter_ref[0]
    sw = scalars_ref[0]

    dstk = dstk_ref[:]
    dallv = _build_dall(dstk, p_ref, s, r)

    @pl.when(tile == 0)
    def _():
      v_out[:] = v_ref[:]
      eta = _power_refresh(dallv, v_out, power_iters)
      eta_ref[0] = eta
      eta_out[0, 0] = eta
      grad_out[:] = jnp.zeros_like(grad_out)
      stat_out[:] = jnp.zeros_like(stat_out)
      if emit_gram:
        cm_out[:] = jnp.zeros_like(cm_out)

    eta = eta_ref[0]
    xcv = xcv_ref[:]
    mblk = mblk_ref[:]
    zmask = zmask_ref[:]
    codes = solve_tile(dstk, dallv, xcv, mblk, zmask, eta, sw * eta,
                       num_iters, stack)
    codes_out[:] = codes

    # this tile's UNAVERAGED block-space update statistics (additive
    # over tiles AND over DP shards: the caller psums then divides by
    # the global batch)
    for i, roll in enumerate(rolls):
      stack[i * s:(i + 1) * s, :] = pltpu.roll(codes, roll % tl, 1)
    zstack = stack[0:r * s, :]
    if emit_gram:
      # gram form (block-uniform mask): C_m = (Z o m) Z^T and
      # B_x = X Z^T -- grad at ANY D' is (D' C_m - B_x)/b, so the
      # caller can run multi-iteration updates after the psum
      m_row = mblk[0:1, :]
      cm_out[:] = cm_out[:] + _dot_t(zstack * m_row, zstack)
      grad_out[:] = grad_out[:] + _dot_t(xcv, zstack)  # B_x
    else:
      # HIGHEST even under mxu_bf16: converged residuals sink below
      # bf16 noise (see ops/pallas_train_step._make_kernel)
      img = _dot(dstk, zstack) * mblk
      grad_out[:] = grad_out[:] + _dot_t(img - xcv, zstack)
    ones_row = jnp.ones((1, tl), jnp.float32)
    stat_out[:] = stat_out[:] + _dot_t(ones_row, codes * codes)

  return kernel


def conv_solve_stats_pallas(dictionary, eigvec, batch, sparsity_weight,
                            inf_num_iters, *, kernel_stride, padding,
                            variant="fista", nonneg=False, hard=False,
                            power_iters=12, gram_stats=False,
                            interpret=False, mxu="highest"):
  """One fused kernel: warm Lipschitz refresh + the whole conv FISTA
  solve + this batch's (shard's) block-space update statistics.

  With ``gram_stats=False`` returns (codes (b, s, ch, cw),
  grad_sum (s, c, kh, kw), stat (s,), new_eigvec (s,), eta):
  `grad_sum` is the UNAVERAGED masked-residual kernel gradient summed
  over this batch; the full-batch gradient at the solve dictionary is
  exactly sum_shards(grad_sum) / global_b, so a data-parallel caller
  psums (grad_sum, stat) once per step and runs a single update
  replicated (ops/pallas_train_step.fused_solve_stats_pallas is the
  fc counterpart).

  With ``gram_stats=True`` (needs a stride-block-uniform mask, see
  `_mask_block_uniform`) returns (codes, bx (cpx, R*s),
  cm (R*s, R*s), stat, new_eigvec, eta) in PACKED block space: the
  gradient at ANY dictionary D' is
  (_pack_weights(D')[0] @ sum(cm) - sum(bx)) / global_b, enabling
  multi-iteration replicated updates after the psum.
  """
  kernel_stride = tuple(int(x) for x in kernel_stride)
  padding_static = (None if padding is None else
                    tuple(tuple(int(x) for x in p) for p in padding))
  if gram_stats:
    assert gram_stats_supported(np.shape(batch), np.shape(dictionary),
                                kernel_stride, padding_static), (
        "gram_stats needs a block-factorizable mask")
  return _conv_solve_stats_impl(
      jnp.asarray(dictionary, jnp.float32),
      jnp.asarray(eigvec, jnp.float32),
      jnp.asarray(batch, jnp.float32),
      jnp.asarray(sparsity_weight, jnp.float32),
      jnp.asarray(inf_num_iters, jnp.int32),
      kernel_stride=kernel_stride, padding=padding_static,
      variant=variant, nonneg=bool(nonneg), hard=bool(hard),
      power_iters=int(power_iters), gram_stats=bool(gram_stats),
      interpret=bool(interpret), mxu=str(mxu))


@functools.partial(
    jax.jit,
    static_argnames=("kernel_stride", "padding", "variant", "nonneg",
                     "hard", "power_iters", "gram_stats", "interpret",
                     "mxu"))
def _conv_solve_stats_impl(dictionary, eigvec, batch, sparsity_weight,
                           inf_num_iters, *, kernel_stride, padding,
                           variant, nonneg, hard, power_iters,
                           gram_stats, interpret, mxu="highest"):
  b = batch.shape[0]
  img_shape = batch.shape
  geo = _geometry(img_shape, dictionary.shape, kernel_stride)
  s, cpx = geo["s"], geo["cpx"]
  tile, num_tiles = _pick_tile(b, geo)
  assert tile is not None, "caller must check conv_solve_stats_supported"
  b_pad = tile * num_tiles
  tl = tile * geo["ells"]

  from vtc_tpu.ops.precision import matmul_precision
  with matmul_precision():
    mask_img, mblk_cv = _block_mask_canvas(img_shape, padding, geo)
    dstk0, _ = _pack_weights(dictionary, geo)
    xcv = _to_canvas(_blockify(mask_img * batch, geo), cpx, geo, b_pad)

  zmask_np = np.zeros((1, geo["rc"], geo["wc"]), np.float32)
  zmask_np[0, :geo["code_h"], :geo["code_w"]] = 1.0
  zmask_cv = _to_canvas(jnp.asarray(zmask_np)[None], 1, geo, 1)
  pmats = _placement_matrices(geo)

  scalars = sparsity_weight.reshape(1)
  niter = inf_num_iters.reshape(1)

  kernel = _make_stats_kernel(variant, nonneg, hard, power_iters, geo,
                              tile, num_tiles, emit_gram=gram_stats,
                              mxu=mxu)
  bcast = lambda shape: pl.BlockSpec(shape, lambda j, *_: (0,) *
                                     len(shape))
  tile_spec = lambda rows: pl.BlockSpec((rows, tl),
                                        lambda j, *_: (0, j))
  codes, grad, stat, v_new, eta, cm = pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=2,
          grid=(num_tiles,),
          in_specs=[
              bcast(dstk0.shape),
              bcast((1, s)),
              bcast(pmats.shape),
              bcast((cpx, tl)),
              bcast((1, tl)),
              tile_spec(cpx),
          ],
          out_specs=[
              tile_spec(s),
              bcast(dstk0.shape),
              bcast((1, s)),
              bcast((1, s)),
              bcast((1, 1)),
              bcast((geo["r"] * s, geo["r"] * s) if gram_stats
                    else (1, 1)),
          ],
          scratch_shapes=[
              pltpu.VMEM((geo["r"] * max(s, cpx), tl), jnp.float32),
              pltpu.SMEM((1,), jnp.float32),
          ]),
      out_shape=[
          jax.ShapeDtypeStruct((s, b_pad * geo["ells"]), jnp.float32),
          jax.ShapeDtypeStruct(dstk0.shape, jnp.float32),
          jax.ShapeDtypeStruct((1, s), jnp.float32),
          jax.ShapeDtypeStruct((1, s), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
          jax.ShapeDtypeStruct(
              (geo["r"] * s, geo["r"] * s) if gram_stats else (1, 1),
              jnp.float32),
      ],
      interpret=interpret,
      compiler_params=(None if interpret else pltpu.CompilerParams(
          vmem_limit_bytes=_VMEM_LIMIT)),
  )(niter, scalars, jnp.asarray(dstk0), eigvec.reshape(1, s),
    jnp.asarray(pmats), jnp.tile(mblk_cv, (1, tile)),
    jnp.tile(zmask_cv, (1, tile)), xcv)

  canv = codes.reshape(s, b_pad, geo["ells"])[:, :, :geo["ell"]].reshape(
      s, b_pad, geo["rc"], geo["wc"]).transpose(1, 0, 2, 3)
  codes_out = canv[:b, :, :geo["code_h"], :geo["code_w"]]
  if gram_stats:
    return codes_out, grad, cm, stat[0], v_new[0], eta[0, 0]
  grad_kernel = _unpack_dstk(grad, geo, dictionary.shape)
  return codes_out, grad_kernel, stat[0], v_new[0], eta[0, 0]
