"""Fused direct-formulation Pallas kernel for the conv ISTA/FISTA solver.

The conv iteration is grad(z) = A(mask * S(z)) - A(mask * X) (reference
convolutional/ista_fista.py:152-195, with the padding mask folded in).
In the stride-block formulation synthesis and analysis become BLOCK
matmuls with a deep contraction and no border special-casing.  Kernel
dims that are NOT multiples of the strides are zero-EXTENDED to the
next multiple (with matching trailing zero rows/cols on the padded
image): the zero taps contribute nothing in either direction and the
appended image rows receive only zero-tap writes, so codes and
gradients at the real kernel support are exact (see _geometry).  With
stride-multiple kernels (the reference's own configuration: 16x16
kernels, stride 8) the extension is empty:

  * the padded image splits into non-overlapping stride-sized blocks
    (sv x sh pixels); a kh x kw kernel covers R = (kh/sv)*(kw/sh)
    whole blocks, so

      S(z)[block B] = sum_a Dpart[a]^T z[B - a]        (a in R offsets)
      A(y)[code c]  = sum_a Dpart[a]   y[c + a]

    with Dpart[a] the (s, c*sv*sh) kernel sub-block -- ONE
    (c*sv*sh, R*s) and ONE (s, R*c*sv*sh) matmul per iteration whose
    contraction depth R*64 >> s runs the MXU far better than the
    9-offset (s, s) channel-mix gram operator (measured 44% vs 21% of
    the f32-parity roofline at the reference geometry).
  * the padding mask is applied ELEMENTWISE in image-block space --
    no inclusion-exclusion border corrections at all (the gram
    kernel's main complexity and cost, ops/pallas_conv_fista.py).

Canvas layout (per sample, channels-in-sublanes): the block grid
(Bh x Bw) plus (Ay-1, Ax-1) spare zero rows/cols flattens to ell
lanes; the offset reads z[B - a] / y[c + a] are LANE ROTATES
(pltpu.roll) of the whole tile -- outputs land at lane offset 0, so
unlike shifted-slice matmul operands they trigger no Mosaic relayout
on the matmul path.  Wrapped lanes land only in spare/halo positions,
which the code/image masks zero every iteration.  The R rotated
copies are stored into one VMEM scratch stack whose sublane offsets
are aligned 64-multiples, then contracted in a single deep matmul.

All state (z, momentum, correlation, masks, the stack) stays
VMEM-resident across every iteration; grid is 1-d over batch tiles.
``num_iters`` is a scalar-prefetch arg (schedule changes never
recompile); matmuls run at HIGHEST precision (parity grade).

Reference semantics mirrored: convolutional/ista_fista.py:100-195
(zero/warm init, soft/nonneg/hard thresholds, FISTA momentum).  Early
stopping beyond one batch tile uses the XLA / gram-kernel paths.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vtc_tpu.ops.pallas_common import (LANES as _LANES, make_threshold,
                                       pick_divisor_batch_tile,
                                       round_up)
from vtc_tpu.ops.precision import matmul_precision

_HIGHEST = jax.lax.Precision.HIGHEST
_VMEM_LIMIT = 100 * 1024 * 1024


def _geometry(img_shape, dict_shape, kernel_stride):
  """Stride-block geometry.  Kernels whose dims are NOT multiples of
  the strides are zero-EXTENDED to the next multiple (khp, kwp) and the
  padded image gains matching trailing zero rows/cols (hhe, wwe): the
  zero kernel taps contribute nothing to synthesis or analysis, the
  appended image rows receive only zero-tap writes, and every code
  position's extended window fits -- so codes and gradients at the REAL
  kernel support are exact, while code_h/code_w stay
  1 + (padded - kernel)/stride (the repo's conv contract, matching the
  reference's code_dim_from_padded_img_dim for stride-exact padding)."""
  b, c, hh, ww = img_shape
  s, _, kh, kw = dict_shape
  sv, sh_ = kernel_stride
  khp = -(-kh // sv) * sv
  kwp = -(-kw // sh_) * sh_
  ekh, ekw = khp - kh, kwp - kw
  hhe, wwe = hh + ekh, ww + ekw
  ay, ax = khp // sv, kwp // sh_
  bh, bw = hhe // sv, wwe // sh_
  code_h, code_w = bh - (ay - 1), bw - (ax - 1)
  rc, wc = bh + (ay - 1), bw + (ax - 1)
  ell = rc * wc
  ells = round_up(ell, _LANES)
  px = sv * sh_
  rolls = tuple(a_y * wc + a_x for a_y in range(ay) for a_x in range(ax))
  return dict(s=s, c=c, px=px, cpx=c * px, r=ay * ax, ay=ay, ax=ax,
              sv=sv, sh=sh_, bh=bh, bw=bw, code_h=code_h, code_w=code_w,
              rc=rc, wc=wc, ell=ell, ells=ells, rolls=rolls,
              kh=kh, kw=kw, khp=khp, kwp=kwp, ekh=ekh, ekw=ekw)


def supported(img_shape, dict_shape, kernel_stride):
  """True when the block-matmul geometry applies: the padded image dims
  are stride-exact relative to the kernel ((padded - kernel) % stride
  == 0, the repo's conv shape contract -- non-multiple kernels are
  handled by zero extension, see _geometry) and the per-part weight
  matrices stay MXU-sized."""
  _, c, hh, ww = img_shape
  s, _, kh, kw = dict_shape
  sv, sh_ = kernel_stride
  if (hh - kh) % sv or (ww - kw) % sh_:
    return False
  if c * sv * sh_ > 512 or s > 512:
    return False
  geo = _geometry(img_shape, dict_shape, kernel_stride)
  return geo["code_h"] >= 1 and geo["code_w"] >= 1


def _pick_batch_tile(b, geo):
  """Largest tile whose VMEM working set fits (prefer divisors of b so
  no padded samples are computed)."""
  s, cpx, r = geo["s"], geo["cpx"], geo["r"]
  rows = 5 * s + 2 * cpx + r * max(s, cpx)

  def fits(t):
    return 4 * rows * t * geo["ells"] <= int(_VMEM_LIMIT * 0.6)

  return pick_divisor_batch_tile(b, fits)


def _pack_weights(dictionary, geo):
  """(dstk, dall): synthesis (cpx, R*s) and analysis (s, R*cpx).
  Non-stride-multiple kernels are zero-extended to (khp, kwp) first
  (see _geometry)."""
  s, c = geo["s"], geo["c"]
  sv, sh_ = geo["sv"], geo["sh"]
  ay, ax = geo["ay"], geo["ax"]
  if geo["ekh"] or geo["ekw"]:
    dictionary = jnp.pad(jnp.asarray(dictionary),
                         ((0, 0), (0, 0), (0, geo["ekh"]),
                          (0, geo["ekw"])))
  # parts[a, ch, c, py, px] = D[ch, c, a_y*sv+py, a_x*sh+px]
  d = dictionary.reshape(s, c, ay, sv, ax, sh_)
  parts = d.transpose(2, 4, 0, 1, 3, 5).reshape(ay * ax, s, c * sv * sh_)
  dstk = parts.transpose(2, 0, 1).reshape(geo["cpx"], geo["r"] * s)
  dall = parts.transpose(1, 0, 2).reshape(s, geo["r"] * geo["cpx"])
  return dstk, dall


def _to_canvas(x, rows, geo, b_pad):
  """(b, rows, gh, gw) -> (rows, b_pad*ells) canvas with spare zeros."""
  b = x.shape[0]
  gh, gw = x.shape[2], x.shape[3]
  x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, geo["rc"] - gh),
                  (0, geo["wc"] - gw)))
  x = x.reshape(b_pad, rows, geo["ell"])
  x = jnp.pad(x, ((0, 0), (0, 0), (0, geo["ells"] - geo["ell"])))
  return x.transpose(1, 0, 2).reshape(rows, b_pad * geo["ells"])


def _blockify(img, geo):
  """(b, c, H, W) -> (b, cpx, Bh, Bw) stride-blocks with the pixel
  index (c, py, px) in the row dim.  Appends the kernel-extension
  trailing zero rows/cols first (see _geometry) -- they carry exact
  zeros through synthesis/analysis."""
  b = img.shape[0]
  if geo["ekh"] or geo["ekw"]:
    img = jnp.pad(jnp.asarray(img),
                  ((0, 0), (0, 0), (0, geo["ekh"]), (0, geo["ekw"])))
  x = img.reshape(b, geo["c"], geo["bh"], geo["sv"], geo["bw"],
                  geo["sh"])
  return x.transpose(0, 1, 3, 5, 2, 4).reshape(
      b, geo["cpx"], geo["bh"], geo["bw"])


def _rolled_stack(xcv, geo, batch_tile, sign):
  """XLA mirror of the kernel's per-offset lane rotates: (rows, N) ->
  (R*rows, N) with copy i rolled by sign*rolls[i] within each batch
  tile.  sign=+1 is the synthesis read z[B - a]; sign=-1 the analysis
  read y[c + a].  Wrapped lanes land only in spare/zero positions (same
  invariant the kernel relies on: interior_max + max_roll = ell - 1 <
  ells)."""
  rows, n = xcv.shape
  tl = batch_tile * geo["ells"]
  x = xcv.reshape(rows, n // tl, tl)
  return jnp.concatenate(
      [jnp.roll(x, sign * r, axis=2) for r in geo["rolls"]],
      axis=0).reshape(geo["r"] * rows, n)


def _unpack_dstk(grad_dstk, geo, kernel_shape):
  """(cpx, R*s) dstk-layout gradient -> (s, c, kh, kw) kernel layout
  (exact inverse of the _pack_weights dstk permutation; the kernel
  zero-extension rows/cols are sliced away -- projecting the gradient
  onto the real kernel support)."""
  s, c, kh, kw = kernel_shape
  parts = grad_dstk.reshape(geo["cpx"], geo["r"], s).transpose(1, 2, 0)
  full = parts.reshape(geo["ay"], geo["ax"], s, c, geo["sv"],
                       geo["sh"]).transpose(2, 3, 0, 4, 1, 5).reshape(
                           s, c, geo["khp"], geo["kwp"])
  if geo["ekh"] or geo["ekw"]:
    full = full[:, :, :kh, :kw]
  return full


def _block_mask_canvas(images_shape, padding, geo):
  """(cpx, ells) single-sample canvas of the 0/1 padding mask blocks."""
  from vtc_tpu.ops import conv_shapes
  mask_img = conv_shapes.create_mask(images_shape, padding, jnp.float32)
  mask_full = jnp.broadcast_to(
      mask_img[:1], (1, geo["c"]) + tuple(images_shape[2:]))
  return mask_img, _to_canvas(_blockify(mask_full, geo), geo["cpx"],
                              geo, 1)


def build_block_update_stats(images_padded, codes, dict_shape,
                             kernel_stride, padding):
  """D-independent stats for the block-space dictionary gradient.

  The conv kernel gradient (reference dict_update_rules/convolutional/
  sc_steepest_descent.py:59-66) is the correlation of the codes with
  the masked residual.  In stride-block space (see module docstring)
  both the residual synthesis and the correlation are ONE deep
  matmul each against the rolled code stack, which is D-independent and
  computed here once per training step.  Requires ``supported()``.
  """
  b = images_padded.shape[0]
  geo = _geometry(images_padded.shape, dict_shape, kernel_stride)
  batch_tile = _pick_batch_tile(b, geo)
  b_pad = -(-b // batch_tile) * batch_tile
  with matmul_precision():
    mask_img, mblk_cv = _block_mask_canvas(images_padded.shape, padding,
                                           geo)
    xcv = _to_canvas(_blockify(mask_img * images_padded, geo),
                     geo["cpx"], geo, b_pad)
    zcv = _to_canvas(jnp.asarray(codes, jnp.float32), dict_shape[0],
                     geo, b_pad)
    zstack = _rolled_stack(zcv, geo, batch_tile, +1)
  return dict(geo=geo, batch=b, xcv=xcv, zstack=zstack,
              mblk=jnp.tile(mblk_cv, (1, b_pad)),
              kernel_shape=tuple(dict_shape))


def dictionary_gradient_from_block_stats(stats, dictionary):
  """(s, c, kh, kw) masked-residual kernel gradient (batch-averaged),
  == ops/convolutions.dictionary_gradient, as two block matmuls."""
  geo = stats["geo"]
  with matmul_precision():
    dstk, _ = _pack_weights(dictionary, geo)
    img = jnp.dot(dstk, stats["zstack"],
                  precision=_HIGHEST) * stats["mblk"]
    resid = img - stats["xcv"]
    grad_dstk = jax.lax.dot_general(
        resid, stats["zstack"], (((1,), (1,)), ((), ())),
        precision=_HIGHEST) / stats["batch"]
  return _unpack_dstk(grad_dstk, geo, stats["kernel_shape"])


def _make_kernel(variant, nonneg, hard, geo, batch_tile,
                 early_eps=None, inv_count=None, mxu="highest"):
  use_fista = variant == "fista"
  s, cpx, r = geo["s"], geo["cpx"], geo["r"]
  rolls = geo["rolls"]
  ells = geo["ells"]
  tl = batch_tile * ells

  # inference MXU tier, same scheme as the conv segment kernel's tile
  # solver (ops/pallas_conv_train._make_deep_dot): the constant-per-
  # solve packed weights are tier-prepped once, the rolled stack slice
  # per use.  'highest' is the parity default (lazy import: conv_train
  # imports this module).
  from vtc_tpu.ops.pallas_conv_train import _make_deep_dot
  prep_w, dot = _make_deep_dot(mxu)

  def kernel(niter_ref, scalars_ref, dstk_ref, dall_ref, mblk_ref,
             zmask_ref, xcv_ref, init_ref, out_ref, stack):
    num_iters = niter_ref[0]
    eta = scalars_ref[0]
    lam_eta = scalars_ref[1]
    dstk = prep_w(dstk_ref[:])
    dall = prep_w(dall_ref[:])
    # b-term A(mask * X) computed in-kernel: the rolled image-block
    # stack lives only in VMEM scratch (materializing it in HBM from
    # XLA cost ~0.2 ms at b=5 / ~1 ms at b=40)
    xcv = xcv_ref[:]
    for i, roll in enumerate(rolls):
      stack[i * cpx:(i + 1) * cpx, :] = pltpu.roll(xcv, (-roll) % tl, 1)
    corr = dot(dall, stack[0:r * cpx, :])
    # per-sample masks tiled across the batch tile (aligned concat)
    mblk = jnp.concatenate([mblk_ref[:]] * batch_tile, axis=1)
    zmask = jnp.concatenate([zmask_ref[:]] * batch_tile, axis=1)

    threshold = make_threshold(nonneg, hard)

    def body(_, carry):
      z, old, t_k = carry
      for i, roll in enumerate(rolls):
        stack[i * s:(i + 1) * s, :] = pltpu.roll(z, roll % tl, 1)
      img = dot(dstk, stack[0:r * s, :]) * mblk
      for i, roll in enumerate(rolls):
        stack[i * cpx:(i + 1) * cpx, :] = pltpu.roll(
            img, (-roll) % tl, 1)
      grad = dot(dall, stack[0:r * cpx, :]) - corr
      codes = zmask * threshold(z - eta * grad, lam_eta)
      if use_fista:
        t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t_k * t_k)) / 2.0
        beta = (t_k - 1.0) / t_next
        return codes + beta * (codes - old), codes, t_next
      return codes, codes, t_k

    init = init_ref[:]
    if early_eps is None:
      _, codes, _ = jax.lax.fori_loop(
          0, num_iters, body, (init, init, jnp.float32(1.0)))
    else:
      # reference stop rule (convolutional/ista_fista.py via
      # ops/solver.py): mean |codes - old_codes| / eta < eps after the
      # first iteration.  The mean uses the REAL element count
      # (b * s * code_h * code_w); spare/halo canvas positions and
      # padded samples hold exact zeros through every iteration, so
      # the canvas-wide sum equals the real sum.  Exact only when the
      # whole batch lives in ONE grid tile (the caller gates).
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


def early_stop_supported(img_shape, dict_shape, kernel_stride):
  """True when the in-kernel early-stopping while_loop is exact: the
  whole batch fits ONE grid tile (the batch-global mean cannot be
  computed across tiles)."""
  if not supported(img_shape, dict_shape, kernel_stride):
    return False
  geo = _geometry(img_shape, dict_shape, kernel_stride)
  tile = _pick_batch_tile(img_shape[0], geo)
  return tile is not None and tile >= img_shape[0]


@functools.partial(
    jax.jit,
    static_argnames=("kernel_stride", "padding", "variant", "nonneg",
                     "hard", "batch_tile", "early_stopping_epsilon",
                     "interpret", "mxu_precision"))
def conv_direct_solve_pallas(images_padded, dictionary, sparsity_weight,
                             num_iters, stepsize, *, kernel_stride,
                             padding, initial_codes=None,
                             variant="fista", nonneg=False, hard=False,
                             batch_tile=None,
                             early_stopping_epsilon=None,
                             interpret=False, mxu_precision="highest"):
  """Conv LASSO codes via the fused direct-formulation kernel.

  Same contract as ops/pallas_conv_fista.conv_fista_solve_pallas; the
  caller must check ``supported()`` first (geometry gate), and
  ``early_stop_supported()`` when passing early_stopping_epsilon.
  ``mxu_precision``: 'highest' (parity default) | 'bf16x3' (3-pass
  deep-contraction matmuls, ~1e-4) | 'bf16' (single pass, screening
  grade).
  """
  b = images_padded.shape[0]
  geo = _geometry(images_padded.shape, dictionary.shape, kernel_stride)
  s, cpx = geo["s"], geo["cpx"]
  if batch_tile is None:
    batch_tile = _pick_batch_tile(b, geo)
  batch_tile = min(batch_tile, b)
  b_pad = -(-b // batch_tile) * batch_tile
  tl = batch_tile * geo["ells"]
  if early_stopping_epsilon is not None:
    assert b_pad == batch_tile, (
        "in-kernel early stopping needs the whole batch in one tile")

  with matmul_precision():
    # the b-term A(mask * X) is computed inside the kernel from the
    # image-block canvas (rolled stack stays in VMEM scratch); spare-
    # lane wrap garbage is confined to zmask-zeroed positions
    mask_img, mblk_cv = _block_mask_canvas(images_padded.shape, padding,
                                           geo)
    dstk, dall = _pack_weights(dictionary, geo)
    xcv = _to_canvas(_blockify(mask_img * images_padded, geo), cpx, geo,
                     b_pad)

  if initial_codes is None:
    init_cv = jnp.zeros((s, b_pad * geo["ells"]), jnp.float32)
  else:
    init_cv = _to_canvas(jnp.asarray(initial_codes, jnp.float32), s,
                         geo, b_pad)
  zmask_np = np.zeros((1, geo["rc"], geo["wc"]), np.float32)
  zmask_np[0, :geo["code_h"], :geo["code_w"]] = 1.0
  zmask_cv = _to_canvas(jnp.asarray(zmask_np)[None], 1, geo, 1)

  eta = jnp.asarray(stepsize, jnp.float32)
  scalars = jnp.stack(
      [eta, jnp.asarray(sparsity_weight, jnp.float32) * eta])
  niter = jnp.asarray(num_iters, jnp.int32).reshape(1)

  kernel = _make_kernel(
      variant, bool(nonneg), bool(hard), geo, batch_tile,
      early_eps=(None if early_stopping_epsilon is None
                 else float(early_stopping_epsilon)),
      inv_count=1.0 / (b * s * geo["code_h"] * geo["code_w"]),
      mxu=mxu_precision)
  grid = (b_pad // batch_tile,)
  bcast = lambda shape: pl.BlockSpec(shape, lambda i, *_: (0, 0))
  tile_spec = lambda rows: pl.BlockSpec((rows, tl), lambda i, *_: (0, i))
  out = pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=2,
          grid=grid,
          in_specs=[
              bcast(dstk.shape),
              bcast(dall.shape),
              bcast((cpx, geo["ells"])),
              bcast((1, geo["ells"])),
              tile_spec(cpx),
              tile_spec(s),
          ],
          out_specs=tile_spec(s),
          scratch_shapes=[pltpu.VMEM(
              (geo["r"] * max(s, cpx), tl), jnp.float32)]),
      out_shape=jax.ShapeDtypeStruct((s, b_pad * geo["ells"]),
                                     jnp.float32),
      interpret=interpret,
      compiler_params=(None if interpret else pltpu.CompilerParams(
          vmem_limit_bytes=_VMEM_LIMIT)),
      cost_estimate=pl.CostEstimate(
          flops=2 * 2 * s * geo["r"] * cpx * b_pad * geo["ell"] * 50,
          bytes_accessed=4 * (3 * s * b_pad * geo["ell"]),
          transcendentals=0),
  )(niter, scalars, jnp.asarray(dstk), jnp.asarray(dall), mblk_cv,
    zmask_cv, xcv, init_cv)

  canv = out.reshape(s, b_pad, geo["ells"])[:, :, :geo["ell"]].reshape(
      s, b_pad, geo["rc"], geo["wc"]).transpose(1, 0, 2, 3)
  return canv[:b, :, :geo["code_h"], :geo["code_w"]]
