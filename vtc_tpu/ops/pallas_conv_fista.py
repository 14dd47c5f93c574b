"""Fused Pallas TPU kernel for the convolutional ISTA/FISTA solver.

The conv inference iteration is, in code space (ops/conv_gram.py),

  grad(z) = L(z) - corr,   L = L_int - L_rows - L_cols + L_corners

with L_int translation-invariant over the code canvas.  The XLA path
(one lax.conv + corrections per iteration) round-trips the codes
through HBM every iteration; this kernel keeps ALL solver state in
VMEM across the iterations, with the canvas FLATTENED so every operator
term is an MXU matmul on static slices:

  * each sample's code canvas (incl. an ry/rx halo of zeros) is a
    contiguous run of H*W = (sh+2ry)*(sw+2rx) lanes; a spatial shift
    (dy, dx) is a LANE OFFSET of dy*W + dx, so
    L_int(z) = sum_o G_o @ z[:, g+off_o : g+off_o+T*L]  -- 9 matmuls on
    unaligned static slices (supported by Mosaic; strided slices are
    not).  Halo lanes make cross-sample reads land in zeros, and halo
    OUTPUTS are re-zeroed by the interior mask each iteration.
  * row corrections touch contiguous W-lane segments: direct slices.
  * column corrections need stride-W lanes, which Mosaic cannot slice;
    the <=Q*(2rx+1) needed canvas columns are EXTRACTED by one matmul
    with a static 0/1 selection matrix per sample, corrected with
    stacked-K matmuls, and SCATTERED back by the transposed selection.
  * corner corrections fold into the column vectors (single lanes).

Grid: 1-d over batch tiles; G/E/selection matrices broadcast to every
tile.  ``num_iters`` is a scalar-prefetch argument (schedule changes
never recompile).  Matmuls run at HIGHEST MXU precision (parity grade,
same policy as ops/pallas_fista.py).

Reference semantics mirrored: convolutional/ista_fista.py:100-195
(zero/warm init, soft/nonneg/hard thresholds, FISTA momentum).  Early
stopping callers use the XLA path.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vtc_tpu.ops import conv_gram
from vtc_tpu.ops.conv_gram import _special_positions
from vtc_tpu.ops.pallas_common import LANES as _LANES, round_up
from vtc_tpu.ops.precision import matmul_precision

_HIGHEST = jax.lax.Precision.HIGHEST


def _geometry(dictionary_shape, kernel_stride, padding, code_hw,
              padded_hw):
  """Static canvas geometry shared by builder and kernel."""
  s, _, kh, kw = dictionary_shape
  sv, sh_ = kernel_stride
  sh, sw = code_hw
  ry, rx = (kh - 1) // sv, (kw - 1) // sh_
  hh, ww = sh + 2 * ry, sw + 2 * rx
  ell = hh * ww                       # flat canvas length per sample
  g = ry * ww + rx                    # max |lane offset| of any shift
  offs = [(dy, dx) for dy in range(-ry, ry + 1)
          for dx in range(-rx, rx + 1)]
  if padding is None:
    spec_py, mrow, spec_px, mcol = [], [], [], []
  else:
    (lv, tv), (lh, th) = padding
    spec_py, mrow = _special_positions(sh, sv, kh, lv, tv, padded_hw[0])
    spec_px, mcol = _special_positions(sw, sh_, kw, lh, th, padded_hw[1])
  ells = round_up(ell, _LANES)      # lane-aligned per-sample stride
  return dict(s=s, ry=ry, rx=rx, hh=hh, ww=ww, ell=ell, ells=ells, g=g,
              offs=offs, sh=sh, sw=sw, spec_py=spec_py, spec_px=spec_px,
              mrow=mrow, mcol=mcol)


def _selection_matrices(geo):
  """Static 0/1 matrices: column extraction Ein (ell, nc*hh) and
  scatter Eout (Q*sh, ell), plus the canvas interior mask (1, ell)."""
  hh, ww, ell = geo["hh"], geo["ww"], geo["ell"]
  ry, rx, sh, sw = geo["ry"], geo["rx"], geo["sh"], geo["sw"]
  # distinct canvas columns the column/corner corrections read
  need = sorted({rx + q + dx for q in geo["spec_px"]
                 for dx in range(-rx, rx + 1)})
  cidx = {c: i for i, c in enumerate(need)}
  ein = np.zeros((ell, len(need) * hh), np.float32)
  for c, i in cidx.items():
    for y in range(hh):
      ein[y * ww + c, i * hh + y] = 1.0
  eout = np.zeros((len(geo["spec_px"]) * sh, ell), np.float32)
  for qi, q in enumerate(geo["spec_px"]):
    for y in range(sh):
      eout[qi * sh + y, (ry + y) * ww + rx + q] = 1.0
  mask = np.zeros((1, geo["ells"]), np.float32)
  for y in range(sh):
    mask[0, (ry + y) * ww + rx:(ry + y) * ww + rx + sw] = 1.0
  return ein, eout, mask, cidx


def _make_kernel(variant, nonneg, hard, geo, batch_tile, cidx,
                 has_rows, has_cols):
  use_fista = variant == "fista"
  s, ell, g = geo["s"], geo["ell"], geo["g"]
  ells = geo["ells"]
  hh, ww = geo["hh"], geo["ww"]
  ry, rx, sh, sw = geo["ry"], geo["rx"], geo["sh"], geo["sw"]
  offs = geo["offs"]
  n_off = len(offs)
  spec_py, spec_px = geo["spec_py"], geo["spec_px"]
  tl = batch_tile * ells
  wb = round_up(tl + 2 * g, _LANES)

  def dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=_HIGHEST)

  def kernel(niter_ref, scalars_ref, gint_ref, grow_ref, gcol_ref,
             gcorn_ref, ein_ref, eout_ref, mask_ref, corr_ref, init_ref,
             out_ref):
    num_iters = niter_ref[0]
    eta = scalars_ref[0]
    lam_eta = scalars_ref[1]
    gint = gint_ref[:]                 # (n_off*s, s)
    corr = corr_ref[:]                 # (s, tl)
    mask = mask_ref[:]                 # (1, ell) -> broadcast per sample
    full_mask = jnp.concatenate([mask] * batch_tile, axis=1)  # (1, tl)

    def threshold(x):
      if hard:
        if nonneg:
          return jnp.where(x < lam_eta, 0.0, x)
        return jnp.where(jnp.abs(x) < lam_eta, 0.0, x)
      if nonneg:
        return jnp.maximum(x - lam_eta, 0.0)
      return jnp.sign(x) * jnp.maximum(jnp.abs(x) - lam_eta, 0.0)

    def operator(codes_canvas):
      """L(z) on the (s, tl) canvas value."""
      z = jnp.pad(codes_canvas, ((0, 0), (g, wb - tl - g)))
      grad = dot(gint[0:s], z[:, g + offs[0][0] * ww + offs[0][1]:
                              g + offs[0][0] * ww + offs[0][1] + tl])
      for o in range(1, n_off):
        off = offs[o][0] * ww + offs[o][1]
        grad = grad + dot(gint[o * s:(o + 1) * s],
                          z[:, g + off:g + off + tl])
      # NOTE: two Mosaic lowering limits shape this section.  (1) vectors
      # with different lane offsets cannot be concatenated ("offset
      # mismatch on non-concat dimension"), so each correction
      # accumulates per-offset (s, s) block matmuls instead of stacking
      # the shifted slices into one stacked-K operand.  (2) scatter-add
      # has no lowering, so per-tile corrections are built on a small
      # (s, ells) per-sample canvas via pads, and the tiles are joined
      # with ONE offset-uniform concat + a single full-width subtract
      # (full-width pads per correction blow the scoped-VMEM budget).
      if has_rows or has_cols:
        tile_corrs = []
        for t in range(batch_tile):
          base = g + t * ells
          tc = None
          if has_rows:
            # row corrections: contiguous W segments
            for pi, p in enumerate(spec_py):
              rowc = None
              for o, (dy, dx) in enumerate(offs):
                lo = base + (p + ry + dy) * ww + rx + dx
                term = dot(
                    grow_ref[pi * s:(pi + 1) * s, o * s:(o + 1) * s],
                    z[:, lo:lo + sw])
                rowc = term if rowc is None else rowc + term
              seg = (p + ry) * ww + rx
              placed = jnp.pad(rowc, ((0, 0), (seg, ells - seg - sw)))
              tc = placed if tc is None else tc + placed
          if has_cols:
            # column extraction by selection matmul (stride-W lanes are
            # not sliceable on TPU)
            ze = dot(z[:, base:base + ell], ein_ref[:])  # (s, nc*hh)
            for qi, q in enumerate(spec_px):
              cvec = None
              for o, (dy, dx) in enumerate(offs):
                lo = cidx[rx + q + dx] * hh + ry + dy
                term = dot(
                    gcol_ref[qi * s:(qi + 1) * s, o * s:(o + 1) * s],
                    ze[:, lo:lo + sh])
                cvec = term if cvec is None else cvec + term
              if has_rows:
                # corners fold into the column vectors (single lanes)
                for pi, p in enumerate(spec_py):
                  cnr = None
                  for o, (dy, dx) in enumerate(offs):
                    lo = cidx[rx + q + dx] * hh + p + ry + dy
                    term = dot(
                        gcorn_ref[(pi * len(spec_px) + qi) * s:
                                  (pi * len(spec_px) + qi + 1) * s,
                                  o * s:(o + 1) * s],
                        ze[:, lo:lo + 1])
                    cnr = term if cnr is None else cnr + term
                  cvec = cvec - jnp.pad(cnr, ((0, 0), (p, sh - p - 1)))
              # scatter this column back onto the sample canvas
              scat = dot(cvec, eout_ref[qi * sh:(qi + 1) * sh, :])
              placed = jnp.pad(scat, ((0, 0), (0, ells - ell)))
              tc = placed if tc is None else tc + placed
          tile_corrs.append(tc)
        grad = grad - jnp.concatenate(tile_corrs, axis=1)
      return grad

    init = init_ref[:]

    def body(_, carry):
      z, old, t_k = carry
      grad = operator(z) - corr
      codes = full_mask * threshold(z - eta * grad)
      if use_fista:
        t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t_k * t_k)) / 2.0
        beta = (t_k - 1.0) / t_next
        z_next = codes + beta * (codes - old)
        return z_next, codes, t_next
      return codes, codes, t_k

    _, codes, _ = jax.lax.fori_loop(
        0, num_iters, body, (init, init, jnp.float32(1.0)))
    out_ref[:] = codes

  return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kernel_stride", "padding", "variant", "nonneg",
                     "hard", "batch_tile", "interpret"))
def conv_fista_solve_pallas(images_padded, dictionary, sparsity_weight,
                            num_iters, stepsize, *, kernel_stride,
                            padding, initial_codes=None, variant="fista",
                            nonneg=False, hard=False, batch_tile=None,
                            interpret=False):
  """Conv LASSO codes for a batch of padded images, fused in VMEM.

  Args:
    images_padded: (b, c, h, w) float32, pre-padded.
    dictionary: (s, c, kh, kw) float32 kernels.
    kernel_stride / padding: static conv geometry (padding may be None).
    sparsity_weight, num_iters, stepsize: dynamic scalars.
    initial_codes: optional (b, s, sh, sw) warm start.
    batch_tile: samples per grid cell (default: all, capped at 8).

  Returns:
    (b, s, sh, sw) float32 codes; equals the XLA 'gram'/'direct'
    formulations to float tolerance (tests/test_pallas_conv_fista.py).
  """
  from vtc_tpu.ops import conv_shapes
  from vtc_tpu.ops import convolutions as conv_ops

  b, _, height, width = images_padded.shape
  s = dictionary.shape[0]
  sv, sh_ = kernel_stride
  sh = conv_shapes.code_dim_from_padded_img_dim(
      height, dictionary.shape[2], sv)
  sw = conv_shapes.code_dim_from_padded_img_dim(
      width, dictionary.shape[3], sh_)
  geo = _geometry(dictionary.shape, kernel_stride, padding, (sh, sw),
                  (height, width))
  ell, ells = geo["ell"], geo["ells"]
  if batch_tile is None:
    # scoped-VMEM cost scales with batch_tile * ells; tile 4 stays under
    # the 100M limit at the reference geometry (tile 5 does not), and
    # measured throughput is flat across tiles 1-4.  Prefer a tile that
    # divides b so no padded samples are computed.
    batch_tile = next((t for t in (4, 3, 2) if b % t == 0), 1)
    batch_tile = min(b, batch_tile)
  b_pad = round_up(b, batch_tile)
  tl = batch_tile * ells

  # XLA precompute: gram matrices + the correlation term, canvas layout
  with matmul_precision():
    op = conv_gram.build_gram_operator(
        dictionary, kernel_stride, padding, (height, width), (sh, sw))
    mask_img = conv_shapes.create_mask(images_padded.shape, padding,
                                       images_padded.dtype)
    corr_sp = conv_ops.analyze(mask_img * images_padded, dictionary,
                               kernel_stride)               # (b,s,sh,sw)

  def to_canvas(x_bshw):
    """(b, s, sh, sw) -> (s, b_pad*ells) flat canvas, halo + tail zeros."""
    x = jnp.pad(x_bshw, ((0, b_pad - b), (0, 0),
                         (geo["ry"], geo["ry"]), (geo["rx"], geo["rx"])))
    x = x.reshape(b_pad, s, ell)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, ells - ell)))
    return x.transpose(1, 0, 2).reshape(s, b_pad * ells)

  corr_flat = to_canvas(corr_sp)
  if initial_codes is None:
    init_flat = jnp.zeros((s, b_pad * ells), jnp.float32)
  else:
    init_flat = to_canvas(jnp.asarray(initial_codes, jnp.float32))

  n_off = len(geo["offs"])
  gint = op["g_int"].reshape(n_off * s, s)
  p_count, q_count = len(geo["spec_py"]), len(geo["spec_px"])
  has_rows, has_cols = p_count > 0, q_count > 0
  # stacked-K layouts: rows of G blocks concatenated over offsets
  if has_rows:
    grow = op["g_rows"].transpose(0, 2, 1, 3).reshape(
        p_count * s, n_off * s)
  else:
    grow = jnp.zeros((8, 8), jnp.float32)
  if has_cols:
    gcol = op["g_cols"].transpose(0, 2, 1, 3).reshape(
        q_count * s, n_off * s)
  else:
    gcol = jnp.zeros((8, 8), jnp.float32)
  if has_rows and has_cols:
    gcorn = op["g_corners"].transpose(0, 1, 3, 2, 4).reshape(
        p_count * q_count * s, n_off * s)
  else:
    gcorn = jnp.zeros((8, 8), jnp.float32)

  ein_np, eout_np, mask_np, cidx = _selection_matrices(geo)
  if not has_cols:
    ein_np = np.zeros((ell, 8), np.float32)
    eout_np = np.zeros((8, ell), np.float32)

  eta = jnp.asarray(stepsize, jnp.float32)
  scalars = jnp.stack(
      [eta, jnp.asarray(sparsity_weight, jnp.float32) * eta])
  niter = jnp.asarray(num_iters, jnp.int32).reshape(1)

  kernel = _make_kernel(variant, bool(nonneg), bool(hard), geo,
                        batch_tile, cidx, has_rows, has_cols)
  grid = (b_pad // batch_tile,)
  bcast = lambda shape: pl.BlockSpec(shape, lambda i, *_: (0, 0))
  out = pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=2,
          grid=grid,
          in_specs=[
              bcast(gint.shape),
              bcast(grow.shape),
              bcast(gcol.shape),
              bcast(gcorn.shape),
              bcast(ein_np.shape),
              bcast(eout_np.shape),
              bcast(mask_np.shape),
              pl.BlockSpec((s, tl), lambda i, *_: (0, i)),
              pl.BlockSpec((s, tl), lambda i, *_: (0, i)),
          ],
          out_specs=pl.BlockSpec((s, tl), lambda i, *_: (0, i)),
      ),
      out_shape=jax.ShapeDtypeStruct((s, b_pad * ells), jnp.float32),
      interpret=interpret,
      compiler_params=(None if interpret else pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024)),
      cost_estimate=pl.CostEstimate(
          flops=2 * n_off * s * s * b_pad * ell * 50,
          bytes_accessed=4 * (3 * s * b_pad * ell),
          transcendentals=0),
  )(niter, scalars, jnp.asarray(gint), jnp.asarray(grow),
    jnp.asarray(gcol), jnp.asarray(gcorn), jnp.asarray(ein_np),
    jnp.asarray(eout_np), jnp.asarray(mask_np), corr_flat, init_flat)

  # (s, b_pad*ells) -> (b, s, sh, sw): strip tail, halo, batch padding
  canv = out.reshape(s, b_pad, ells)[:, :, :ell].reshape(
      s, b_pad, geo["hh"], geo["ww"]).transpose(1, 0, 2, 3)
  return canv[:b, :, geo["ry"]:geo["ry"] + sh,
              geo["rx"]:geo["rx"] + sw]
