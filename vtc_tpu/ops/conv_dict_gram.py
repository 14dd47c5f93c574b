"""Exact code-space dictionary (kernel) gradient for conv sparse coding.

The conv dictionary gradient (reference dict_update_rules/convolutional/
sc_steepest_descent.py:59-66) is the correlation of the codes with the
masked reconstruction residual:

  grad[i,ch,r,c] = (1/b) sum_{b,p,q} codes[b,i,p,q]
                   * (mask * (S(codes) - X))[b,ch, p*sv + r, q*sh + c]

Computing it literally costs a full image-space synthesis + fold/unfold
per update iteration -- pure data movement, the same bottleneck
ops/conv_gram.py removed from the inference loop.  This module removes
it from the UPDATE too, by splitting the gradient exactly:

  grad = T1(D; C) - T2        with

  T2[i,ch,r,c]  = (1/b) sum_{b,p,q} codes[b,i,p,q] (mask*X)[...]
                  -- one unfold of the masked images (the data must be
                  read once anyway) + one MXU matmul; independent of D,
                  so computed ONCE per training step, and

  T1[i,ch,r,c]  = sum_{dy,dx,j} D[j,ch, r-dy*sv, c-dx*sh]
                  * Cw[dy,dx, r, c, i, j]

  where Cw are mask-weighted code AUTOCORRELATIONS over the small set
  of tile-overlap offsets |dy| <= (kh-1)//sv, |dx| <= (kw-1)//sh.  The
  separable padding mask (mask = rowmask x colmask, rowmask = 1 - mbar)
  enters linearly, so inclusion-exclusion over the row/col masks is
  exact (same identity as ops/conv_gram.py):

    Cw = C_interior - C_rows - C_cols + C_corners

  with the correction terms supported only on the code rows/columns
  whose tiles touch the masked border.  Everything is MXU einsums; the
  D-dependent recombination (T1) is tiny, so multi-iteration updates
  (fixed codes, moving D) recompute only T1 per iteration.

Exactness vs ops/convolutions.dictionary_gradient (autodiff through the
image-space synthesis) is tested to float tolerance in
tests/test_conv_dict_gram.py for odd strides, paddings, multi-channel
kernels, and kernel % stride != 0.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from vtc_tpu.ops.conv_gram import _overlap_range, _special_positions
from vtc_tpu.ops.precision import matmul_precision

# Beyond this many overlap offsets the autocorrelation stack stops
# paying for itself (e.g. stride-1 dense conv); callers fall back to the
# image-space autodiff gradient.
_MAX_OFFSETS = 49


def supported(kernel_shape, kernel_stride):
  """True when the offset stack is small enough to beat image space."""
  kh, kw = kernel_shape[2], kernel_shape[3]
  ry = (kh - 1) // kernel_stride[0]
  rx = (kw - 1) // kernel_stride[1]
  return (2 * ry + 1) * (2 * rx + 1) <= _MAX_OFFSETS


def unfold(images, kernel_hw, stride, code_hw):
  """Extract strided patches: (b,c,H,W) -> (b, sh, sw, c, kh, kw)."""
  b, c, _, _ = images.shape
  kh, kw = kernel_hw
  sv, sh_ = stride
  sh, sw = code_hw
  if kh % sv == 0 and kw % sh_ == 0:
    # non-overlapping parity classes: pure reshape/transpose gathers
    # (same decomposition as ops/conv_matmul.analyze_matmul)
    ov, oh = kh // sv, kw // sh_
    patches = jnp.zeros((b, sh, sw, c, kh, kw), images.dtype)
    for py in range(ov):
      for px in range(oh):
        nh = len(range(py, sh, ov))
        nw = len(range(px, sw, oh))
        block = images[:, :, py * sv:py * sv + nh * kh,
                       px * sh_:px * sh_ + nw * kw]
        sub = block.reshape(b, c, nh, kh, nw, kw).transpose(
            0, 2, 4, 1, 3, 5)
        patches = patches.at[:, py::ov, px::oh].set(sub)
    return patches
  # general case: XLA's patch extraction (channel order (c, kh, kw))
  patches = jax.lax.conv_general_dilated_patches(
      images, (kh, kw), tuple(stride), "VALID",
      dimension_numbers=("NCHW", "OIHW", "NCHW"))
  return patches.reshape(b, c, kh, kw, sh, sw).transpose(0, 4, 5, 1, 2, 3)


def _shifted_stack(codes, ry, rx):
  """(O, b, s, sh, sw) stack of codes[b, j, p+dy, q+dx] (zero outside)."""
  b, s, code_h, code_w = codes.shape
  zp = jnp.pad(codes, ((0, 0), (0, 0), (ry, ry), (rx, rx)))
  return jnp.stack([
      jax.lax.dynamic_slice(zp, (0, 0, ry + dy, rx + dx),
                            (b, s, code_h, code_w))
      for dy in range(-ry, ry + 1) for dx in range(-rx, rx + 1)])


def build_dict_gradient_stats(images_padded, codes, kernel_shape,
                              kernel_stride, padding):
  """Everything in the gradient that does NOT depend on the dictionary.

  Args:
    images_padded: (b, c, H, W) padded images.
    codes: (b, s, sh, sw) FIXED codes the update iterates against.
    kernel_shape: (s, c, kh, kw) tuple (static).
    kernel_stride: (sv, sh).
    padding: ((lead_v, trail_v), (lead_h, trail_h)) or None -- the
      STATIC dims that define the reconstruction mask.

  Returns:
    dict consumed by dictionary_gradient_from_stats (per-batch averaged).
  """
  b, s, code_h, code_w = codes.shape
  _, c, kh, kw = kernel_shape
  sv, sh_ = kernel_stride
  height, width = images_padded.shape[2], images_padded.shape[3]
  ry = (kh - 1) // sv
  rx = (kw - 1) // sh_

  if padding is None:
    (lead_v, trail_v), (lead_h, trail_h) = (0, 0), (0, 0)
  else:
    (lead_v, trail_v), (lead_h, trail_h) = padding
  spec_py, mrow = _special_positions(code_h, sv, kh, lead_v, trail_v,
                                     height)
  spec_px, mcol = _special_positions(code_w, sh_, kw, lead_h, trail_h,
                                     width)

  with matmul_precision():
    shifted = _shifted_stack(codes, ry, rx)
    c_int = jnp.einsum("bipq,objpq->oij", codes, shifted) / b

    cw_rows = cw_cols = cw_corners = None
    if spec_py:
      py = np.asarray(spec_py, np.int32)
      mr = jnp.asarray(np.stack(mrow))            # (P, kh)
      c_rows = jnp.einsum("bipq,objpq->poij", codes[:, :, py, :],
                          shifted[:, :, :, py, :]) / b
      cw_rows = jnp.einsum("pr,poij->orij", mr, c_rows)
    if spec_px:
      px = np.asarray(spec_px, np.int32)
      mc = jnp.asarray(np.stack(mcol))            # (Q, kw)
      c_cols = jnp.einsum("bipq,objpq->qoij", codes[:, :, :, px],
                          shifted[:, :, :, :, px]) / b
      cw_cols = jnp.einsum("qw,qoij->owij", mc, c_cols)
    if spec_py and spec_px:
      corner_codes = codes[:, :, py[:, None], px[None, :]]
      corner_shift = shifted[:, :, :, py[:, None], px[None, :]]
      c_corners = jnp.einsum("bipq,objpq->pqoij", corner_codes,
                             corner_shift) / b
      cw_corners = jnp.einsum("pr,qw,pqoij->orwij", mr, mc, c_corners)

    # the image term: unfold(mask * X) once + one big MXU matmul
    if padding is None:
      masked = images_padded
    else:
      rowmask = np.ones(height, np.float32)
      rowmask[:lead_v] = 0.0
      if trail_v:
        rowmask[height - trail_v:] = 0.0
      colmask = np.ones(width, np.float32)
      colmask[:lead_h] = 0.0
      if trail_h:
        colmask[width - trail_h:] = 0.0
      masked = images_padded * jnp.asarray(
          rowmask[:, None] * colmask[None, :])
    patches = unfold(masked, (kh, kw), kernel_stride, (code_h, code_w))
    t_img = jnp.einsum(
        "bipq,bpqk->ik", codes,
        patches.reshape(b, code_h, code_w, c * kh * kw)).reshape(
            s, c, kh, kw) / b

  return {"c_int": c_int, "cw_rows": cw_rows, "cw_cols": cw_cols,
          "cw_corners": cw_corners, "t_img": t_img,
          "ry": ry, "rx": rx}


def dictionary_gradient_from_stats(stats, dictionary, kernel_stride):
  """grad = T1(D; stats) - T2: the cheap D-dependent recombination."""
  s, c, kh, kw = dictionary.shape
  sv, sh_ = kernel_stride
  ry, rx = stats["ry"], stats["rx"]
  c_int = stats["c_int"]
  cw_rows, cw_cols = stats["cw_rows"], stats["cw_cols"]
  cw_corners = stats["cw_corners"]

  out = jnp.zeros((s, c, kh, kw), dictionary.dtype)
  with matmul_precision():
    o = 0
    for dy in range(-ry, ry + 1):
      r0, r1 = _overlap_range(kh, dy * sv)
      for dx in range(-rx, rx + 1):
        c0, c1 = _overlap_range(kw, dx * sh_)
        if r0 >= r1 or c0 >= c1:
          o += 1
          continue
        dsl = dictionary[:, :, r0 - dy * sv:r1 - dy * sv,
                         c0 - dx * sh_:c1 - dx * sh_]
        upd = jnp.einsum("ij,jcrw->icrw", c_int[o], dsl)
        if cw_rows is not None:
          upd -= jnp.einsum("rij,jcrw->icrw", cw_rows[o, r0:r1], dsl)
        if cw_cols is not None:
          upd -= jnp.einsum("wij,jcrw->icrw", cw_cols[o, c0:c1], dsl)
        if cw_corners is not None:
          upd += jnp.einsum("rwij,jcrw->icrw",
                            cw_corners[o, r0:r1, c0:c1], dsl)
        out = out.at[:, :, r0:r1, c0:c1].add(upd)
        o += 1
  return out - stats["t_img"]


@functools.partial(jax.jit,
                   static_argnames=("kernel_shape", "kernel_stride",
                                    "padding"))
def dictionary_gradient_gram(images_padded, codes, dictionary,
                             kernel_shape, kernel_stride, padding):
  """One-call drop-in for convolutions.dictionary_gradient (code-space)."""
  stats = build_dict_gradient_stats(images_padded, codes, kernel_shape,
                                    kernel_stride, padding)
  return dictionary_gradient_from_stats(stats, dictionary, kernel_stride)
