"""Strided conv synthesis/analysis as MXU matmuls (fold/unfold by
parity classes).

XLA's conv ops map poorly onto the MXU for this workload (grayscale
images: contraction dims of 1 x kh x kw with tiny channel counts --
measured ~2% MXU utilization on v5e).  When the kernel size is an
integer multiple of the stride (the reference's configs: 16x16 kernels
at stride 8), the overlapping-tile structure factors exactly:

  * every code position (y, x) places a (kh, kw) tile at
    (y*stride_v, x*stride_h);
  * code positions with equal (y mod ov, x mod oh), where
    ov = kh/stride_v and oh = kw/stride_h, place NON-overlapping tiles;
  * so synthesis = one big (b*sh*sw, s) @ (s, c*kh*kw) matmul followed
    by ov*oh pure reshape/shift placements summed together, and
    analysis = the transposed gathers followed by the transposed
    matmul.

Both are exact (same operator, verified against lax.conv in tests) and
turn the whole conv solver into MXU-shaped matmuls.  Used automatically
by vtc_tpu.ops.convolutions when kernel % stride == 0.
"""
import jax.numpy as jnp

from vtc_tpu.ops.precision import matmul_precision


def supported(dictionary_shape, stride):
  """Matmul formulation applies when the kernel tiles the stride."""
  _, _, kh, kw = dictionary_shape
  return kh % stride[0] == 0 and kw % stride[1] == 0


def _class_geometry(sh, sw, ov, oh, py, px):
  """Rows/cols of code positions in parity class (py, px)."""
  nh = len(range(py, sh, ov))
  nw = len(range(px, sw, oh))
  return nh, nw


def synthesize_matmul(codes, dictionary, stride):
  """(b, s, sh, sw) x (s, c, kh, kw) -> (b, c, H, W); equals
  lax.conv_transpose with transposed kernels (VALID padding)."""
  b, s, sh, sw = codes.shape
  s2, c, kh, kw = dictionary.shape
  sv, sh_ = stride
  ov, oh = kh // sv, kw // sh_
  height = (sh - 1) * sv + kh
  width = (sw - 1) * sh_ + kw

  with matmul_precision():
    flat_w = dictionary.reshape(s, c * kh * kw)
    z = codes.transpose(0, 2, 3, 1).reshape(b * sh * sw, s)
    tiles = (z @ flat_w).reshape(b, sh, sw, c, kh, kw)

  out = jnp.zeros((b, c, height, width), codes.dtype)
  for py in range(ov):
    for px in range(oh):
      sub = tiles[:, py::ov, px::oh]  # non-overlapping tile class
      nh, nw = sub.shape[1], sub.shape[2]
      block = sub.transpose(0, 3, 1, 4, 2, 5).reshape(
          b, c, nh * kh, nw * kw)
      out = out.at[:, :, py * sv:py * sv + nh * kh,
                   px * sh_:px * sh_ + nw * kw].add(block)
  return out


def analyze_matmul(images, dictionary, stride, code_hw):
  """(b, c, H, W) x (s, c, kh, kw) -> (b, s, sh, sw); equals
  lax.conv_general_dilated (VALID, the adjoint of synthesize)."""
  b, c, height, width = images.shape
  s, c2, kh, kw = dictionary.shape
  sv, sh_ = stride
  ov, oh = kh // sv, kw // sh_
  sh, sw = code_hw

  patches = jnp.zeros((b, sh, sw, c, kh, kw), images.dtype)
  for py in range(ov):
    for px in range(oh):
      nh, nw = _class_geometry(sh, sw, ov, oh, py, px)
      block = images[:, :, py * sv:py * sv + nh * kh,
                     px * sh_:px * sh_ + nw * kw]
      sub = block.reshape(b, c, nh, kh, nw, kw).transpose(
          0, 2, 4, 1, 3, 5)
      patches = patches.at[:, py::ov, px::oh].set(sub)

  with matmul_precision():
    flat_w = dictionary.reshape(s, c * kh * kw)
    flat_p = patches.reshape(b * sh * sw, c * kh * kw)
    codes = flat_p @ flat_w.T
  return codes.reshape(b, sh, sw, s).transpose(0, 3, 1, 2)
