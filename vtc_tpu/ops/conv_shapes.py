"""Shape/padding/mask helpers for the convolutional transforms.

Functional equivalents of the reference's utils/convolutions.py:7-24, with
the trailing-padding==0 slicing bug fixed (the reference's ``create_mask``
uses negative slices and therefore breaks when a trailing pad is zero --
see vision_transform_codes/utils/convolutions.py:17-24 and the social
workaround assert at training/sparse_coding.py:298).  Here ``padding=None``
and ``((0,0),(0,0))`` are both valid and equivalent.
"""
import math

import jax.numpy as jnp


def get_padding_amt(image_dim: int, kernel_dim: int, dim_stride: int):
  """Leading/trailing padding so strided kernels cover the image.

  leading = trailing = kernel - stride, plus a stride-remainder correction
  on the trailing edge (reference: utils/convolutions.py:7-12).
  """
  leading = kernel_dim - dim_stride
  trailing = kernel_dim - dim_stride
  if image_dim % dim_stride != 0:
    trailing += dim_stride - (image_dim % dim_stride)
  return leading, trailing


def code_dim_from_padded_img_dim(padded_image_dim: int, kernel_dim: int,
                                 dim_stride: int) -> int:
  """Spatial extent of the code map (reference: utils/convolutions.py:14-15)."""
  return 1 + int(math.ceil((padded_image_dim - kernel_dim) / dim_stride))


def create_mask(padded_shape, padding, dtype=jnp.float32):
  """A (b, c, h, w)-shaped {0,1} mask that zeroes the padded border.

  Unlike the reference we build the mask from explicit index ranges, so
  zero-valued leading or trailing pads are handled correctly, and we only
  materialize an (h, w) plane (broadcast over batch/channel) to save HBM.

  Args:
    padded_shape: tuple (b, c, h, w) of the padded image batch.
    padding: ((lead_v, trail_v), (lead_h, trail_h)) or None for no padding.
  """
  _, _, h, w = padded_shape
  if padding is None:
    return jnp.ones((1, 1, h, w), dtype)
  (lead_v, trail_v), (lead_h, trail_h) = padding
  rows = jnp.arange(h)
  cols = jnp.arange(w)
  row_ok = (rows >= lead_v) & (rows < h - trail_v)
  col_ok = (cols >= lead_h) & (cols < w - trail_h)
  mask_2d = (row_ok[:, None] & col_ok[None, :]).astype(dtype)
  return mask_2d[None, None, :, :]
