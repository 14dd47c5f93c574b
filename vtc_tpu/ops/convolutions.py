"""Strided convolutional synthesis / analysis operators on TPU.

The convolutional transforms need the pair of adjoint linear maps

  synthesize: codes (b, s, sh, sw) -> images (b, c, h, w)
      transposed convolution of the code maps with the kernels
      (torch: conv_transpose2d, reference conv/ista_fista.py:152-155)
  analyze:    images (b, c, h, w) -> codes (b, s, sh, sw)
      strided cross-correlation with the kernels (torch: conv2d)

plus the kernel gradient of a masked reconstruction error, which the
reference builds from a batch/channel-transposed conv2d with
dilation=stride (conv/sc_steepest_descent.py:59-66).  Here synthesis and
analysis lower to ``lax.conv_transpose`` / ``lax.conv_general_dilated``
(XLA tiles both onto the MXU), and the kernel gradient is taken by
autodiff through ``synthesize`` -- guaranteed adjoint-consistent and it
lowers to exactly the dilated convolution the reference hand-writes.

Layouts are NCHW for data and OIHW (s, c, kh, kw) for kernels, matching
the reference's tensor conventions (training/sparse_coding.py:14-51).
"""
import os

import jax
import jax.numpy as jnp

from vtc_tpu.ops import conv_matmul

_DIMNUMS = ("NCHW", "OIHW", "NCHW")

# The matmul (fold/unfold) formulation is MXU-shaped and ~an order of
# magnitude faster on TPU for grayscale dictionaries; it applies when
# the kernel tiles the stride.  VTC_CONV_IMPL=conv forces the lax.conv
# path (used by the equivalence tests).
_FORCE_CONV = os.environ.get("VTC_CONV_IMPL", "auto") == "conv"


def _use_matmul(dict_shape, stride):
  return not _FORCE_CONV and conv_matmul.supported(dict_shape, stride)


def analyze(images, dictionary, stride):
  """Strided cross-correlation: (b,c,h,w) x (s,c,kh,kw) -> (b,s,sh,sw)."""
  if _use_matmul(dictionary.shape, stride):
    from vtc_tpu.ops import conv_shapes
    sh = conv_shapes.code_dim_from_padded_img_dim(
        images.shape[2], dictionary.shape[2], stride[0])
    sw = conv_shapes.code_dim_from_padded_img_dim(
        images.shape[3], dictionary.shape[3], stride[1])
    return conv_matmul.analyze_matmul(images, dictionary, stride,
                                      (sh, sw))
  return jax.lax.conv_general_dilated(
      images, dictionary, window_strides=tuple(stride), padding="VALID",
      dimension_numbers=_DIMNUMS)


def synthesize(codes, dictionary, stride):
  """Transposed strided convolution: (b,s,sh,sw) x (s,c,kh,kw) -> (b,c,h,w).

  ``transpose_kernel=True`` makes this the exact adjoint of ``analyze``
  (spatially flipped kernels, I/O channels swapped), matching torch's
  conv_transpose2d semantics used by the reference.
  """
  if _use_matmul(dictionary.shape, stride):
    return conv_matmul.synthesize_matmul(codes, dictionary, stride)
  return jax.lax.conv_transpose(
      codes, dictionary, strides=tuple(stride), padding="VALID",
      dimension_numbers=_DIMNUMS, transpose_kernel=True)


def masked_residual(images_padded, codes, dictionary, stride, mask):
  """mask * (synthesize(codes) - images)."""
  return mask * (synthesize(codes, dictionary, stride) - images_padded)


def inference_gradient(images_padded, z, dictionary, stride, mask):
  """Gradient of 0.5*||mask*(synth(z) - X)||^2 w.r.t. the codes z.

  == analyze(mask * (synth(z) - X)) since analyze is the adjoint of
  synthesize (reference conv/ista_fista.py:152-155).
  """
  return analyze(
      masked_residual(images_padded, z, dictionary, stride, mask),
      dictionary, stride)


def dictionary_gradient(images_padded, codes, dictionary, stride, mask):
  """Per-sample-averaged gradient of the masked recon error w.r.t. kernels.

  Equals the reference's transposed conv2d-with-dilation=stride trick
  divided by the batch size (conv/sc_steepest_descent.py:59-66); computed
  here via autodiff through the synthesis operator.
  """
  batch = images_padded.shape[0]

  def loss(d):
    r = masked_residual(images_padded, codes, d, stride, mask)
    return 0.5 * jnp.vdot(r, r)

  return jax.grad(loss)(dictionary) / batch
