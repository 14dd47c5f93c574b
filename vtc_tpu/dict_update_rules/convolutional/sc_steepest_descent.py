"""Steepest-descent dictionary update for convolutional sparse coding.

Parity with vision_transform_codes/dict_update_rules/convolutional/
sc_steepest_descent.py:12-73: the kernel gradient of the masked
reconstruction error (batch-averaged), rescaled to the dictionary's
Frobenius norm so the stepsize is dimensionless, then per-kernel
renormalization.  The reference's transposed conv2d-with-dilation trick is
produced here by autodiff through the synthesis operator
(vtc_tpu.ops.convolutions.dictionary_gradient).  Pure: returns the new
dictionary.
"""
import functools

import jax
import jax.numpy as jnp

from vtc_tpu.ops import conv_shapes
from vtc_tpu.ops import convolutions as conv_ops
from vtc_tpu.ops.precision import matmul_precision


def _renormalize_kernels(dictionary):
  norms = jnp.sqrt(jnp.sum(dictionary**2, axis=(1, 2, 3), keepdims=True))
  return dictionary / norms


@functools.partial(jax.jit, static_argnames=("kernel_stride", "num_iters",
                                             "normalize_dictionary",
                                             "padding", "formulation"))
def _update(images_padded, dictionary, codes, mask, kernel_stride, stepsize,
            num_iters, normalize_dictionary, padding=None,
            formulation="direct"):
  if formulation == "block":
    # stride-block-space gradient (ops/pallas_conv_direct.py): the
    # D-independent rolled code stack is built ONCE; each iteration is
    # two deep-contraction MXU matmuls (fastest; kernel % stride == 0)
    from vtc_tpu.ops import pallas_conv_direct
    stats = pallas_conv_direct.build_block_update_stats(
        images_padded, codes, dictionary.shape, kernel_stride, padding)
    grad_fn = lambda d: (
        pallas_conv_direct.dictionary_gradient_from_block_stats(stats, d))
  elif formulation == "gram":
    # code-space gradient (ops/conv_dict_gram.py): the D-independent
    # autocorrelations + image term are computed ONCE; each iteration is
    # a cheap recombination with the current dictionary
    from vtc_tpu.ops import conv_dict_gram
    stats = conv_dict_gram.build_dict_gradient_stats(
        images_padded, codes, dictionary.shape, kernel_stride, padding)
    grad_fn = lambda d: conv_dict_gram.dictionary_gradient_from_stats(
        stats, d, kernel_stride)
  else:
    grad_fn = lambda d: conv_ops.dictionary_gradient(
        images_padded, codes, d, kernel_stride, mask)

  def body(_, d):
    grad = grad_fn(d)
    # dimensionless stepsize: scale gradient to the dictionary's F-norm
    # (reference line 68)
    grad = grad * (jnp.linalg.norm(d.ravel()) /
                   jnp.linalg.norm(grad.ravel()))
    d = d - stepsize * grad
    if normalize_dictionary:
      d = _renormalize_kernels(d)
    return d

  with matmul_precision():
    return jax.lax.fori_loop(0, num_iters, body, dictionary)


def run(images_padded, dictionary, codes, kernel_stride, padding_dims,
        stepsize=0.001, num_iters=1, normalize_dictionary=True,
        formulation="auto"):
  """Steepest-descent steps on the convolutional dictionary.

  Args:
    images_padded: (b, c, h, w); dictionary: (s, c, kh, kw);
    codes: (b, s, sh, sw).
    kernel_stride: (stride_v, stride_h).
    padding_dims: ((lead_v, trail_v), (lead_h, trail_h)) or None.
    formulation: 'block' (stride-block-space matmul gradient,
      ops/pallas_conv_direct.py — fastest, needs kernel % stride == 0),
      'gram' (code-space gradient, ops/conv_dict_gram.py), 'direct'
      (image-space autodiff), or 'auto' (block > gram > direct by
      geometry).

  Returns:
    (s, c, kh, kw) updated dictionary.
  """
  from vtc_tpu.ops import conv_dict_gram
  from vtc_tpu.ops import pallas_conv_direct
  images_padded = jnp.asarray(images_padded, jnp.float32)
  dictionary = jnp.asarray(dictionary, jnp.float32)
  kernel_stride = tuple(int(x) for x in kernel_stride)
  if formulation == "auto":
    if pallas_conv_direct.supported(images_padded.shape,
                                    dictionary.shape, kernel_stride):
      formulation = "block"
    else:
      formulation = ("gram" if conv_dict_gram.supported(
          dictionary.shape, kernel_stride) else "direct")
  padding_static = (None if padding_dims is None else
                    tuple(tuple(int(x) for x in p) for p in padding_dims))
  mask = conv_shapes.create_mask(
      images_padded.shape, padding_dims, images_padded.dtype)
  return _update(images_padded, dictionary,
                 jnp.asarray(codes, jnp.float32), mask, kernel_stride,
                 jnp.asarray(stepsize, jnp.float32), int(num_iters),
                 bool(normalize_dictionary), padding_static, formulation)
