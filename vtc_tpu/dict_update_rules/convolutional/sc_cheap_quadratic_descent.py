"""Cheap-quadratic dictionary update for convolutional sparse coding.

Parity with vision_transform_codes/dict_update_rules/convolutional/
sc_cheap_quadratic_descent.py:14-79: the steepest-descent kernel gradient
divided per-kernel by ``hessian_diagonal + lowest_code_val`` and THEN
rescaled to the dictionary's Frobenius norm (division order matches the
reference, lines 72-75).  The conv Hessian-diagonal EMA is maintained by
the trainer (spatial sum of squared codes, reference
training/sparse_coding.py:158-161).  Pure: returns the new dictionary.
"""
import functools

import jax
import jax.numpy as jnp

from vtc_tpu.ops import conv_shapes
from vtc_tpu.ops import convolutions as conv_ops
from vtc_tpu.ops.precision import matmul_precision


@functools.partial(jax.jit, static_argnames=("kernel_stride", "num_iters",
                                             "normalize_dictionary",
                                             "padding", "formulation"))
def _update(images_padded, dictionary, codes, hessian_diagonal, mask,
            kernel_stride, stepsize, num_iters, lowest_code_val,
            normalize_dictionary, padding=None, formulation="direct"):
  scale = (hessian_diagonal + lowest_code_val)[:, None, None, None]

  if formulation == "block":
    # stride-block-space gradient (ops/pallas_conv_direct.py): rolled
    # code stack built once; two deep MXU matmuls per iteration
    from vtc_tpu.ops import pallas_conv_direct
    stats = pallas_conv_direct.build_block_update_stats(
        images_padded, codes, dictionary.shape, kernel_stride, padding)
    grad_fn = lambda d: (
        pallas_conv_direct.dictionary_gradient_from_block_stats(stats, d))
  elif formulation == "gram":
    # code-space gradient (ops/conv_dict_gram.py): D-independent stats
    # computed once, cheap per-iteration recombination
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
    grad = grad / scale
    grad = grad * (jnp.linalg.norm(d.ravel()) /
                   jnp.linalg.norm(grad.ravel()))
    d = d - stepsize * grad
    if normalize_dictionary:
      norms = jnp.sqrt(jnp.sum(d**2, axis=(1, 2, 3), keepdims=True))
      d = d / norms
    return d

  with matmul_precision():
    return jax.lax.fori_loop(0, num_iters, body, dictionary)


def run(images_padded, dictionary, codes, hessian_diagonal, kernel_stride,
        padding_dims, stepsize=0.001, num_iters=1, lowest_code_val=0.001,
        normalize_dictionary=True, formulation="auto"):
  """Cheap-quadratic descent steps on the convolutional dictionary.

  formulation: 'block' (stride-block-space gradient, fastest, needs
  kernel % stride == 0) | 'gram' (code-space gradient) | 'direct' |
  'auto' (block > gram > direct by geometry).

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
                 jnp.asarray(codes, jnp.float32),
                 jnp.asarray(hessian_diagonal, jnp.float32), mask,
                 kernel_stride,
                 jnp.asarray(stepsize, jnp.float32), int(num_iters),
                 jnp.asarray(lowest_code_val, jnp.float32),
                 bool(normalize_dictionary), padding_static, formulation)


def hessian_diagonal_ema(hessian_diagonal, codes):
  """Trainer-side conv EMA: h <- 0.99 h + mean_b(sum_spatial codes^2)/100
  (reference training/sparse_coding.py:158-161)."""
  return 0.99 * hessian_diagonal + jnp.mean(
      jnp.sum(codes**2, axis=(2, 3)), axis=0) / 100.0
