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
                                             "normalize_dictionary"))
def _update(images_padded, dictionary, codes, hessian_diagonal, mask,
            kernel_stride, stepsize, num_iters, lowest_code_val,
            normalize_dictionary):
  scale = (hessian_diagonal + lowest_code_val)[:, None, None, None]

  def body(_, d):
    grad = conv_ops.dictionary_gradient(
        images_padded, codes, d, kernel_stride, mask)
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
        normalize_dictionary=True):
  """Cheap-quadratic descent steps on the convolutional dictionary.

  Returns:
    (s, c, kh, kw) updated dictionary.
  """
  images_padded = jnp.asarray(images_padded, jnp.float32)
  mask = conv_shapes.create_mask(
      images_padded.shape, padding_dims, images_padded.dtype)
  return _update(images_padded, jnp.asarray(dictionary, jnp.float32),
                 jnp.asarray(codes, jnp.float32),
                 jnp.asarray(hessian_diagonal, jnp.float32), mask,
                 tuple(int(x) for x in kernel_stride),
                 jnp.asarray(stepsize, jnp.float32), int(num_iters),
                 jnp.asarray(lowest_code_val, jnp.float32),
                 bool(normalize_dictionary))


def hessian_diagonal_ema(hessian_diagonal, codes):
  """Trainer-side conv EMA: h <- 0.99 h + mean_b(sum_spatial codes^2)/100
  (reference training/sparse_coding.py:158-161)."""
  return 0.99 * hessian_diagonal + jnp.mean(
      jnp.sum(codes**2, axis=(2, 3)), axis=0) / 100.0
