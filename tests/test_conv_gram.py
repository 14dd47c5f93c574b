"""The code-space Gram operator must reproduce the image-space masked
gradient A(mask*(S(z) - X)) exactly (float tolerance), for every
combination of stride, padding, and kernel shape -- including
kernel % stride != 0 and asymmetric paddings."""
import numpy as np
import pytest

import jax.numpy as jnp

from vtc_tpu.ops import conv_gram, conv_shapes
from vtc_tpu.ops import convolutions as conv_ops
from vtc_tpu.analysis_transforms.convolutional.ista_fista import (
    code_spatial_dims)


def _grad_pair(rng, b, s, c, kh, kw, stride, padding, img_hw):
  h = img_hw[0] + (padding[0][0] + padding[0][1] if padding else 0)
  w = img_hw[1] + (padding[1][0] + padding[1][1] if padding else 0)
  images = rng.randn(b, c, h, w).astype(np.float32)
  d = rng.randn(s, c, kh, kw).astype(np.float32)
  d /= np.sqrt((d.reshape(s, -1) ** 2).sum(1))[:, None, None, None]
  sh, sw = code_spatial_dims(images.shape, d.shape, stride)
  z = rng.randn(b, s, sh, sw).astype(np.float32)
  mask = conv_shapes.create_mask(images.shape, padding, jnp.float32)

  want = np.asarray(conv_ops.inference_gradient(
      jnp.asarray(images), jnp.asarray(z), jnp.asarray(d), stride, mask))
  op = conv_gram.build_gram_operator(
      jnp.asarray(d), stride, padding, (h, w), (sh, sw))
  got = np.asarray(conv_gram.inference_gradient_gram(
      jnp.asarray(images), jnp.asarray(z), jnp.asarray(d), stride, mask,
      op=op))
  return want, got


@pytest.mark.parametrize("stride,kh,kw,padding", [
    ((2, 2), 4, 4, ((2, 2), (2, 2))),      # kernel == 2*stride (ref style)
    ((2, 2), 4, 4, None),                   # no mask at all
    ((2, 3), 5, 7, ((3, 2), (4, 4))),      # kernel % stride != 0, asym pad
    ((1, 1), 3, 3, ((2, 2), (2, 2))),      # dense stride, wide overlap
    ((4, 4), 4, 4, ((4, 4), (4, 6))),      # non-overlapping tiles
])
def test_gram_matches_image_space_gradient(rng, stride, kh, kw, padding):
  want, got = _grad_pair(rng, b=3, s=6, c=2, kh=kh, kw=kw, stride=stride,
                         padding=padding, img_hw=(12, 14))
  np.testing.assert_allclose(got, want, atol=2e-5)


def test_gram_reference_flagship_shape(rng):
  """The reference conv config in miniature: 16x16-ish kernels at half
  stride with kernel-sized padding."""
  want, got = _grad_pair(rng, b=2, s=8, c=1, kh=8, kw=8, stride=(4, 4),
                         padding=((8, 8), (8, 8)), img_hw=(32, 32))
  np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("stride,kh,kw,padding", [
    ((2, 2), 4, 4, ((2, 2), (2, 2))),
    ((2, 3), 5, 7, ((3, 2), (4, 4))),
    ((2, 2), 4, 4, None),
])
def test_apply_gram_conv_interior_equals_einsum(rng, stride, kh, kw,
                                                padding):
  """Both apply_gram interiors (lax.conv channel-mix vs stacked-shifted
  einsum) compute the same operator."""
  h = 12 + (padding[0][0] + padding[0][1] if padding else 0)
  w = 14 + (padding[1][0] + padding[1][1] if padding else 0)
  s, c = 6, 2
  d = rng.randn(s, c, kh, kw).astype(np.float32)
  sh, sw = code_spatial_dims((3, c, h, w), d.shape, stride)
  z = rng.randn(3, s, sh, sw).astype(np.float32)
  op = conv_gram.build_gram_operator(
      jnp.asarray(d), stride, padding, (h, w), (sh, sw))
  a = np.asarray(conv_gram.apply_gram(jnp.asarray(z), op,
                                      interior="conv"))
  b = np.asarray(conv_gram.apply_gram(jnp.asarray(z), op,
                                      interior="einsum"))
  # same operator, different contraction order: float noise only
  np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-4)


def test_gram_solver_equivalence(rng):
  """Full FISTA solve with the gram formulation == image-space path."""
  from vtc_tpu.analysis_transforms.convolutional import ista_fista

  b, s, c = 2, 6, 1
  stride, padding = (2, 2), ((4, 4), (4, 4))
  images = rng.randn(b, c, 20, 20).astype(np.float32)
  d = rng.randn(s, c, 4, 4).astype(np.float32)
  d /= np.sqrt((d.reshape(s, -1) ** 2).sum(1))[:, None, None, None]
  ref = np.asarray(ista_fista.run(
      images, d, stride, padding, 0.02, 20, formulation="direct"))
  fast = np.asarray(ista_fista.run(
      images, d, stride, padding, 0.02, 20, formulation="gram"))
  np.testing.assert_allclose(fast, ref, atol=3e-4)  # two exact formulations, fp32 drift over 20 iters
