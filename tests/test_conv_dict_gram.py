"""Code-space dictionary gradient (ops/conv_dict_gram) == the autodiff
image-space gradient (ops/convolutions.dictionary_gradient), to float
tolerance, across strides/paddings/channels incl. kernel % stride != 0."""
import numpy as np
import pytest

import jax.numpy as jnp

from vtc_tpu.ops import conv_dict_gram
from vtc_tpu.ops import conv_shapes
from vtc_tpu.ops import convolutions as conv_ops


def _case(seed, b, c, kdim, stride, img, padding):
  rng = np.random.RandomState(seed)
  if padding is not None:
    (lv, tv), (lh, th) = padding
    height, width = img + lv + tv, img + lh + th
  else:
    height = width = img
  images = rng.randn(b, c, height, width).astype(np.float32)
  s = 6
  dictionary = rng.randn(s, c, kdim, kdim).astype(np.float32)
  dictionary /= np.sqrt(
      (dictionary**2).sum(axis=(1, 2, 3), keepdims=True))
  sh = conv_shapes.code_dim_from_padded_img_dim(height, kdim, stride[0])
  sw = conv_shapes.code_dim_from_padded_img_dim(width, kdim, stride[1])
  codes = rng.randn(b, s, sh, sw).astype(np.float32)
  return images, dictionary, codes


CASES = [
    # (c, kdim, stride, img, padding)
    (1, 4, (2, 2), 8, ((2, 2), (2, 2))),          # 2x overlap, symmetric
    (1, 4, (2, 2), 8, None),                      # no mask
    (3, 4, (2, 2), 8, ((2, 2), (2, 2))),          # multi-channel
    (1, 6, (2, 3), 9, ((4, 3), (3, 3))),          # asymmetric everything
    (1, 5, (2, 2), 10, ((3, 2), (3, 2))),         # kernel % stride != 0
    (1, 4, (4, 4), 8, ((0, 0), (0, 0))),          # non-overlapping tiles
    (2, 3, (1, 2), 7, ((2, 2), (1, 1))),          # stride 1 on one axis
]


@pytest.mark.parametrize("c,kdim,stride,img,padding", CASES)
def test_matches_autodiff_gradient(c, kdim, stride, img, padding):
  images, dictionary, codes = _case(0, 4, c, kdim, stride, img, padding)
  mask = conv_shapes.create_mask(images.shape, padding, np.float32)
  ref = conv_ops.dictionary_gradient(
      jnp.asarray(images), jnp.asarray(codes), jnp.asarray(dictionary),
      stride, mask)
  got = conv_dict_gram.dictionary_gradient_gram(
      jnp.asarray(images), jnp.asarray(codes), jnp.asarray(dictionary),
      dictionary.shape, stride,
      None if padding is None else
      tuple(tuple(int(x) for x in p) for p in padding))
  np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                             atol=2e-5, rtol=1e-4)


def test_stats_reusable_across_dictionaries():
  """T2 + autocorrelations are D-independent: recombining with a NEW
  dictionary must equal the one-call gradient for that dictionary."""
  images, dictionary, codes = _case(1, 3, 1, 4, (2, 2), 8,
                                    ((2, 2), (2, 2)))
  stats = conv_dict_gram.build_dict_gradient_stats(
      jnp.asarray(images), jnp.asarray(codes), dictionary.shape, (2, 2),
      ((2, 2), (2, 2)))
  rng = np.random.RandomState(7)
  d2 = rng.randn(*dictionary.shape).astype(np.float32)
  got = conv_dict_gram.dictionary_gradient_from_stats(
      stats, jnp.asarray(d2), (2, 2))
  ref = conv_dict_gram.dictionary_gradient_gram(
      jnp.asarray(images), jnp.asarray(codes), jnp.asarray(d2),
      d2.shape, (2, 2), ((2, 2), (2, 2)))
  np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                             atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("kdim,stride,hw",
                         [(5, (2, 2), (9, 11)), (4, (2, 2), (10, 12))])
def test_unfold_matches_patch_definition(kdim, stride, hw):
  """unfold covers both the parity-class and the general XLA path."""
  rng = np.random.RandomState(2)
  images = rng.randn(2, 2, *hw).astype(np.float32)
  sh = conv_shapes.code_dim_from_padded_img_dim(hw[0], kdim, stride[0])
  sw = conv_shapes.code_dim_from_padded_img_dim(hw[1], kdim, stride[1])
  got = np.asarray(conv_dict_gram.unfold(
      jnp.asarray(images), (kdim, kdim), stride, (sh, sw)))
  for p in range(sh):
    for q in range(sw):
      expect = images[:, :, p * stride[0]:p * stride[0] + kdim,
                      q * stride[1]:q * stride[1] + kdim]
      np.testing.assert_array_equal(got[:, p, q], expect)
