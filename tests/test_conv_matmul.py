"""The matmul (fold/unfold) conv formulation must equal the lax.conv
path exactly, across strides/kernels/channels where it applies."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtc_tpu.ops import conv_matmul


def _lax_analyze(images, dictionary, stride):
  return jax.lax.conv_general_dilated(
      images, dictionary, window_strides=tuple(stride), padding="VALID",
      dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _lax_synthesize(codes, dictionary, stride):
  return jax.lax.conv_transpose(
      codes, dictionary, strides=tuple(stride), padding="VALID",
      dimension_numbers=("NCHW", "OIHW", "NCHW"), transpose_kernel=True)


@pytest.mark.parametrize("k,stride,c", [
    (4, (2, 2), 1), (4, (2, 2), 3), (6, (2, 3), 1), (4, (4, 4), 2),
    (8, (4, 4), 1),
])
def test_matmul_matches_lax_conv(rng, k, stride, c):
  b, s = 3, 10
  d = rng.randn(s, c, k, k).astype(np.float32)
  assert conv_matmul.supported(d.shape, stride)
  sh, sw = 5, 7
  codes = rng.randn(b, s, sh, sw).astype(np.float32)
  syn_mm = np.asarray(conv_matmul.synthesize_matmul(
      jnp.asarray(codes), jnp.asarray(d), stride))
  syn_lax = np.asarray(_lax_synthesize(
      jnp.asarray(codes), jnp.asarray(d), stride))
  np.testing.assert_allclose(syn_mm, syn_lax, atol=2e-5)

  images = rng.randn(*syn_lax.shape).astype(np.float32)
  ana_mm = np.asarray(conv_matmul.analyze_matmul(
      jnp.asarray(images), jnp.asarray(d), stride, (sh, sw)))
  ana_lax = np.asarray(_lax_analyze(
      jnp.asarray(images), jnp.asarray(d), stride))
  np.testing.assert_allclose(ana_mm, ana_lax, atol=2e-5)


def test_unsupported_geometry_detected():
  assert not conv_matmul.supported((4, 1, 5, 5), (2, 2))  # 5 % 2 != 0
  assert conv_matmul.supported((4, 1, 6, 4), (2, 2))


def test_gradient_through_matmul_synthesis_matches(rng):
  """Autodiff kernel gradients agree between formulations (the dict
  update rules rely on this)."""
  b, s, c, k = 2, 6, 1, 4
  stride = (2, 2)
  d = rng.randn(s, c, k, k).astype(np.float32)
  codes = rng.randn(b, s, 4, 4).astype(np.float32)
  target = rng.randn(b, c, (4 - 1) * 2 + k, (4 - 1) * 2 + k).astype(
      np.float32)

  def loss(fn, dd):
    r = fn(jnp.asarray(codes), dd, stride) - target
    return 0.5 * jnp.vdot(r, r)

  g_mm = np.asarray(jax.grad(
      lambda dd: loss(conv_matmul.synthesize_matmul, dd))(
          jnp.asarray(d)))
  g_lax = np.asarray(jax.grad(
      lambda dd: loss(_lax_synthesize, dd))(jnp.asarray(d)))
  np.testing.assert_allclose(g_mm, g_lax, atol=2e-4)
