"""Fused Pallas conv FISTA solver == the XLA 'gram' formulation solver
(interpret mode on CPU), across paddings, strides, variants, warm
starts, and batch tiling."""
import numpy as np
import pytest

import jax.numpy as jnp

from vtc_tpu.analysis_transforms.convolutional import ista_fista
from vtc_tpu.ops import conv_shapes
from vtc_tpu.ops.pallas_conv_fista import conv_fista_solve_pallas


def _setup(seed, b, c, kdim, stride, img, padding):
  rng = np.random.RandomState(seed)
  if padding is not None:
    (lv, tv), (lh, th) = padding
    height, width = img + lv + tv, img + lh + th
  else:
    height = width = img
  images = rng.randn(b, c, height, width).astype(np.float32)
  s = 6
  d = rng.randn(s, c, kdim, kdim).astype(np.float32)
  d /= np.sqrt((d**2).sum(axis=(1, 2, 3), keepdims=True))
  return images, d


CASES = [
    (1, 4, (2, 2), 8, ((2, 2), (2, 2))),
    (1, 4, (2, 2), 8, None),
    (2, 4, (2, 2), 8, ((2, 2), (2, 2))),
    (1, 6, (2, 3), 9, ((4, 3), (3, 3))),
    (1, 5, (2, 2), 10, ((3, 2), (3, 2))),
]


@pytest.mark.parametrize("c,kdim,stride,img,padding", CASES)
def test_matches_xla_gram_solver(c, kdim, stride, img, padding):
  images, d = _setup(0, 3, c, kdim, stride, img, padding)
  ref = np.asarray(ista_fista.run(
      images, d, stride, padding, 0.03, 15, variant="fista",
      formulation="gram"))
  got = np.asarray(conv_fista_solve_pallas(
      jnp.asarray(images), jnp.asarray(d), 0.03, 15,
      stepsize=None_stepsize(d), kernel_stride=stride, padding=padding,
      interpret=True))
  np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def None_stepsize(d):
  from vtc_tpu.ops import lipschitz as lipschitz_ops
  return lipschitz_ops.fista_stepsize(
      jnp.asarray(d).reshape(d.shape[0], -1), "eigvalsh")


@pytest.mark.parametrize("variant,nonneg,hard", [
    ("ista", False, False), ("fista", True, False),
    ("fista", False, True)])
def test_variants(variant, nonneg, hard):
  images, d = _setup(1, 2, 1, 4, (2, 2), 8, ((2, 2), (2, 2)))
  ref = np.asarray(ista_fista.run(
      images, d, (2, 2), ((2, 2), (2, 2)), 0.03, 10, variant=variant,
      nonnegative_only=nonneg, hard_threshold=hard, formulation="gram"))
  got = np.asarray(conv_fista_solve_pallas(
      jnp.asarray(images), jnp.asarray(d), 0.03, 10,
      stepsize=None_stepsize(d), kernel_stride=(2, 2),
      padding=((2, 2), (2, 2)), variant=variant, nonneg=nonneg,
      hard=hard, interpret=True))
  np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def test_run_dispatches_pallas_formulation():
  """run(formulation='pallas') matches the gram formulation, and early
  stopping falls back to the XLA path instead of failing."""
  images, d = _setup(4, 2, 1, 4, (2, 2), 8, ((2, 2), (2, 2)))
  ref = np.asarray(ista_fista.run(
      images, d, (2, 2), ((2, 2), (2, 2)), 0.03, 10, variant="ista",
      formulation="gram"))
  got = np.asarray(ista_fista.run(
      images, d, (2, 2), ((2, 2), (2, 2)), 0.03, 10, variant="ista",
      formulation="pallas"))
  np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)
  es = np.asarray(ista_fista.run(
      images, d, (2, 2), ((2, 2), (2, 2)), 0.03, 10, variant="ista",
      early_stopping_epsilon=1e-9, formulation="pallas"))
  assert es.shape == ref.shape


def test_warm_start_and_batch_tiling():
  images, d = _setup(2, 5, 1, 4, (2, 2), 8, ((2, 2), (2, 2)))
  sh = conv_shapes.code_dim_from_padded_img_dim(12, 4, 2)
  rng = np.random.RandomState(3)
  init = rng.randn(5, 6, sh, sh).astype(np.float32)
  ref = np.asarray(ista_fista.run(
      images, d, (2, 2), ((2, 2), (2, 2)), 0.03, 12,
      initial_codes=init, formulation="gram"))
  got = np.asarray(conv_fista_solve_pallas(
      jnp.asarray(images), jnp.asarray(d), 0.03, 12,
      stepsize=None_stepsize(d), kernel_stride=(2, 2),
      padding=((2, 2), (2, 2)), initial_codes=init, batch_tile=2,
      interpret=True))
  np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)
