"""Tests for the convolutional solver and dictionary updates.

Includes the fc<->conv equivalence check the reference left as a TODO
(tests/ista_fista_2.py:70: "compare convolutional to fully-connected").
"""
import numpy as np
import pytest

from vtc_tpu.analysis_transforms.convolutional import ista_fista as conv_if
from vtc_tpu.analysis_transforms.fully_connected import ista_fista as fc_if
from vtc_tpu.dict_update_rules.convolutional import (
    sc_cheap_quadratic_descent, sc_steepest_descent)
from vtc_tpu.ops import conv_shapes
from vtc_tpu.ops import convolutions as conv_ops

import numpy_oracle as oracle


def _conv_problem(rng, b=3, s=8, c=1, k=4, img=16, stride=(2, 2),
                  pad=((2, 2), (2, 2))):
  dictionary = rng.randn(s, c, k, k)
  dictionary /= np.sqrt(
      np.sum(dictionary**2, axis=(1, 2, 3), keepdims=True))
  h = img + pad[0][0] + pad[0][1]
  w = img + pad[1][0] + pad[1][1]
  images = np.zeros((b, c, h, w), dtype=np.float64)
  images[:, :, pad[0][0]:h - pad[0][1], pad[1][0]:w - pad[1][1]] = (
      rng.randn(b, c, img, img))
  return images, dictionary, stride, pad


def test_synthesize_matches_dense_operator(rng):
  images, dictionary, stride, _ = _conv_problem(rng)
  syn, (sh, sw) = oracle.conv_synthesis_matrix(
      dictionary, images.shape, stride)
  codes = rng.randn(images.shape[0], dictionary.shape[0], sh, sw)
  want = (codes.reshape(codes.shape[0], -1) @ syn).reshape(images.shape)
  got = np.asarray(conv_ops.synthesize(
      codes.astype(np.float32), dictionary.astype(np.float32), stride))
  np.testing.assert_allclose(got, want, atol=1e-4)


def test_analyze_is_adjoint_of_synthesize(rng):
  images, dictionary, stride, _ = _conv_problem(rng)
  syn, (sh, sw) = oracle.conv_synthesis_matrix(
      dictionary, images.shape, stride)
  want = (images.reshape(images.shape[0], -1) @ syn.T).reshape(
      images.shape[0], dictionary.shape[0], sh, sw)
  got = np.asarray(conv_ops.analyze(
      images.astype(np.float32), dictionary.astype(np.float32), stride))
  np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("variant", ["ista", "fista"])
def test_conv_solver_matches_dense_oracle(rng, variant):
  """Overlapping strided kernels.  Note the reference's stepsize heuristic
  (Gram of the flattened kernels) is NOT a true Lipschitz bound when
  kernels overlap, so the default-stepsize iteration can diverge and
  amplify fp32-vs-fp64 drift; we pin a safe stepsize (heuristic / overlap
  factor) for the golden comparison and check the default-stepsize path
  separately below."""
  images, dictionary, stride, pad = _conv_problem(rng)
  lam, iters = 0.05, 15
  flat = dictionary.reshape(dictionary.shape[0], -1)
  safe_step = 0.25 / np.linalg.eigvalsh(flat @ flat.T)[-1]
  want = oracle.conv_ista_fista(
      images, dictionary, stride, pad, lam, iters, variant,
      stepsize=safe_step)
  got = np.asarray(conv_if.run(
      images.astype(np.float32), dictionary.astype(np.float32), stride,
      pad, lam, iters, variant=variant, stepsize=safe_step))
  np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv_solver_default_stepsize_matches_oracle(rng):
  """Default stepsize path (reference heuristic) over a few iterations."""
  images, dictionary, stride, pad = _conv_problem(rng)
  lam, iters = 0.05, 8
  want = oracle.conv_ista_fista(
      images, dictionary, stride, pad, lam, iters, "ista")
  got = np.asarray(conv_if.run(
      images.astype(np.float32), dictionary.astype(np.float32), stride,
      pad, lam, iters, variant="ista"))
  np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv_equals_fc_when_kernel_covers_image(rng):
  """kernel size == image size, stride == image size, no padding:
  convolutional sparse coding degenerates to fully-connected."""
  b, s, c, k = 4, 12, 1, 8
  dictionary = rng.randn(s, c, k, k)
  dictionary /= np.sqrt(
      np.sum(dictionary**2, axis=(1, 2, 3), keepdims=True))
  images = rng.randn(b, c, k, k)
  lam, iters = 0.1, 20
  conv_codes = np.asarray(conv_if.run(
      images.astype(np.float32), dictionary.astype(np.float32), (k, k),
      None, lam, iters))
  fc_codes = np.asarray(fc_if.run(
      images.reshape(b, -1).astype(np.float32),
      dictionary.reshape(s, -1).astype(np.float32), lam, iters,
      formulation="direct"))
  np.testing.assert_allclose(
      conv_codes.reshape(b, s), fc_codes, atol=1e-4)


def test_conv_dict_updates_run_and_normalize(rng):
  images, dictionary, stride, pad = _conv_problem(rng)
  codes = np.asarray(conv_if.run(
      images.astype(np.float32), dictionary.astype(np.float32), stride,
      pad, 0.05, 10))
  new_d = np.asarray(sc_steepest_descent.run(
      images, dictionary, codes, stride, pad, stepsize=0.01))
  assert new_d.shape == dictionary.shape
  np.testing.assert_allclose(
      np.sqrt(np.sum(new_d**2, axis=(1, 2, 3))), 1.0, atol=1e-5)
  assert not np.allclose(new_d, dictionary)

  hessian = np.abs(rng.rand(dictionary.shape[0]))
  new_d2 = np.asarray(sc_cheap_quadratic_descent.run(
      images, dictionary, codes, hessian, stride, pad, stepsize=0.01))
  np.testing.assert_allclose(
      np.sqrt(np.sum(new_d2**2, axis=(1, 2, 3))), 1.0, atol=1e-5)


def test_conv_dict_gradient_matches_dense(rng):
  """Kernel gradient via autodiff == dense-operator gradient."""
  images, dictionary, stride, pad = _conv_problem(rng, b=2, s=4, img=8,
                                                  k=4, stride=(2, 2),
                                                  pad=((2, 2), (2, 2)))
  syn, (sh, sw) = oracle.conv_synthesis_matrix(
      dictionary, images.shape, stride)
  codes = rng.randn(2, 4, sh, sw)
  mask = np.asarray(conv_shapes.create_mask(images.shape, pad))
  mask_full = np.broadcast_to(mask, images.shape)

  # dense gradient: d/dW 0.5||mask*(codes Syn(W) - X)||^2 / b via finite
  # differences on the synthesis matrix structure -> use matmul identity:
  resid = (codes.reshape(2, -1) @ syn - images.reshape(2, -1)
           ) * mask_full.reshape(2, -1)
  # gradient w.r.t. each kernel coefficient equals correlation of residual
  # with the code maps; recover it by building the dense operator of the
  # map W -> recon for fixed codes.  Cheaper: autodiff in numpy via the
  # known adjoint: dL/dW = analyze-like op.  Here we check against JAX's
  # own autodiff in float64 instead (independent of our explicit op).
  import jax
  import jax.numpy as jnp

  def loss64(d):
    recon = conv_ops.synthesize(codes, d, stride)
    r = jnp.asarray(mask_full) * (recon - images)
    return 0.5 * jnp.vdot(r, r)

  with jax.enable_x64(True):
    want = np.asarray(jax.grad(loss64)(jnp.asarray(dictionary))) / 2
  got = np.asarray(conv_ops.dictionary_gradient(
      images.astype(np.float32), codes.astype(np.float32),
      dictionary.astype(np.float32), stride,
      mask.astype(np.float32)))
  np.testing.assert_allclose(got, want, atol=1e-4)
