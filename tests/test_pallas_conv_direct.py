"""Direct-formulation fused conv kernel (ops/pallas_conv_direct) == the
XLA 'gram' formulation solver (interpret mode on CPU): block-matmul
synthesis/analysis with the mask applied elementwise must reproduce the
corrected gram operator across geometries, channels, variants, warm
starts, and batch tiling -- whenever kernel % stride == 0."""
import numpy as np
import pytest

import jax.numpy as jnp

from vtc_tpu.analysis_transforms.convolutional import ista_fista
from vtc_tpu.ops import conv_shapes
from vtc_tpu.ops import lipschitz as lipschitz_ops
from vtc_tpu.ops import pallas_conv_direct


def _setup(rng, b, s, c, kdim, stride, img):
  pad = conv_shapes.get_padding_amt(img, kdim, stride)
  padding = (pad, pad)
  height = img + pad[0] + pad[1]
  d = rng.randn(s, c, kdim, kdim).astype(np.float32)
  d /= np.sqrt((d ** 2).sum(axis=(1, 2, 3), keepdims=True))
  x = np.zeros((b, c, height, height), np.float32)
  x[:, :, pad[0]:height - pad[1], pad[0]:height - pad[1]] = (
      0.3 * rng.randn(b, c, img, img))
  step = lipschitz_ops.fista_stepsize(d.reshape(s, -1))
  return x, d, padding, step


@pytest.mark.parametrize("b,s,c,kdim,stride,img", [
    (3, 6, 1, 4, 2, 12),     # reference-style geometry, small
    (2, 8, 2, 6, 3, 12),     # multi-channel, stride 3
    (2, 6, 1, 4, 4, 12),     # kernel == stride (R = 1, no overlap)
    (5, 64, 1, 16, 8, 48),   # the reference config's shape family
])
@pytest.mark.parametrize("variant", ["ista", "fista"])
def test_matches_xla_gram_solver(rng, b, s, c, kdim, stride, img,
                                 variant):
  x, d, padding, step = _setup(rng, b, s, c, kdim, stride, img)
  assert pallas_conv_direct.supported(x.shape, d.shape,
                                      (stride, stride))
  want = np.asarray(ista_fista.run(
      x, d, (stride, stride), padding, 0.02, 10, variant=variant,
      stepsize=step, formulation="gram"))
  got = np.asarray(ista_fista.run(
      x, d, (stride, stride), padding, 0.02, 10, variant=variant,
      stepsize=step, formulation="pallas"))
  np.testing.assert_allclose(got, want, atol=1e-4)


def test_warm_start_thresholds_and_tiling(rng):
  x, d, padding, step = _setup(rng, 5, 6, 1, 4, 2, 12)
  init = np.asarray(ista_fista.run(
      x, d, (2, 2), padding, 0.02, 5, stepsize=step))
  for kwargs in (dict(initial_codes=init), dict(nonnegative_only=True),
                 dict(hard_threshold=True)):
    want = np.asarray(ista_fista.run(
        x, d, (2, 2), padding, 0.02, 8, stepsize=step,
        formulation="gram", **kwargs))
    got = np.asarray(ista_fista.run(
        x, d, (2, 2), padding, 0.02, 8, stepsize=step,
        formulation="pallas", **kwargs))
    np.testing.assert_allclose(got, want, atol=1e-4,
                               err_msg=str(kwargs.keys()))
  # explicit batch tiling that does NOT divide the batch (b=5, tile=2)
  got = np.asarray(pallas_conv_direct.conv_direct_solve_pallas(
      jnp.asarray(x), jnp.asarray(d), 0.02, 8, step,
      kernel_stride=(2, 2), padding=padding, batch_tile=2,
      interpret=True))
  want = np.asarray(ista_fista.run(
      x, d, (2, 2), padding, 0.02, 8, stepsize=step,
      formulation="gram"))
  np.testing.assert_allclose(got, want, atol=1e-4)


def test_supported_gate():
  # kernel % stride != 0 -> not supported (falls back to the gram
  # kernel / XLA path)
  assert not pallas_conv_direct.supported(
      (2, 1, 12, 12), (6, 1, 5, 5), (2, 2))
  # image dims not divisible by stride -> not supported
  assert not pallas_conv_direct.supported(
      (2, 1, 13, 13), (6, 1, 4, 4), (2, 2))
  assert pallas_conv_direct.supported(
      (2, 1, 272, 272), (64, 1, 16, 16), (8, 8))

@pytest.mark.parametrize("b,s,c,kdim,stride,img", [
    (3, 6, 1, 4, 2, 12),
    (2, 8, 2, 6, 3, 12),
    (2, 6, 1, 4, 4, 12),     # R = 1, no overlap
    (5, 64, 1, 16, 8, 48),   # reference config shape family
])
def test_block_dict_gradient_matches_autodiff(rng, b, s, c, kdim,
                                              stride, img):
  """The stride-block-space dictionary gradient (two deep matmuls
  against the rolled code stack) == autodiff through the image-space
  synthesis (ops/convolutions.dictionary_gradient)."""
  from vtc_tpu.ops import convolutions as conv_ops
  x, d, padding, _ = _setup(rng, b, s, c, kdim, stride, img)
  ch = conv_shapes.code_dim_from_padded_img_dim(x.shape[2], kdim, stride)
  cw = conv_shapes.code_dim_from_padded_img_dim(x.shape[3], kdim, stride)
  codes = (rng.randn(b, s, ch, cw) *
           (rng.rand(b, s, ch, cw) > 0.7)).astype(np.float32)
  mask = conv_shapes.create_mask(x.shape, padding, jnp.float32)
  want = np.asarray(conv_ops.dictionary_gradient(
      jnp.asarray(x), jnp.asarray(codes), jnp.asarray(d),
      (stride, stride), mask))
  stats = pallas_conv_direct.build_block_update_stats(
      jnp.asarray(x), jnp.asarray(codes), d.shape, (stride, stride),
      padding)
  got = np.asarray(pallas_conv_direct.dictionary_gradient_from_block_stats(
      stats, jnp.asarray(d)))
  np.testing.assert_allclose(got, want, atol=1e-4 * max(
      1.0, float(np.abs(want).max())))


@pytest.mark.parametrize("update_alg", ["sc_steepest_descent",
                                        "sc_cheap_quadratic_descent"])
def test_block_update_formulation_matches_gram(rng, update_alg):
  """conv update rules: 'block' formulation == 'gram' over several
  multi-iteration update steps."""
  from vtc_tpu.dict_update_rules.convolutional import (
      sc_cheap_quadratic_descent as cqd, sc_steepest_descent as sd)
  x, d, padding, step = _setup(rng, 3, 8, 1, 4, 2, 12)
  ch = conv_shapes.code_dim_from_padded_img_dim(x.shape[2], 4, 2)
  codes = (rng.randn(3, 8, ch, ch) *
           (rng.rand(3, 8, ch, ch) > 0.7)).astype(np.float32)
  if update_alg == "sc_steepest_descent":
    run = lambda f: sd.run(x, d, codes, (2, 2), padding, stepsize=0.05,
                           num_iters=3, formulation=f)
  else:
    h = np.full((8,), 0.02, np.float32)
    run = lambda f: cqd.run(x, d, codes, h, (2, 2), padding,
                            stepsize=0.05, num_iters=3, formulation=f)
  np.testing.assert_allclose(np.asarray(run("block")),
                             np.asarray(run("gram")), atol=1e-5)


def test_in_kernel_early_stopping_matches_gram(rng):
  """formulation='pallas' + early_stopping_epsilon runs the in-kernel
  while_loop (no gram downgrade) when the batch fits one tile, and the
  stop trajectory matches the XLA gram path for a mid-run-triggering
  eps and a never-triggering eps."""
  from vtc_tpu.ops.pallas_conv_direct import early_stop_supported

  x, d, padding, step = _setup(rng, 4, 6, 1, 4, 2, 12)
  assert early_stop_supported(x.shape, d.shape, (2, 2))
  # 0.2x damping: the flat-kernel L underestimates the overlapping
  # conv operator's on random data, and a divergent FISTA would compare
  # at meaningless scale (see tests/test_pallas_conv_train._assert_close)
  for eps in (3e-2, 1e-12):
    want = np.asarray(ista_fista.run(
        x, d, (2, 2), padding, 0.02, 15, stepsize=0.2 * step,
        early_stopping_epsilon=eps, formulation="gram"))
    got = np.asarray(ista_fista.run(
        x, d, (2, 2), padding, 0.02, 15, stepsize=0.2 * step,
        early_stopping_epsilon=eps, formulation="pallas"))
    np.testing.assert_allclose(got, want, atol=1e-4,
                               err_msg=f"eps={eps}")


@pytest.mark.quick
def test_mxu_precision_tiers(rng):
  """Inference tiers on the direct kernel: 'bf16x3' stays near the
  'highest' parity solve; 'bf16' solves finite (screening grade); the
  gram fallback geometry asserts rather than silently running slow."""
  x, d, padding, step = _setup(rng, 3, 6, 1, 4, 2, 12)
  base = np.asarray(ista_fista.run(
      x, d, (2, 2), padding, 0.02, 10, stepsize=step,
      formulation="pallas"))
  x3 = np.asarray(ista_fista.run(
      x, d, (2, 2), padding, 0.02, 10, stepsize=step,
      formulation="pallas", mxu_precision="bf16x3"))
  bf = np.asarray(ista_fista.run(
      x, d, (2, 2), padding, 0.02, 10, stepsize=step,
      formulation="pallas", mxu_precision="bf16"))
  # bf16x3 error is RELATIVE to the code scale (conv codes reach ~30
  # here): ~1e-4 relative, like the training tier
  np.testing.assert_allclose(x3, base, rtol=1e-3, atol=1e-3)
  assert np.isfinite(bf).all()
  # stride does not divide the kernel: no direct-kernel geometry, so a
  # non-default tier must assert instead of silently solving slow
  x2, d2, padding2, step2 = _setup(rng, 2, 6, 1, 4, 3, 12)
  assert not pallas_conv_direct.supported(x2.shape, d2.shape, (3, 3))
  with pytest.raises(AssertionError, match="tiers"):
    ista_fista.run(x2, d2, (3, 3), padding2, 0.02, 5, stepsize=step2,
                   formulation="pallas", mxu_precision="bf16x3")
