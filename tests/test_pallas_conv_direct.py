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
