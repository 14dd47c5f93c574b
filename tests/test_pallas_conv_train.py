"""Fused whole-segment CONV train kernel vs the composed XLA path
(interpret mode on the CPU test mesh).  The invariant: one kernel launch
over k batches must reproduce the scan of [power_iterate on the flat
kernels -> raw conv step (gram solve + block update)] that the scanned
conv trainer runs, to float tolerance."""
import numpy as np
import pytest

import jax.numpy as jnp

from vtc_tpu.ops import conv_shapes
from vtc_tpu.ops import lipschitz as lip
from vtc_tpu.ops.pallas_conv_train import (fused_conv_segment_supported,
                                           fused_conv_train_segment_pallas)
from vtc_tpu.training import sparse_coding as sc


def _reference_segment(d0, h0, v0, batches, kernel_stride, padding, sw,
                       n_it, upd_step, upd_niters, variant, update_alg,
                       nonneg=False, hard=False, renormalize=True,
                       power_iters=2):
  raw = sc.build_raw_step_fn(
      "convolutional", variant, update_alg, nonneg=nonneg,
      hard_threshold=hard, renormalize=renormalize,
      kernel_stride=kernel_stride, padding=padding,
      conv_formulation="gram", compute_stepsize_in_step=False)
  d, h, v = jnp.asarray(d0), jnp.asarray(h0), jnp.asarray(v0)
  codes = None
  for batch in batches:
    eigval, v = lip.power_iterate(d.reshape(d.shape[0], -1), v,
                                  num_iters=power_iters)
    d, h, codes = raw(d, h, jnp.asarray(batch), jnp.float32(sw),
                      jnp.int32(n_it), jnp.float32(upd_step),
                      upd_niters, 1.0 / eigval)
  return np.asarray(d), np.asarray(h), np.asarray(v), np.asarray(codes)


def _assert_close(g, w, tol, name):
  """Scale-aware comparison: on random data the flat-kernel Lipschitz
  UNDERESTIMATES the conv operator's L, so FISTA legitimately diverges
  and float32 rounding scales with the largest magnitudes mixed into
  the dot products (documented measurement trap; both paths compute
  identical math).  atol scales with max|want|."""
  w = np.asarray(w)
  np.testing.assert_allclose(
      np.asarray(g), w, rtol=tol,
      atol=tol * max(1.0, float(np.abs(w).max())), err_msg=name)


def _problem(rng, k=3, b=3, s=8, c=1, kdim=4, stride=2, img=12):
  pad = conv_shapes.get_padding_amt(img, kdim, stride)
  padding = (pad, pad)
  height = img + pad[0] + pad[1]
  d = rng.randn(s, c, kdim, kdim).astype(np.float32)
  d /= np.sqrt((d ** 2).sum(axis=(1, 2, 3), keepdims=True))
  x = np.zeros((k, b, c, height, height), np.float32)
  x[:, :, :, pad[0]:height - pad[1], pad[0]:height - pad[1]] = (
      0.3 * rng.randn(k, b, c, img, img))
  h = np.abs(rng.rand(s)).astype(np.float32) * 0.01
  v = rng.randn(min(s, c * kdim * kdim)).astype(np.float32)
  return d, h, v, x, (stride, stride), padding


@pytest.mark.parametrize("variant,update_alg", [
    ("fista", "sc_cheap_quadratic_descent"),
    ("fista", "sc_steepest_descent"),
    ("ista", "sc_cheap_quadratic_descent"),
])
def test_fused_conv_segment_matches_composed_path(rng, variant,
                                                  update_alg):
  d, h, v, x, strides, padding = _problem(rng)
  assert fused_conv_segment_supported(
      x.shape[1:], d.shape, strides, variant, update_alg)
  # single step: strict (no trajectory feedback)
  want1 = _reference_segment(d, h, v, x[:1], strides, padding, 0.05,
                             12, 0.1, 1, variant, update_alg)
  got1 = fused_conv_train_segment_pallas(
      d, h, v, x[:1], 0.05, 12, 0.1, kernel_stride=strides,
      padding=padding, variant=variant, update_alg=update_alg,
      power_iters=2, interpret=True)
  for w, g, name in zip(want1, got1, ["dict", "hessian", "eigvec",
                                      "codes"]):
    _assert_close(g, w, 2e-5, name)
  # multi-step trajectory (chaos-tolerant bounds for the cheap-quad
  # Hessian EMA feedback, as in test_pallas_train_step)
  want = _reference_segment(d, h, v, x, strides, padding, 0.05, 12,
                            0.1, 1, variant, update_alg)
  got = fused_conv_train_segment_pallas(
      d, h, v, x, 0.05, 12, 0.1, kernel_stride=strides,
      padding=padding, variant=variant, update_alg=update_alg,
      power_iters=2, interpret=True)
  chaotic = update_alg == "sc_cheap_quadratic_descent"
  tols = {"dict": 1e-4 if chaotic else 2e-5,
          "hessian": 1e-3 if chaotic else 2e-5, "eigvec": 2e-5,
          "codes": 5e-3 if chaotic else 2e-5}
  for w, g, name in zip(want, got, ["dict", "hessian", "eigvec",
                                    "codes"]):
    _assert_close(g, w, tols[name], name)


def test_fused_conv_segment_convergent_strict(rng):
  """stride == kernel (R=1): the flat-kernel Lipschitz is EXACT, the
  solve converges, and parity holds at strict per-element tolerance."""
  d, h, v, x, strides, padding = _problem(rng, kdim=4, stride=4)
  want = _reference_segment(d, h, v, x, strides, padding, 0.05, 12,
                            0.1, 1, "fista", "sc_cheap_quadratic_descent")
  got = fused_conv_train_segment_pallas(
      d, h, v, x, 0.05, 12, 0.1, kernel_stride=strides,
      padding=padding, power_iters=2, interpret=True)
  for w, g, name in zip(want, got, ["dict", "hessian", "eigvec",
                                    "codes"]):
    np.testing.assert_allclose(np.asarray(g), w, atol=2e-5,
                               err_msg=name)


def test_fused_conv_segment_multi_update_iters(rng):
  """upd_num_iters > 1: the single-tile kernel recomputes the gradient
  at the CURRENT dictionary each iteration (exact semantics)."""
  d, h, v, x, strides, padding = _problem(rng, k=2)
  want = _reference_segment(d, h, v, x, strides, padding, 0.03, 8,
                            0.05, 3, "fista",
                            "sc_cheap_quadratic_descent")
  got = fused_conv_train_segment_pallas(
      d, h, v, x, 0.03, 8, 0.05, kernel_stride=strides,
      padding=padding, upd_num_iters=3, power_iters=2, interpret=True)
  for w, g, name in zip(want, got, ["dict", "hessian", "eigvec",
                                    "codes"]):
    _assert_close(g, w, 1e-4, name)


def test_fused_conv_segment_batch_tiled(rng):
  """Batch-tiled grid (step, tile): per-tile gradient/stat accumulation
  with the update on the step's last tile must match the whole-batch
  kernel AND the composed path, including a padded final tile (b=5,
  tile=2)."""
  d, h, v, x, strides, padding = _problem(rng, k=2, b=5)
  want = _reference_segment(d, h, v, x, strides, padding, 0.05, 10,
                            0.1, 1, "fista", "sc_cheap_quadratic_descent")
  got = fused_conv_train_segment_pallas(
      d, h, v, x, 0.05, 10, 0.1, kernel_stride=strides,
      padding=padding, power_iters=2, batch_tile=2, interpret=True)
  for w, g, name in zip(want, got, ["dict", "hessian", "eigvec",
                                    "codes"]):
    _assert_close(g, w, 1e-4, name)


def test_fused_conv_segment_nonneg_and_steepest_norenorm(rng):
  d, h, v, x, strides, padding = _problem(rng, k=2)
  for kwargs in (dict(nonneg=True), dict(renormalize=False)):
    want = _reference_segment(
        d, h, v, x, strides, padding, 0.05, 10, 0.1, 1, "fista",
        "sc_steepest_descent", **kwargs)
    got = fused_conv_train_segment_pallas(
        d, h, v, x, 0.05, 10, 0.1, kernel_stride=strides,
        padding=padding, update_alg="sc_steepest_descent",
        power_iters=2, interpret=True, **kwargs)
    for w, g, name in zip(want, got, ["dict", "hessian", "eigvec",
                                      "codes"]):
      _assert_close(g, w, 2e-5, str((kwargs, name)))


def test_supported_gate():
  # reference config geometry: supported single-tile
  assert fused_conv_segment_supported(
      (5, 1, 272, 272), (64, 1, 16, 16), (8, 8), "fista",
      "sc_cheap_quadratic_descent")
  # kernel % stride != 0 -> geometry unsupported
  assert not fused_conv_segment_supported(
      (5, 1, 272, 272), (64, 1, 15, 15), (8, 8), "fista",
      "sc_cheap_quadratic_descent")
  # groups / wrong algs fall back
  assert not fused_conv_segment_supported(
      (5, 1, 272, 272), (64, 1, 16, 16), (8, 8), "fista",
      "sc_cheap_quadratic_descent", group_assignments=[[0, 1]])
  assert not fused_conv_segment_supported(
      (5, 1, 272, 272), (64, 1, 16, 16), (8, 8), "subspace_fista",
      "sc_cheap_quadratic_descent")


def test_conv_solve_stats_matches_pieces(rng):
  """The DP local-step kernel (solve + unaveraged block-space update
  stats) must reproduce the composed pieces: power_iterate stepsize,
  the gram solver's codes, the block-stats dictionary gradient, and
  the Hessian statistic."""
  import jax.numpy as jnp
  from vtc_tpu.analysis_transforms.convolutional import ista_fista
  from vtc_tpu.ops import pallas_conv_direct
  from vtc_tpu.ops.pallas_conv_train import conv_solve_stats_pallas

  d, h, v, x, strides, padding = _problem(rng, k=1)
  del h
  batch = x[0]
  codes, grad_sum, stat, v_new, eta = conv_solve_stats_pallas(
      d, v, batch, 0.05, 10, kernel_stride=strides, padding=padding,
      power_iters=2, interpret=True)

  eigval, v_want = lip.power_iterate(
      jnp.asarray(d).reshape(d.shape[0], -1), jnp.asarray(v),
      num_iters=2)
  _assert_close(v_new, v_want, 2e-5, "eigvec")
  _assert_close(eta, 1.0 / np.asarray(eigval), 2e-5, "eta")

  codes_want = ista_fista.run(
      batch, d, strides, padding, 0.05, 10, stepsize=1.0 / eigval,
      formulation="gram")
  _assert_close(codes, codes_want, 2e-5, "codes")

  stats = pallas_conv_direct.build_block_update_stats(
      jnp.asarray(batch), codes_want, d.shape, strides, padding)
  grad_want = pallas_conv_direct.dictionary_gradient_from_block_stats(
      stats, jnp.asarray(d))
  _assert_close(grad_sum / batch.shape[0], grad_want, 2e-5, "grad")

  stat_want = np.asarray(codes_want ** 2).sum(axis=(2, 3)).sum(axis=0)
  _assert_close(stat, stat_want, 2e-5, "stat")


def test_fused_conv_segment_tiled_multi_update_gram_form(rng):
  """Batch-tiled + upd_num_iters > 1: with a stride-block-uniform mask
  the tiles accumulate gram-form stats (C_m, B_x) and the last tile
  runs EXACT multi-iteration updates -- must match the composed path
  and the supported() gate must accept the combination."""
  d, h, v, x, strides, padding = _problem(rng, k=2, b=5)
  assert all(p % strides[0] == 0 for pair in padding for p in pair)
  assert fused_conv_segment_supported(
      x.shape[1:], d.shape, strides, "fista",
      "sc_cheap_quadratic_descent", upd_num_iters=3, padding=padding)
  # without padding info the combination is conservatively rejected
  # only when the batch actually tiles; at this size the whole batch
  # fits one tile, so force tiling via batch_tile in the call below
  want = _reference_segment(d, h, v, x, strides, padding, 0.05, 10,
                            0.1, 3, "fista",
                            "sc_cheap_quadratic_descent")
  got = fused_conv_train_segment_pallas(
      d, h, v, x, 0.05, 10, 0.1, kernel_stride=strides,
      padding=padding, upd_num_iters=3, power_iters=2, batch_tile=2,
      interpret=True)
  for w, g, name in zip(want, got, ["dict", "hessian", "eigvec",
                                    "codes"]):
    _assert_close(g, w, 1e-4, name)


def test_fused_conv_segment_bf16_training_mode(rng):
  """The opt-in bf16 training-speed mode must stay healthy on the conv
  segment: finite, unit-norm kernels, and trajectory within
  update-scale distance of the f32 run (convergent stride == kernel
  geometry so the f32 trajectory itself is stable)."""
  d, h, v, x, strides, padding = _problem(rng, k=6, kdim=4, stride=4)
  d32 = fused_conv_train_segment_pallas(
      d, h, v, x, 0.05, 12, 0.05, kernel_stride=strides,
      padding=padding, power_iters=2, interpret=True)[0]
  dbf = fused_conv_train_segment_pallas(
      d, h, v, x, 0.05, 12, 0.05, kernel_stride=strides,
      padding=padding, power_iters=2, interpret=True, mxu="bf16")[0]
  dbf = np.asarray(dbf)
  assert np.isfinite(dbf).all()
  norms = np.sqrt((dbf ** 2).sum(axis=(1, 2, 3)))
  np.testing.assert_allclose(norms, 1.0, atol=1e-5)
  assert np.abs(dbf - np.asarray(d32)).max() < 0.1
  # batch-tiled variant too (single-iteration update: residual form)
  d32t = fused_conv_train_segment_pallas(
      d, h, v, x, 0.05, 12, 0.05, kernel_stride=strides,
      padding=padding, power_iters=2, interpret=True, batch_tile=1)[0]
  dbft = fused_conv_train_segment_pallas(
      d, h, v, x, 0.05, 12, 0.05, kernel_stride=strides,
      padding=padding, power_iters=2, interpret=True, batch_tile=1,
      mxu="bf16")[0]
  dbft = np.asarray(dbft)
  assert np.isfinite(dbft).all()
  assert np.abs(dbft - np.asarray(d32t)).max() < 0.1


def test_fused_conv_segment_bf16x3_tracks_f32(rng):
  """The 'bf16x3' tier must track the f32 conv trajectory at
  near-parity tolerance (convergent stride == kernel geometry)."""
  d, h, v, x, strides, padding = _problem(rng, k=4, kdim=4, stride=4)
  d32 = fused_conv_train_segment_pallas(
      d, h, v, x, 0.05, 12, 0.05, kernel_stride=strides,
      padding=padding, power_iters=2, interpret=True)[0]
  dx3 = fused_conv_train_segment_pallas(
      d, h, v, x, 0.05, 12, 0.05, kernel_stride=strides,
      padding=padding, power_iters=2, interpret=True, mxu="bf16x3")[0]
  np.testing.assert_allclose(np.asarray(dx3), np.asarray(d32),
                             atol=5e-3)


def test_fused_conv_segment_bf16x5_tracks_f32(rng):
  """The 'bf16x5' near-parity tier (5-pass exact-split deep
  contractions) must track the f32 conv trajectory an order tighter
  than 'bf16x3' (BENCH_NOTES UPDATE 29)."""
  d, h, v, x, strides, padding = _problem(rng, k=4, kdim=4, stride=4)
  common = dict(kernel_stride=strides, padding=padding, power_iters=2,
                interpret=True)
  d32 = fused_conv_train_segment_pallas(
      d, h, v, x, 0.05, 12, 0.05, **common)[0]
  dx5 = fused_conv_train_segment_pallas(
      d, h, v, x, 0.05, 12, 0.05, mxu="bf16x5", **common)[0]
  dx3 = fused_conv_train_segment_pallas(
      d, h, v, x, 0.05, 12, 0.05, mxu="bf16x3", **common)[0]
  e5 = np.abs(np.asarray(dx5) - np.asarray(d32)).max()
  e3 = np.abs(np.asarray(dx3) - np.asarray(d32)).max()
  assert e5 < 1e-3, e5
  assert e5 <= e3, (e5, e3)


def _problem_nonmultiple(rng, k=2, b=3, s=6, c=1, kdim=5, stride=2,
                         img=12):
  """kernel % stride != 0: the kernel runs zero-extended
  (pallas_conv_direct._geometry) with the update gradient projected
  onto the real support.  Padding is built stride-exact by hand
  ((padded - kernel) % stride == 0, the repo's conv contract)."""
  lead = kdim - stride
  trail = kdim - stride
  trail += (-(img + lead + trail - kdim)) % stride
  padding = ((lead, trail), (lead, trail))
  height = img + lead + trail
  d = rng.randn(s, c, kdim, kdim).astype(np.float32)
  d /= np.sqrt((d ** 2).sum(axis=(1, 2, 3), keepdims=True))
  x = np.zeros((k, b, c, height, height), np.float32)
  x[:, :, :, lead:height - trail, lead:height - trail] = (
      0.3 * rng.randn(k, b, c, img, img))
  h = np.abs(rng.rand(s)).astype(np.float32) * 0.01
  v = rng.randn(min(s, c * kdim * kdim)).astype(np.float32)
  return d, h, v, x, (stride, stride), padding


@pytest.mark.parametrize("update_alg", [
    "sc_cheap_quadratic_descent", "sc_steepest_descent"])
def test_fused_conv_segment_kernel_not_stride_multiple(rng, update_alg):
  """5x5 kernels, stride 2: the zero-extension path.  The dictionary
  must stay exactly on the real kernel support and track the composed
  XLA path."""
  d, h, v, x, strides, padding = _problem_nonmultiple(rng)
  assert fused_conv_segment_supported(
      x.shape[1:], d.shape, strides, "fista", update_alg)
  want = _reference_segment(d, h, v, x, strides, padding, 0.05, 8,
                            0.1, 1, "fista", update_alg)
  got = fused_conv_train_segment_pallas(
      d, h, v, x, 0.05, 8, 0.1, kernel_stride=strides,
      padding=padding, variant="fista", update_alg=update_alg,
      power_iters=2, interpret=True)
  chaotic = update_alg == "sc_cheap_quadratic_descent"
  tols = {"dict": 1e-4 if chaotic else 2e-5,
          "hessian": 1e-3 if chaotic else 2e-5, "eigvec": 2e-5,
          "codes": 5e-3 if chaotic else 2e-5}
  for w, g, name in zip(want, got, ["dict", "hessian", "eigvec",
                                    "codes"]):
    _assert_close(g, w, tols[name], name)
  # trained kernels keep the real (kh, kw) shape and unit norms
  assert np.asarray(got[0]).shape == d.shape
  norms = np.sqrt((np.asarray(got[0]) ** 2).sum(axis=(1, 2, 3)))
  np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_fused_conv_segment_nonmultiple_multi_update(rng):
  """Zero-extension + multi-iteration updates (the in-kernel support
  projection must hold at every iteration, not just the first)."""
  d, h, v, x, strides, padding = _problem_nonmultiple(rng, k=2)
  want = _reference_segment(d, h, v, x, strides, padding, 0.05, 8,
                            0.1, 3, "fista", "sc_steepest_descent")
  got = fused_conv_train_segment_pallas(
      d, h, v, x, 0.05, 8, 0.1, kernel_stride=strides,
      padding=padding, variant="fista",
      update_alg="sc_steepest_descent", upd_num_iters=3,
      power_iters=2, interpret=True)
  for w, g, name in zip(want, got, ["dict", "hessian", "eigvec",
                                    "codes"]):
    _assert_close(g, w, 2e-5, name)
