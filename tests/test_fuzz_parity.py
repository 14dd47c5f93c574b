"""Randomized-geometry parity fuzz: solvers and update rules against the
float64 oracle across random shapes, flags, strides, paddings, and
group structures the fixed-case tests don't enumerate.

Stepsizes are shared explicitly between implementation and oracle
where the reference's flat-kernel Lipschitz estimate is only a bound
(conv with kernel overlap), so trajectory parity is well-posed.
"""
import numpy as np
import pytest

import numpy_oracle as oracle
from vtc_tpu.analysis_transforms.convolutional import (
    ista_fista as conv_ista_fista)
from vtc_tpu.analysis_transforms.fully_connected import ista_fista
from vtc_tpu.analysis_transforms.fully_connected import subspace_ista_fista
from vtc_tpu.dict_update_rules.fully_connected import (
    sc_cheap_quadratic_descent, sc_steepest_descent)

TOL = 1e-4


def _unit_rows(rng, s, n):
  d = rng.randn(s, n)
  return (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)


@pytest.mark.parametrize("seed", range(6))
def test_fc_solver_random_configs(seed):
  rng = np.random.RandomState(100 + seed)
  b = int(rng.randint(1, 40))
  n = int(rng.randint(8, 120))
  s = int(rng.randint(4, 150))
  lam = float(rng.uniform(0.02, 0.3))
  iters = int(rng.randint(1, 20))
  variant = ("ista", "fista")[seed % 2]
  nonneg = bool(seed % 3 == 0)
  hard = bool(seed % 3 == 1)
  d = _unit_rows(rng, s, n)
  x = rng.randn(b, n).astype(np.float32)
  init = (rng.randn(b, s).astype(np.float32)
          if seed % 2 == 0 else None)
  ref = oracle.fc_ista_fista(
      x.astype(np.float64), d.astype(np.float64), lam, iters,
      variant=variant, nonneg=nonneg, hard=hard,
      initial_codes=None if init is None else init.astype(np.float64))
  for formulation in ("gram", "direct"):
    got = np.asarray(ista_fista.run(
        x, d, lam, iters, variant=variant, nonnegative_only=nonneg,
        hard_threshold=hard, initial_codes=init,
        formulation=formulation))
    np.testing.assert_allclose(got, ref, atol=TOL, rtol=TOL,
                               err_msg=f"{formulation} b={b} n={n} s={s}")


@pytest.mark.parametrize("seed", range(4))
def test_subspace_solver_random_groups(seed):
  rng = np.random.RandomState(200 + seed)
  b = int(rng.randint(2, 16))
  n = int(rng.randint(12, 64))
  s = int(rng.randint(8, 48))
  lam = float(rng.uniform(0.05, 0.3))
  iters = int(rng.randint(2, 15))
  # ragged random groups covering all elements; every 4th fuzz draws
  # overlapping membership
  perm = list(rng.permutation(s))
  groups, i = [], 0
  while i < len(perm):
    k = int(rng.randint(1, 5))
    groups.append([int(v) for v in perm[i:i + k]])
    i += k
  if seed % 2 == 0:
    groups[0] = groups[0] + [groups[-1][0]]  # multi-membership
  d = _unit_rows(rng, s, n)
  x = rng.randn(b, n).astype(np.float32)
  variant = ("ista", "fista")[seed % 2]
  ref = oracle.fc_subspace_ista_fista(
      x.astype(np.float64), d.astype(np.float64), groups, lam, iters,
      variant=variant)
  got = np.asarray(subspace_ista_fista.run(
      x, d, groups, lam, iters, variant=variant))
  np.testing.assert_allclose(got, ref, atol=TOL, rtol=TOL,
                             err_msg=f"groups={groups}")


@pytest.mark.parametrize("seed", range(4))
def test_conv_solver_random_geometry(seed):
  rng = np.random.RandomState(300 + seed)
  b = int(rng.randint(1, 5))
  c = int(rng.randint(1, 4))
  kh = int(rng.randint(2, 7))
  kw = int(rng.randint(2, 7))
  sv = int(rng.randint(1, kh + 1))
  sh_ = int(rng.randint(1, kw + 1))
  s = int(rng.randint(3, 10))
  lam = float(rng.uniform(0.02, 0.2))
  iters = int(rng.randint(2, 12))
  ih = int(rng.randint(max(kh, 8), 15))
  iw = int(rng.randint(max(kw, 8), 15))
  if seed % 2 == 0:
    lv, tv = kh - sv, kh - sv + 1
    lh, th = kw - sh_ + 1, kw - sh_
    # reference contract (get_padding_amt): trailing padding absorbs
    # the stride remainder so the padded dims tile the stride
    tv += (-(ih + lv + tv - kh)) % sv
    th += (-(iw + lh + th - kw)) % sh_
    padding = ((lv, tv), (lh, th))
    ih += lv + tv
    iw += lh + th
  else:
    padding = None
    ih -= (ih - kh) % sv
    iw -= (iw - kw) % sh_
  images = rng.randn(b, c, ih, iw).astype(np.float32)
  d = rng.randn(s, c, kh, kw)
  d = (d / np.sqrt((d**2).sum(axis=(1, 2, 3), keepdims=True))).astype(
      np.float32)
  # shared conservative stepsize: the reference's flat-kernel estimate
  # is only a Lipschitz BOUND under kernel overlap; 0.9x keeps fista
  # trajectories contractive so float32-vs-float64 parity is well-posed
  flat = d.reshape(s, -1).astype(np.float64)
  step = 0.9 / np.linalg.eigvalsh(flat @ flat.T)[-1]
  variant = ("ista", "fista")[seed % 2]
  ref = oracle.conv_ista_fista(
      images.astype(np.float64), d.astype(np.float64), (sv, sh_),
      padding, lam, iters, variant=variant, stepsize=step)
  # every fuzz geometry must take the fused direct kernel under the
  # 'pallas' formulation (non-stride-multiple kernels run
  # zero-extended; pallas_conv_direct._geometry)
  from vtc_tpu.ops import pallas_conv_direct
  assert pallas_conv_direct.supported(images.shape, d.shape, (sv, sh_))
  for formulation in ("gram", "direct", "pallas"):
    got = np.asarray(conv_ista_fista.run(
        images, d, (sv, sh_), padding, lam, iters, variant=variant,
        stepsize=step, formulation=formulation))
    np.testing.assert_allclose(
        got, ref, atol=TOL, rtol=TOL,
        err_msg=f"{formulation} k=({kh},{kw}) st=({sv},{sh_}) "
                f"pad={padding} img=({ih},{iw}) c={c}")


@pytest.mark.parametrize("seed", range(4))
def test_fc_updates_random_configs(seed):
  rng = np.random.RandomState(400 + seed)
  b = int(rng.randint(2, 30))
  n = int(rng.randint(8, 80))
  s = int(rng.randint(4, 100))
  iters = int(rng.randint(1, 4))
  step = float(rng.uniform(0.01, 0.3))
  d = _unit_rows(rng, s, n)
  x = rng.randn(b, n).astype(np.float32)
  codes = (rng.randn(b, s) * (rng.rand(b, s) > 0.6)).astype(np.float32)
  hess = rng.rand(s).astype(np.float32)
  ref = oracle.fc_sc_steepest_descent(
      x.astype(np.float64), d.astype(np.float64),
      codes.astype(np.float64), step, iters)
  got = np.asarray(sc_steepest_descent.run(x, d, codes, step, iters))
  np.testing.assert_allclose(got, ref, atol=TOL, rtol=TOL)
  ref = oracle.fc_sc_cheap_quadratic_descent(
      x.astype(np.float64), d.astype(np.float64),
      codes.astype(np.float64), hess.astype(np.float64), step, iters)
  got = np.asarray(sc_cheap_quadratic_descent.run(
      x, d, codes, hess, step, iters))
  np.testing.assert_allclose(got, ref, atol=TOL, rtol=TOL)


@pytest.mark.parametrize("seed", range(4))
def test_fused_conv_segment_random_geometry(seed):
  """Whole-segment fused conv trainer vs the composed XLA path across
  random divisible geometries (stride == kernel so the flat-kernel
  Lipschitz is exact and the comparison is strict; overlapping
  geometries are covered by tests/test_pallas_conv_train.py with
  scale-aware bounds)."""
  import jax.numpy as jnp
  from vtc_tpu.ops import conv_shapes
  from vtc_tpu.ops import lipschitz as lip
  from vtc_tpu.ops.pallas_conv_train import (
      fused_conv_segment_supported, fused_conv_train_segment_pallas)
  from vtc_tpu.training import sparse_coding as sc

  rng = np.random.RandomState(400 + seed)
  k = int(rng.randint(1, 4))
  b = int(rng.randint(1, 6))
  c = int(rng.randint(1, 3))
  stride = int(rng.choice([2, 3, 4]))
  kdim = stride
  # s <= R*cpx keeps the (s, s) flat-kernel Gram the smaller one (the
  # fused kernel's supported() gate)
  s = int(rng.randint(3, max(4, c * stride * stride + 1)))
  img = stride * int(rng.randint(3, 8))
  variant = ("ista", "fista")[seed % 2]
  update_alg = ("sc_steepest_descent",
                "sc_cheap_quadratic_descent")[seed % 2]
  upd_niters = int(rng.randint(1, 3))
  lam = float(rng.uniform(0.02, 0.2))
  iters = int(rng.randint(1, 15))

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
  if not fused_conv_segment_supported(
      x.shape[1:], d.shape, (stride, stride), variant, update_alg,
      upd_num_iters=upd_niters):
    pytest.skip("geometry not covered by the fused kernel")

  raw = sc.build_raw_step_fn(
      "convolutional", variant, update_alg,
      kernel_stride=(stride, stride), padding=padding,
      conv_formulation="gram", compute_stepsize_in_step=False)
  dd, hh, vv = jnp.asarray(d), jnp.asarray(h), jnp.asarray(v)
  for batch in x:
    eigval, vv = lip.power_iterate(dd.reshape(s, -1), vv, num_iters=2)
    dd, hh, codes = raw(dd, hh, jnp.asarray(batch), jnp.float32(lam),
                        jnp.int32(iters), jnp.float32(0.05),
                        upd_niters, 1.0 / eigval)

  got = fused_conv_train_segment_pallas(
      d, h, v, x, lam, iters, 0.05, kernel_stride=(stride, stride),
      padding=padding, variant=variant, update_alg=update_alg,
      upd_num_iters=upd_niters, power_iters=2, interpret=True)
  for w, g, name in zip((dd, hh, vv, codes), got,
                        ["dict", "hessian", "eigvec", "codes"]):
    np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=TOL,
                               rtol=TOL, err_msg=name)
