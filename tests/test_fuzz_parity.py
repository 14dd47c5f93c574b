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
  for formulation in ("gram", "direct"):
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
