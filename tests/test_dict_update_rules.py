"""Golden-value tests for the fully-connected dictionary update rules."""
import numpy as np
import pytest

from vtc_tpu.dict_update_rules.fully_connected import (
    ica_natural_gradient,
    sc_cheap_quadratic_descent,
    sc_steepest_descent,
    subspace_sc_cheap_quadratic_descent,
    subspace_sc_steepest_descent,
)

import numpy_oracle as oracle


def _problem(rng, b=24, s=40, n=32):
  dictionary = rng.randn(s, n)
  dictionary /= np.linalg.norm(dictionary, axis=1, keepdims=True)
  images = rng.randn(b, n)
  codes = rng.randn(b, s) * (rng.rand(b, s) > 0.7)
  return images, dictionary, codes


@pytest.mark.parametrize("num_iters", [1, 3])
@pytest.mark.parametrize("normalize", [True, False])
def test_steepest_descent(rng, num_iters, normalize):
  images, dictionary, codes = _problem(rng)
  want = oracle.fc_sc_steepest_descent(
      images, dictionary, codes, 0.05, num_iters, normalize)
  got = np.asarray(sc_steepest_descent.run(
      images, dictionary, codes, 0.05, num_iters, normalize))
  np.testing.assert_allclose(got, want, atol=1e-5)
  if normalize:
    np.testing.assert_allclose(
        np.linalg.norm(got, axis=1), 1.0, atol=1e-5)


def test_cheap_quadratic_descent(rng):
  images, dictionary, codes = _problem(rng)
  hessian = np.abs(rng.rand(dictionary.shape[0])) * 0.01
  want = oracle.fc_sc_cheap_quadratic_descent(
      images, dictionary, codes, hessian, 0.1, 2)
  got = np.asarray(sc_cheap_quadratic_descent.run(
      images, dictionary, codes, hessian, 0.1, 2))
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_hessian_ema(rng):
  _, _, codes = _problem(rng)
  h0 = np.abs(rng.rand(codes.shape[1]))
  got = np.asarray(
      sc_cheap_quadratic_descent.hessian_diagonal_ema(h0, codes))
  want = 0.99 * h0 + np.mean(codes**2, axis=0) / 100.0
  np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("penalty", [0.0, 0.5])
def test_subspace_cheap_quadratic(rng, penalty):
  images, dictionary, codes = _problem(rng, s=40)
  groups = [list(range(i, i + 4)) for i in range(0, 40, 4)]
  # overlapping membership: element 0 also joins the last group
  groups[-1] = groups[-1] + [0]
  hessian = np.abs(rng.rand(40)) * 0.01
  want = oracle.fc_subspace_cheap_quad(
      images, dictionary, codes, groups, hessian, penalty, 0.05, 2)
  got = np.asarray(subspace_sc_cheap_quadratic_descent.run(
      images, dictionary, codes, groups, hessian, penalty, 0.05, 2))
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_subspace_steepest_is_cheapquad_without_hessian(rng):
  """The rule missing from the reference: steepest descent + alignment
  penalty.  Validate against the oracle with a unit hessian scale."""
  images, dictionary, codes = _problem(rng, s=16)
  groups = [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11], [12, 13, 14, 15]]
  penalty, step = 0.25, 0.05
  # oracle: cheap quad with hessian+low == 1 divides by exactly 1
  want = oracle.fc_subspace_cheap_quad(
      images, dictionary, codes, groups,
      np.full(16, 1.0 - 0.001), penalty, step, 1)
  got = np.asarray(subspace_sc_steepest_descent.run(
      images, dictionary, codes, groups, penalty, step, 1))
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_ica_natural_gradient(rng):
  _, _, _ = _problem(rng)
  n = 24
  dictionary = np.linalg.qr(rng.randn(n, n))[0]
  codes = rng.randn(50, n)
  want = oracle.ica_natural_gradient(dictionary, codes, 0.01, 2)
  got = np.asarray(ica_natural_gradient.run(dictionary, codes, 0.01, 2))
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_updates_are_pure(rng):
  images, dictionary, codes = _problem(rng)
  snap = dictionary.copy()
  sc_steepest_descent.run(images, dictionary, codes, 0.05)
  np.testing.assert_array_equal(dictionary, snap)
