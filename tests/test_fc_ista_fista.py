"""Golden-value and contract tests for the fc ISTA/FISTA solver."""
import numpy as np
import pytest

from vtc_tpu.analysis_transforms.fully_connected import ista_fista

import numpy_oracle as oracle


def _problem(rng, b=16, s=48, n=32):
  dictionary = rng.randn(s, n)
  dictionary /= np.linalg.norm(dictionary, axis=1, keepdims=True)
  images = rng.randn(b, n).astype(np.float64)
  return images, dictionary


@pytest.mark.parametrize("variant", ["ista", "fista"])
@pytest.mark.parametrize("formulation", ["gram", "direct"])
def test_matches_oracle(rng, variant, formulation):
  images, dictionary = _problem(rng)
  lam, iters = 0.1, 25
  want = oracle.fc_ista_fista(images, dictionary, lam, iters, variant)
  got = np.asarray(ista_fista.run(
      images.astype(np.float32), dictionary.astype(np.float32), lam, iters,
      variant=variant, formulation=formulation))
  np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("nonneg,hard", [(True, False), (False, True),
                                         (True, True)])
def test_threshold_variants(rng, nonneg, hard):
  images, dictionary = _problem(rng)
  lam, iters = 0.1, 20
  want = oracle.fc_ista_fista(images, dictionary, lam, iters, "fista",
                              nonneg=nonneg, hard=hard)
  got = np.asarray(ista_fista.run(
      images.astype(np.float32), dictionary.astype(np.float32), lam, iters,
      nonnegative_only=nonneg, hard_threshold=hard))
  np.testing.assert_allclose(got, want, atol=1e-4)
  if nonneg:
    assert np.all(got >= 0.0)


def test_warm_start_changes_result_without_mutation(rng):
  images, dictionary = _problem(rng)
  lam = 0.1
  cold = np.asarray(ista_fista.run(images, dictionary, lam, 5))
  warm_init = np.asarray(
      ista_fista.run(images, dictionary, lam, 30)).copy()
  warm_init_snapshot = warm_init.copy()
  warm = np.asarray(ista_fista.run(
      images, dictionary, lam, 5, initial_codes=warm_init))
  # the warm start must not be mutated (reference contract:
  # tests/ista_fista_1.py:48-54)
  np.testing.assert_array_equal(warm_init, warm_init_snapshot)
  assert not np.allclose(cold, warm)
  # warm start from a near-solution should stay near it
  want = oracle.fc_ista_fista(images, dictionary, lam, 5, "fista",
                              initial_codes=warm_init.astype(np.float64))
  np.testing.assert_allclose(warm, want, atol=1e-4)


def test_early_stopping_matches_oracle(rng):
  images, dictionary = _problem(rng)
  lam, iters, eps = 0.2, 200, 1e-3
  want = oracle.fc_ista_fista(images, dictionary, lam, iters, "fista",
                              eps=eps)
  got = np.asarray(ista_fista.run(
      images.astype(np.float32), dictionary.astype(np.float32), lam, iters,
      early_stopping_epsilon=eps, formulation="direct"))
  np.testing.assert_allclose(got, want, atol=1e-4)


def test_lasso_objective_decreases_ista(rng):
  """ISTA monotonically decreases the LASSO objective (a numeric property
  the reference never tested)."""
  images, dictionary = _problem(rng)
  lam = 0.1

  def objective(codes):
    recon = codes @ dictionary
    return (0.5 * np.sum((recon - images) ** 2)
            + lam * np.sum(np.abs(codes)))

  values = [
      objective(np.asarray(
          ista_fista.run(images, dictionary, lam, k, variant="ista"),
          dtype=np.float64))
      for k in (1, 3, 10, 30, 100)
  ]
  assert all(b <= a + 1e-5 for a, b in zip(values, values[1:]))


def test_fista_converges_faster_than_ista(rng):
  images, dictionary = _problem(rng, b=32, s=96, n=64)
  lam, iters = 0.05, 60
  ref = oracle.fc_ista_fista(images, dictionary, lam, 3000, "fista")

  def dist(variant):
    codes = np.asarray(ista_fista.run(
        images, dictionary, lam, iters, variant=variant), np.float64)
    return np.linalg.norm(codes - ref)

  assert dist("fista") < dist("ista")


def test_power_iteration_stepsize_close(rng):
  images, dictionary = _problem(rng)
  lam, iters = 0.1, 25
  exact = np.asarray(ista_fista.run(images, dictionary, lam, iters))
  power = np.asarray(ista_fista.run(
      images, dictionary, lam, iters, lipschitz_method="power"))
  np.testing.assert_allclose(power, exact, atol=1e-3)
