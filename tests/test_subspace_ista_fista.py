"""Golden-value and contract tests for the subspace (group) solver."""
import numpy as np
import pytest

from vtc_tpu.analysis_transforms.fully_connected import subspace_ista_fista

import numpy_oracle as oracle


def _problem(rng, b=12, s=32, n=24):
  dictionary = rng.randn(s, n)
  dictionary /= np.linalg.norm(dictionary, axis=1, keepdims=True)
  images = rng.randn(b, n)
  return images, dictionary


def _groups_uniform(s, size):
  return [list(range(i, i + size)) for i in range(0, s, size)]


@pytest.mark.parametrize("variant", ["ista", "fista"])
@pytest.mark.parametrize("formulation", ["gram", "direct"])
def test_matches_oracle(rng, variant, formulation):
  images, dictionary = _problem(rng)
  groups = _groups_uniform(32, 4)
  want = oracle.fc_subspace_ista_fista(
      images, dictionary, groups, 0.1, 20, variant)
  got = np.asarray(subspace_ista_fista.run(
      images, dictionary, groups, 0.1, 20, variant=variant,
      formulation=formulation))
  np.testing.assert_allclose(got, want, atol=1e-4)


def test_ragged_overlapping_groups(rng):
  images, dictionary = _problem(rng)
  groups = [[0, 2, 5], [1], [2, 3, 4, 5], list(range(6, 32))]
  want = oracle.fc_subspace_ista_fista(
      images, dictionary, groups, 0.08, 15)
  got = np.asarray(subspace_ista_fista.run(
      images, dictionary, groups, 0.08, 15))
  np.testing.assert_allclose(got, want, atol=1e-4)


def test_warm_start_contract(rng):
  images, dictionary = _problem(rng)
  groups = _groups_uniform(32, 8)
  init = np.asarray(subspace_ista_fista.run(
      images, dictionary, groups, 0.1, 25)).copy()
  snap = init.copy()
  warm = np.asarray(subspace_ista_fista.run(
      images, dictionary, groups, 0.1, 5, initial_codes=init))
  np.testing.assert_array_equal(init, snap)
  want = oracle.fc_subspace_ista_fista(
      images, dictionary, groups, 0.1, 5, initial_codes=init.astype(
          np.float64))
  np.testing.assert_allclose(warm, want, atol=1e-4)


def test_early_stopping(rng):
  images, dictionary = _problem(rng)
  groups = _groups_uniform(32, 4)
  want = oracle.fc_subspace_ista_fista(
      images, dictionary, groups, 0.2, 300, eps=1e-3)
  got = np.asarray(subspace_ista_fista.run(
      images, dictionary, groups, 0.2, 300, early_stopping_epsilon=1e-3,
      formulation="direct"))
  np.testing.assert_allclose(got, want, atol=1e-4)


def test_singleton_groups_reduce_to_vanilla(rng):
  """Groups of size 1 make the subspace solver equal the plain solver."""
  images, dictionary = _problem(rng)
  groups = [[i] for i in range(32)]
  want = oracle.fc_ista_fista(images, dictionary, 0.1, 20, "fista")
  got = np.asarray(subspace_ista_fista.run(
      images, dictionary, groups, 0.1, 20))
  np.testing.assert_allclose(got, want, atol=1e-4)


def test_ret_grouped_duplicates(rng):
  """The path the reference left NotImplemented: return grouped codes and
  the grouped dictionary; their product must reconstruct the same images
  as the summed codes with the original dictionary."""
  images, dictionary = _problem(rng)
  groups = [[0, 2, 5], [1], [2, 3, 4, 5], list(range(6, 32))]
  summed = np.asarray(subspace_ista_fista.run(
      images, dictionary, groups, 0.08, 15))
  flat_grouped, grouped_dict = subspace_ista_fista.run(
      images, dictionary, groups, 0.08, 15, ret_summed_gduplicates=False)
  recon_a = summed @ dictionary
  recon_b = np.asarray(flat_grouped) @ np.asarray(grouped_dict)
  np.testing.assert_allclose(recon_a, recon_b, atol=1e-4)


def test_hard_group_threshold_zeroes_whole_groups(rng):
  images, dictionary = _problem(rng)
  groups = _groups_uniform(32, 4)
  got = np.asarray(subspace_ista_fista.run(
      images, dictionary, groups, 0.5, 10, hard_threshold=True))
  # every group is either all-zero or has nonzero norm
  per_group = got.reshape(-1, 8, 4)
  norms = np.linalg.norm(per_group, axis=2)
  assert got.shape == (12, 32)
  assert np.isfinite(norms).all()
