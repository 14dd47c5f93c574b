"""Pallas group-FISTA kernel vs the float64 oracle (interpret mode)."""
import numpy as np
import pytest

from vtc_tpu.analysis_transforms.fully_connected import subspace_ista_fista

import numpy_oracle as oracle


def _problem(rng, b=12, s=32, n=24):
  d = rng.randn(s, n)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  return rng.randn(b, n), d


@pytest.mark.parametrize("variant", ["ista", "fista"])
def test_pallas_formulation_matches_oracle(rng, variant):
  x, d = _problem(rng)
  groups = [list(range(i, i + 4)) for i in range(0, 32, 4)]
  want = oracle.fc_subspace_ista_fista(x, d, groups, 0.1, 20, variant)
  got = np.asarray(subspace_ista_fista.run(
      x.astype(np.float32), d.astype(np.float32), groups, 0.1, 20,
      variant=variant, formulation="pallas"))
  np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_ragged_overlapping_groups(rng):
  x, d = _problem(rng)
  groups = [[0, 2, 5], [1], [2, 3, 4, 5], list(range(6, 32))]
  want = oracle.fc_subspace_ista_fista(x, d, groups, 0.08, 15)
  got = np.asarray(subspace_ista_fista.run(
      x.astype(np.float32), d.astype(np.float32), groups, 0.08, 15,
      formulation="pallas"))
  np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_warm_start_in_kernel(rng):
  x, d = _problem(rng)
  groups = [list(range(i, i + 8)) for i in range(0, 32, 8)]
  init = np.asarray(subspace_ista_fista.run(
      x, d, groups, 0.1, 20, formulation="pallas"))
  warm = np.asarray(subspace_ista_fista.run(
      x, d, groups, 0.1, 5, initial_codes=init, formulation="pallas"))
  want = oracle.fc_subspace_ista_fista(
      x, d, groups, 0.1, 5, initial_codes=init.astype(np.float64))
  np.testing.assert_allclose(warm, want, atol=1e-4)
  # the warm start changed the answer vs a cold 5-iteration solve
  cold = np.asarray(subspace_ista_fista.run(
      x, d, groups, 0.1, 5, formulation="pallas"))
  assert np.abs(warm - cold).max() > 1e-5


@pytest.mark.parametrize("eps", [5e-2, 1e-12])
def test_pallas_early_stopping_matches_gram(rng, eps):
  """In-kernel early stop == the XLA gram path, both when the epsilon
  triggers mid-run (1e-3) and when it never triggers (1e-12)."""
  x, d = _problem(rng)
  groups = [[0, 2, 5], [1], [2, 3, 4, 5], list(range(6, 32))]
  got = np.asarray(subspace_ista_fista.run(
      x.astype(np.float32), d.astype(np.float32), groups, 0.1, 60,
      early_stopping_epsilon=eps, formulation="pallas"))
  want = np.asarray(subspace_ista_fista.run(
      x.astype(np.float32), d.astype(np.float32), groups, 0.1, 60,
      early_stopping_epsilon=eps, formulation="gram"))
  np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
  if eps == 5e-2:  # the stop engaged: differs from the full-length run
    full = np.asarray(subspace_ista_fista.run(
        x.astype(np.float32), d.astype(np.float32), groups, 0.1, 60,
        formulation="pallas"))
    assert np.abs(got - full).max() > 1e-7


def test_pallas_raw_grouped_output_matches_gram(rng):
  x, d = _problem(rng)
  groups = [[0, 1, 2], [3, 4], list(range(5, 32))]
  flat_p, gdict_p = subspace_ista_fista.run(
      x.astype(np.float32), d.astype(np.float32), groups, 0.08, 15,
      ret_summed_gduplicates=False, formulation="pallas")
  flat_g, gdict_g = subspace_ista_fista.run(
      x.astype(np.float32), d.astype(np.float32), groups, 0.08, 15,
      ret_summed_gduplicates=False, formulation="gram")
  np.testing.assert_allclose(np.asarray(flat_p), np.asarray(flat_g),
                             rtol=0, atol=2e-6)
  np.testing.assert_allclose(np.asarray(gdict_p), np.asarray(gdict_g))
