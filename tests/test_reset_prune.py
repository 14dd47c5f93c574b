"""Unit tests for the reset/prune subsystem."""
import numpy as np
import pytest

from vtc_tpu.training import reset_prune


def _dictionary(rng, s=16, n=8):
  d = rng.randn(s, n).astype(np.float32)
  return d / np.linalg.norm(d, axis=1, keepdims=True)


def test_random_reset(rng):
  d = _dictionary(rng)
  gen = np.random.default_rng(0)
  new_d, affected, groups = reset_prune.reset_or_prune_dict_elements(
      d, None, "random", {"num_to_modify": 4, "group_assignments": None},
      "reset", rng=gen)
  assert new_d.shape == d.shape
  assert len(affected) == 4
  untouched = np.setdiff1d(np.arange(16), affected)
  np.testing.assert_array_equal(new_d[untouched], d[untouched])
  assert not np.allclose(new_d[affected], d[affected])
  # replacement noise carries the average norm (1.0 here)
  np.testing.assert_allclose(
      np.linalg.norm(new_d[affected], axis=1), 1.0, atol=1e-5)


def test_random_prune_remaps_groups(rng):
  d = _dictionary(rng)
  groups = [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11], [12, 13, 14, 15]]
  gen = np.random.default_rng(1)
  new_d, affected, new_groups = reset_prune.reset_or_prune_dict_elements(
      d, None, "random",
      {"num_to_modify": 3, "group_assignments": groups}, "prune", rng=gen)
  assert new_d.shape[0] == 16 - len(np.unique(affected))
  # every remapped index is valid and points at the surviving row
  keep = np.setdiff1d(np.arange(16), affected)
  for old_group, new_group in zip(groups, new_groups):
    expected = [int(np.searchsorted(keep, m)) for m in old_group
                if m in keep]
    assert new_group == expected
    for new_idx, old_idx in zip(new_group,
                                [m for m in old_group if m in keep]):
      np.testing.assert_array_equal(new_d[new_idx], d[old_idx])


def test_cosine_threshold_flags_duplicates(rng):
  d = _dictionary(rng)
  d[7] = d[3] + 1e-4 * rng.randn(8)  # near-duplicate pair (3, 7)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  gen = np.random.default_rng(2)
  new_d, affected, _ = reset_prune.reset_or_prune_dict_elements(
      d, None, "cosine_sim_threshold",
      {"threshold": 0.99, "cue_user": False,
       "only_sim_within_group": False, "group_assignments": None},
      "reset", rng=gen)
  assert set(affected.tolist()) <= {3, 7}
  assert len(affected) == 1  # one element of the offending pair


def test_cosine_threshold_within_group_cue_user_picker(rng):
  d = _dictionary(rng)
  groups = [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11], [12, 13, 14, 15]]
  d[1] = d[0]  # duplicate inside group 0
  d[9] = d[8]  # duplicate inside group 2
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  picked = {}

  def picker(similarities):
    picked["n"] = len(similarities)
    return 0.95

  gen = np.random.default_rng(3)
  _, affected, _ = reset_prune.reset_or_prune_dict_elements(
      d, None, "cosine_sim_threshold",
      {"cue_user": True, "only_sim_within_group": True,
       "group_assignments": groups}, "reset", rng=gen,
      threshold_picker=picker)
  assert picked["n"] == 4 * 6  # 4 groups x C(4,2) pairs
  assert len(affected) == 2
  assert {int(a) for a in affected} <= {0, 1, 8, 9}


def test_nonuniformity_filter(rng):
  s, b = 16, 400
  d = _dictionary(rng, s=s)
  groups = [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11], [12, 13, 14, 15]]
  codes = rng.randn(b, s).astype(np.float32)
  # make group 1's codes extremely nonuniform: all mass on one axis
  codes[:, 4:8] = 0.0
  codes[:, 4] = np.abs(rng.randn(b))
  gen = np.random.default_rng(4)
  _, affected, _ = reset_prune.reset_or_prune_dict_elements(
      d, codes, "nonuniformity_within_group",
      {"num_gc_in_average": 10, "group_assignments": groups}, "reset",
      rng=gen)
  assert set(affected.tolist()) == {4, 5, 6, 7}


def test_conv_dictionary_supported(rng):
  """The reference raises NotImplementedError for conv dictionaries;
  we support them (flattened-kernel cosine similarity)."""
  d = rng.randn(8, 1, 4, 4).astype(np.float32)
  d /= np.sqrt((d**2).sum(axis=(1, 2, 3), keepdims=True))
  d[5] = d[2]
  gen = np.random.default_rng(5)
  new_d, affected, _ = reset_prune.reset_or_prune_dict_elements(
      d, None, "cosine_sim_threshold",
      {"threshold": 0.99, "cue_user": False,
       "only_sim_within_group": False, "group_assignments": None},
      "prune", rng=gen)
  assert new_d.shape == (7, 1, 4, 4)
  assert set(affected.tolist()) <= {2, 5}
