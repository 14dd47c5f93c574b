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


def test_roll_prox_window_gate():
  """Lane-rotate prox eligibility: power-of-2 packed windows only."""
  from vtc_tpu.ops.pallas_train_step import roll_prox_window
  mk = lambda m: [list(range(i, i + m)) for i in range(0, 4 * m, m)]
  assert roll_prox_window(mk(4)) == 4
  assert roll_prox_window(mk(8)) == 8
  assert roll_prox_window(mk(1)) == 1
  assert roll_prox_window(mk(3)) is None
  assert roll_prox_window(mk(6)) is None
  # max over RAGGED groups decides the packed window
  assert roll_prox_window([[0, 1, 2], [3]]) is None
  assert roll_prox_window([[0, 1], [2, 3, 4, 5]]) == 4


@pytest.mark.parametrize("hard", [False, True])
def test_roll_prox_matches_matmul_prox(rng, hard):
  """The lane-rotate prox == the membership-matmul prox in-kernel
  (forced via roll_window) to accumulation-order noise."""
  import jax
  import jax.numpy as jnp

  from vtc_tpu.ops.pallas_group_fista import (group_fista_solve_pallas,
                                              membership_matrix)

  x, d = _problem(rng, b=12, s=32, n=24)
  groups = [list(range(i, i + 4)) for i in range(0, 32, 4)]
  gi, vm = subspace_ista_fista.pack_group_indices(groups, 32)
  gdict = subspace_ista_fista.build_grouped_dictionary(
      jnp.asarray(d, jnp.float32), gi, vm)
  expand = membership_matrix(8, 4, np.ones((8, 4), np.float32))
  kw = dict(variant="fista", hard=hard, interpret=True,
            mxu_precision="highest")
  args = (jnp.asarray(x, jnp.float32), gdict, expand,
          jnp.float32(0.1), jnp.int32(15), jnp.float32(0.05))
  got_roll = np.asarray(group_fista_solve_pallas(
      *args, roll_window=4, **kw))
  got_mat = np.asarray(group_fista_solve_pallas(
      *args, roll_window=None, **kw))
  np.testing.assert_allclose(got_roll, got_mat, rtol=0, atol=1e-6)
  assert np.abs(got_roll).max() > 0  # non-degenerate solve


def test_roll_prox_early_stop_matches_gram(rng):
  """In-kernel early stop through the ROLL prox (pow2 groups) == the
  XLA gram path (the existing eps test covers the matmul fallback)."""
  x, d = _problem(rng)
  groups = [list(range(i, i + 4)) for i in range(0, 32, 4)]
  got = np.asarray(subspace_ista_fista.run(
      x.astype(np.float32), d.astype(np.float32), groups, 0.1, 60,
      early_stopping_epsilon=5e-2, formulation="pallas"))
  want = np.asarray(subspace_ista_fista.run(
      x.astype(np.float32), d.astype(np.float32), groups, 0.1, 60,
      early_stopping_epsilon=5e-2, formulation="gram"))
  np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_cs_roll_window_from_expand_arrays():
  """Code-shard roll gate: exact contiguous block pattern only (that
  kernel shards the ORIGINAL code axis, not the packed layout)."""
  from vtc_tpu.ops.pallas_code_shard_train import (
      code_shard_group_arrays, roll_window_from_expand_arrays)
  groups4 = [list(range(i, i + 4)) for i in range(0, 16, 4)]
  ga = code_shard_group_arrays(groups4, 16, 2)
  assert ga is not None
  assert roll_window_from_expand_arrays(ga[0]) == 4
  # a permuted partition (same sizes, non-contiguous members) must not
  # take the rotate tree
  perm = [[0, 2, 4, 6], [1, 3, 5, 7], [8, 10, 12, 14], [9, 11, 13, 15]]
  ga_p = code_shard_group_arrays(perm, 16, 2)
  assert ga_p is not None
  assert roll_window_from_expand_arrays(ga_p[0]) is None
  # ragged sizes -> None
  ragged = [[0, 1, 2], [3], list(range(4, 8)), list(range(8, 16))]
  ga_r = code_shard_group_arrays(ragged, 16, 1)
  assert ga_r is not None
  assert roll_window_from_expand_arrays(ga_r[0]) is None
