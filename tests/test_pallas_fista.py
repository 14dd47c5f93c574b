"""Pallas fused FISTA kernel vs the float64 oracle (interpreter mode on
the CPU test mesh; the real-TPU comparison runs in bench/verify)."""
import numpy as np
import pytest

from vtc_tpu.ops import lipschitz as lipschitz_ops
from vtc_tpu.ops.pallas_fista import fista_solve_pallas

import numpy_oracle as oracle


def _problem(rng, b=16, s=48, n=32):
  d = rng.randn(s, n)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  x = rng.randn(b, n)
  return x, d


@pytest.mark.parametrize("variant", ["ista", "fista"])
def test_matches_oracle_interpret(rng, variant):
  x, d = _problem(rng)
  lam, iters = 0.1, 25
  step = float(np.asarray(lipschitz_ops.fista_stepsize(
      d.astype(np.float32))))
  want = oracle.fc_ista_fista(x, d, lam, iters, variant)
  got = np.asarray(fista_solve_pallas(
      x.astype(np.float32), d.astype(np.float32), lam, iters, step,
      variant=variant, batch_tile=8, interpret=True))
  np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("nonneg,hard", [(True, False), (False, True)])
def test_threshold_variants_interpret(rng, nonneg, hard):
  x, d = _problem(rng)
  lam, iters = 0.1, 15
  step = float(np.asarray(lipschitz_ops.fista_stepsize(
      d.astype(np.float32))))
  want = oracle.fc_ista_fista(x, d, lam, iters, "fista", nonneg=nonneg,
                              hard=hard)
  got = np.asarray(fista_solve_pallas(
      x.astype(np.float32), d.astype(np.float32), lam, iters, step,
      nonneg=nonneg, hard=hard, batch_tile=8, interpret=True))
  np.testing.assert_allclose(got, want, atol=1e-4)


def test_padding_correctness(rng):
  """b and s not multiples of the tile/lane sizes: padded rows/columns
  must not contaminate real outputs."""
  x, d = _problem(rng, b=13, s=37, n=24)
  lam, iters = 0.08, 20
  step = float(np.asarray(lipschitz_ops.fista_stepsize(
      d.astype(np.float32))))
  want = oracle.fc_ista_fista(x, d, lam, iters, "fista")
  got = np.asarray(fista_solve_pallas(
      x.astype(np.float32), d.astype(np.float32), lam, iters, step,
      batch_tile=8, interpret=True))
  assert got.shape == (13, 37)
  np.testing.assert_allclose(got, want, atol=1e-4)


def test_warm_start(rng):
  x, d = _problem(rng)
  lam = 0.1
  step = float(np.asarray(lipschitz_ops.fista_stepsize(
      d.astype(np.float32))))
  init = oracle.fc_ista_fista(x, d, lam, 30, "fista").astype(np.float32)
  want = oracle.fc_ista_fista(x, d, lam, 5, "fista",
                              initial_codes=init.astype(np.float64))
  got = np.asarray(fista_solve_pallas(
      x.astype(np.float32), d.astype(np.float32), lam, 5, step,
      initial_codes=init, batch_tile=8, interpret=True))
  np.testing.assert_allclose(got, want, atol=1e-4)


def test_early_stopping_matches_xla_path(rng):
  """In-kernel early stopping (single-tile while_loop) must reproduce
  the XLA gram path's stopped trajectory -- same stop iteration, codes
  within the usual fp-association tolerance (the two paths fold eta
  into the iteration differently) -- both when the threshold triggers
  mid-run and when it never does."""
  from vtc_tpu.analysis_transforms.fully_connected import ista_fista
  x, d = _problem(rng, b=13, s=37, n=24)
  lam = 0.1
  step = float(np.asarray(lipschitz_ops.fista_stepsize(
      d.astype(np.float32))))
  for eps in (3e-2, 1e-9):  # triggers early / never triggers
    want = np.asarray(ista_fista.run(
        x.astype(np.float32), d.astype(np.float32), lam, 60,
        stepsize=step, early_stopping_epsilon=eps, formulation="gram"))
    got = np.asarray(fista_solve_pallas(
        x.astype(np.float32), d.astype(np.float32), lam, 60, step,
        early_stopping_epsilon=eps, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4, err_msg=str(eps))
  # the eps=3e-2 run really did stop early: it differs from the full run
  full = np.asarray(fista_solve_pallas(
      x.astype(np.float32), d.astype(np.float32), lam, 60, step,
      interpret=True))
  stopped = np.asarray(fista_solve_pallas(
      x.astype(np.float32), d.astype(np.float32), lam, 60, step,
      early_stopping_epsilon=3e-2, interpret=True))
  assert np.max(np.abs(stopped - full)) > 1e-5


def test_early_stopping_routing(rng):
  """formulation='pallas' + early stopping no longer silently
  downgrades when the batch fits one tile (and still falls back
  cleanly when it cannot)."""
  from vtc_tpu.ops.pallas_fista import early_stop_tile_fits
  assert early_stop_tile_fits(250, 256)
  assert not early_stop_tile_fits(300000, 1024)


def test_num_iters_is_dynamic(rng):
  """Different num_iters values reuse one compilation (scalar prefetch),
  and more iterations converge closer to the long-run solution."""
  x, d = _problem(rng)
  lam = 0.1
  step = float(np.asarray(lipschitz_ops.fista_stepsize(
      d.astype(np.float32))))
  ref = oracle.fc_ista_fista(x, d, lam, 2000, "fista")

  def dist(k):
    codes = np.asarray(fista_solve_pallas(
        x.astype(np.float32), d.astype(np.float32), lam, k, step,
        batch_tile=8, interpret=True), np.float64)
    return np.linalg.norm(codes - ref)

  d5, d25, d100 = dist(5), dist(25), dist(100)
  assert d100 < d25 < d5
