"""End-to-end trainer tests on synthetic data (hermetic, CPU mesh).

Covers the reference's trainer smoke tests (tests/sparse_coding_1..5) plus
numeric assertions the reference never made (loss actually decreases,
checkpoint contract round-trips).
"""
import math
import pickle

import numpy as np
import pytest

from vtc_tpu.training import ica as ica_trainer
from vtc_tpu.training import pca as pca_trainer
from vtc_tpu.training import sparse_coding as sc_trainer
from vtc_tpu.utils import checkpoint as ckpt_util


def _synthetic_patch_batches(rng, num_batches=6, batch=32, n=64,
                             basis=None):
  """Gaussian-mixture patches with mild low-rank structure.  Pass the
  same ``basis`` for train and validation splits to share a
  distribution."""
  if basis is None:
    basis = rng.randn(8, n)
  weights = rng.randn(num_batches * batch, basis.shape[0]) * 2.0
  data = weights @ basis + 0.3 * rng.randn(num_batches * batch, n)
  data = data.astype(np.float32)
  return data.reshape(num_batches, batch, n)


def _unit_norm_dict(rng, s, n):
  d = rng.randn(s, n).astype(np.float32)
  return d / np.linalg.norm(d, axis=1, keepdims=True)


def _lasso_loss(data2d, dictionary, codes, lam):
  recon = codes @ dictionary
  return float(np.mean(0.5 * np.sum((recon - data2d) ** 2, axis=1)
                       + lam * np.sum(np.abs(codes), axis=1)))


@pytest.mark.parametrize("inf_alg,upd_alg,upd_step", [
    ("ista", "sc_steepest_descent", 0.003),
    ("fista", "sc_cheap_quadratic_descent", 0.1),
])
def test_fc_training_reduces_lasso_loss(rng, inf_alg, upd_alg, upd_step,
                                        tmp_path):
  basis = rng.randn(8, 64)
  train = _synthetic_patch_batches(rng, basis=basis)
  val = _synthetic_patch_batches(rng, num_batches=1, basis=basis)
  d0 = _unit_norm_dict(rng, 48, 64)
  lam = 0.05
  params = {
      "mode": "fully-connected",
      "num_epochs": 4,
      "code_inference_algorithm": inf_alg,
      "inference_param_schedule": {
          0: {"sparsity_weight": lam, "num_iters": 15},
          12: {"sparsity_weight": lam, "num_iters": 25}},
      "dictionary_update_algorithm": upd_alg,
      "dict_update_param_schedule": {
          0: {"stepsize": upd_step, "num_iters": 1}},
      "stdout_print_interval": 1000,
  }
  final = np.asarray(sc_trainer.train_dictionary(train, val, d0, params))
  assert final.shape == d0.shape
  np.testing.assert_allclose(np.linalg.norm(final, axis=1), 1.0,
                             atol=1e-4)
  # loss under the final dictionary < loss under the initial dictionary
  from vtc_tpu.analysis_transforms.fully_connected import ista_fista
  val2d = val.reshape(-1, 64)
  codes0 = np.asarray(ista_fista.run(val2d, d0, lam, 25))
  codes1 = np.asarray(ista_fista.run(val2d, final, lam, 25))
  assert _lasso_loss(val2d, final, codes1, lam) < _lasso_loss(
      val2d, d0, codes0, lam)


def test_fc_training_with_logging_checkpoints_and_viz(rng, tmp_path):
  train = _synthetic_patch_batches(rng, num_batches=3, batch=16, n=16)
  val = _synthetic_patch_batches(rng, num_batches=1, batch=16, n=16)
  d0 = _unit_norm_dict(rng, 16, 16)
  logdir = tmp_path / "run1"
  params = {
      "mode": "fully-connected",
      "num_epochs": 2,
      "code_inference_algorithm": "fista",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 10}},
      "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.05, "num_iters": 1}},
      "checkpoint_schedule": {0, 3},
      "training_visualization_schedule": {0, 3},
      "logging_folder_fullpath": logdir,
      "reshaped_kernel_size": (4, 4),
      "str_entire_calling_script": "# test script body",
  }
  sc_trainer.train_dictionary(train, val, d0, params)
  # checkpoint contract: pickled numpy arrays with the exact filename
  for it in (0, 3):
    path = logdir / ("checkpoint_dictionary_iter_" + str(it))
    assert path.exists()
    with open(path, "rb") as f:
      arr = pickle.load(f)
    assert isinstance(arr, np.ndarray) and arr.shape == (16, 16)
  loaded, it = ckpt_util.load_newest_dictionary_checkpoint(logdir)
  assert it == 3 and loaded.shape == (16, 16)
  sidecar = ckpt_util.load_trainstate_sidecar(logdir, 3)
  assert sidecar is not None and "hessian_diagonal" in sidecar
  assert (logdir / "training_params.yaml").exists()
  assert (logdir / "called_script.py").read_text() == "# test script body"
  # tensorboard event file written
  assert any(p.name.startswith("events.out.tfevents")
             for p in logdir.iterdir())


def test_subspace_training_with_reset_event(rng):
  """The sparse_coding_5 analog: subspace inference + the subspace
  steepest-descent rule the reference advertises but doesn't ship, plus
  a random-reset event mid-training."""
  train = _synthetic_patch_batches(rng, num_batches=3, batch=16, n=32)
  val = _synthetic_patch_batches(rng, num_batches=1, batch=16, n=32)
  d0 = _unit_norm_dict(rng, 32, 32)
  groups = [list(range(i, i + 4)) for i in range(0, 32, 4)]
  params = {
      "mode": "fully-connected",
      "num_epochs": 2,
      "code_inference_algorithm": "subspace_fista",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 10}},
      "dictionary_update_algorithm": "subspace_sc_steepest_descent",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.05, "num_iters": 1}},
      "group_assignments": groups,
      "subspace_alignment_penalty": 0.1,
      "dict_element_rp_schedule": {
          2: {"filter_type": "random",
              "filter_params": {"num_to_modify": 3},
              "action": "reset"}},
  }
  final = np.asarray(sc_trainer.train_dictionary(train, val, d0, params))
  assert final.shape == (32, 32)


def test_subspace_prune_event_shrinks_dictionary(rng):
  train = _synthetic_patch_batches(rng, num_batches=2, batch=16, n=32)
  val = _synthetic_patch_batches(rng, num_batches=1, batch=16, n=32)
  d0 = _unit_norm_dict(rng, 32, 32)
  groups = [list(range(i, i + 8)) for i in range(0, 32, 8)]
  params = {
      "mode": "fully-connected",
      "num_epochs": 1,
      "code_inference_algorithm": "subspace_ista",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 8}},
      "dictionary_update_algorithm":
          "subspace_sc_cheap_quadratic_descent",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.05, "num_iters": 1}},
      "group_assignments": groups,
      "subspace_alignment_penalty": 0.0,
      "dict_element_rp_schedule": {
          1: {"filter_type": "random",
              "filter_params": {"num_to_modify": 4},
              "action": "prune"}},
  }
  final = np.asarray(sc_trainer.train_dictionary(train, val, d0, params))
  assert final.shape[0] < 32  # pruned


def test_conv_training_smoke(rng):
  k, stride, img = 4, (2, 2), 8
  pad = ((2, 2), (2, 2))
  h = img + 4
  data = np.zeros((2, 4, 1, h, h), np.float32)
  data[:, :, :, 2:-2, 2:-2] = rng.randn(2, 4, 1, img, img)
  d0 = rng.randn(6, 1, k, k).astype(np.float32)
  d0 /= np.sqrt((d0**2).sum(axis=(1, 2, 3), keepdims=True))
  params = {
      "mode": "convolutional",
      "num_epochs": 2,
      "code_inference_algorithm": "ista",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.02, "num_iters": 8}},
      "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.01, "num_iters": 1}},
      "strides": stride,
      "padding": pad,
  }
  final = np.asarray(sc_trainer.train_dictionary(
      data, data[:1], d0, params))
  assert final.shape == d0.shape
  np.testing.assert_allclose(
      np.sqrt((final**2).sum(axis=(1, 2, 3))), 1.0, atol=1e-4)


def test_ica_training(rng):
  n = 16
  data = _synthetic_patch_batches(rng, num_batches=4, batch=32, n=n)
  d0 = np.linalg.qr(rng.randn(n, n))[0].astype(np.float32)
  params = {
      "num_epochs": 3,
      "dictionary_update_algorithm": "ica_natural_gradient",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.02, "num_iters": 1}},
      "stdout_print_interval": 1000,
  }
  final = np.asarray(ica_trainer.train_dictionary(data, d0, params))
  assert final.shape == (n, n)
  assert np.isfinite(final).all()
  assert not np.allclose(final, d0)


def test_pca_dictionary(rng):
  data = rng.randn(500, 24).astype(np.float32)
  data -= data.mean(axis=0)
  pca = np.asarray(pca_trainer.train_dictionary(data))
  assert pca.shape == (24, 24)
  # rows orthonormal
  np.testing.assert_allclose(pca @ pca.T, np.eye(24), atol=1e-4)
  # row i explains >= variance of row i+1
  proj_var = np.var(data @ pca.T, axis=0)
  assert np.all(np.diff(proj_var) <= 1e-4)
  # matches numpy eigendecomposition up to sign
  want = np.linalg.eigh(data.T @ data / 500)[1][:, ::-1].T
  overlap = np.abs(np.sum(pca * want, axis=1))
  np.testing.assert_allclose(overlap[:20], 1.0, atol=1e-3)


def test_ica_scanned_matches_perbatch(rng, tmp_path):
  """The scanned ICA trainer must reproduce the per-batch trainer on
  the same batch sequence (schedule change mid-run, checkpoints)."""
  n = 16
  data = _synthetic_patch_batches(rng, num_batches=4, batch=32, n=n)
  d0 = np.linalg.qr(rng.randn(n, n))[0].astype(np.float32)
  params = {
      "num_epochs": 3,
      "dictionary_update_algorithm": "ica_natural_gradient",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.02, "num_iters": 1},
          5: {"stepsize": 0.01, "num_iters": 2}},
      "stdout_print_interval": 1000,
  }
  ref = np.asarray(ica_trainer.train_dictionary(data, d0, params))
  fast = np.asarray(ica_trainer.train_dictionary_scanned(
      np.stack(list(data)), d0, dict(
          params, checkpoint_schedule={6},
          logging_folder_fullpath=tmp_path / "ica_scan")))
  np.testing.assert_allclose(fast, ref, atol=2e-5)
  assert (tmp_path / "ica_scan" / "checkpoint_dictionary_iter_6").exists()
  # the literal per-batch-solve path must also match
  exact = np.asarray(ica_trainer.train_dictionary_scanned(
      np.stack(list(data)), d0, dict(params, warm_inverse=False)))
  np.testing.assert_allclose(exact, ref, atol=2e-5)


def test_ica_warm_inverse_residual(rng):
  """Newton-Schulz refinement holds an fp-level inverse residual under
  natural-gradient-scale dictionary drift."""
  import jax.numpy as jnp
  from vtc_tpu.analysis_transforms.fully_connected import invertible_linear
  n = 24
  d = np.linalg.qr(rng.randn(n, n))[0].astype(np.float32)
  x = invertible_linear.exact_inverse(jnp.asarray(d))
  for _ in range(30):
    d = d + (0.01 / np.sqrt(n)) * rng.randn(n, n).astype(np.float32) @ d
    x = invertible_linear.newton_refine_inverse(jnp.asarray(d), x)
    resid = np.max(np.abs(np.asarray(x) @ d - np.eye(n)))
    assert resid < 1e-5, resid


def test_ica_warm_inverse_guard_recovers_from_divergence(rng):
  """The guarded refinement (used by the scanned trainer) must detect a
  diverged estimate (||I - D X|| >= 1: Newton-Schulz blows up) and fall
  back to the exact LU inverse instead of corrupting training."""
  import jax.numpy as jnp
  from vtc_tpu.analysis_transforms.fully_connected import invertible_linear
  n = 24
  d = np.linalg.qr(rng.randn(n, n))[0].astype(np.float32)
  garbage = jnp.asarray(10.0 * rng.randn(n, n).astype(np.float32))
  # unguarded refinement diverges from this seed...
  bad = invertible_linear.newton_refine_inverse(jnp.asarray(d), garbage)
  assert not np.all(np.isfinite(np.asarray(bad))) or np.max(
      np.abs(np.asarray(bad) @ d - np.eye(n))) > 1.0
  # ...the guard returns the exact inverse
  x = invertible_linear.refine_inverse_guarded(jnp.asarray(d), garbage)
  resid = np.max(np.abs(np.asarray(x) @ d - np.eye(n)))
  assert resid < 1e-5, resid
  # and on a HEALTHY estimate it returns the refined one (no LU detour):
  # value equality with the unguarded path at fp level
  near = invertible_linear.exact_inverse(jnp.asarray(d)) + 1e-3
  np.testing.assert_array_equal(
      np.asarray(invertible_linear.refine_inverse_guarded(
          jnp.asarray(d), near)),
      np.asarray(invertible_linear.newton_refine_inverse(
          jnp.asarray(d), near)))


def test_ica_scanned_precision_tiers(rng, tmp_path):
  """The ICA train_precision tiers (same flag as the sparse-coding
  scanned trainer) must run, track the f32 trajectory on the CPU
  backend (where the tier precisions are exact), and reject the
  LU-solve combination."""
  import pytest
  n = 16
  data = _synthetic_patch_batches(rng, num_batches=4, batch=32, n=n)
  d0 = np.linalg.qr(rng.randn(n, n))[0].astype(np.float32)
  params = {
      "num_epochs": 2,
      "dictionary_update_algorithm": "ica_natural_gradient",
      "dict_update_param_schedule": {0: {"stepsize": 0.02, "num_iters": 1}},
      "stdout_print_interval": 1000,
      # pin the refinement depth so the tiers' residual-adaptive boost
      # thresholds (_TIERS, BENCH_NOTES UPDATE 30d) cannot fire on this
      # deliberately ill-conditioned data: at depth 5 every tier sits at
      # the fp floor, restoring the exact tiers==f32 CPU invariant this
      # test pins (adaptive-depth behavior is covered by
      # test_ica_boost_restores_deep_refinement_accuracy)
      "refine_iters": 5,
  }
  stacked = np.stack(list(data))
  ref = np.asarray(ica_trainer.train_dictionary_scanned(
      stacked, d0, dict(params)))
  for tier in ("bf16x3", "bf16"):
    got = np.asarray(ica_trainer.train_dictionary_scanned(
        stacked, d0, dict(params, train_precision=tier)))
    assert np.all(np.isfinite(got))
    # CPU backend executes every tier in f32; only the guard/boost
    # tolerances differ, and at the pinned depth neither fires
    np.testing.assert_allclose(got, ref, atol=2e-5)
  with pytest.raises(AssertionError, match="warm_inverse"):
    ica_trainer.train_dictionary_scanned(
        stacked, d0,
        dict(params, train_precision="bf16x3", warm_inverse=False))
  with pytest.raises(AssertionError, match="train_precision"):
    ica_trainer.train_dictionary_scanned(
        stacked, d0, dict(params, train_precision="fp8"))
