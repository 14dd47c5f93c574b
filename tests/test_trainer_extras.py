"""Trainer extras: data-parallel mode, resume helper, LCA availability
through the package API."""
import numpy as np

from vtc_tpu.training import sparse_coding as sc
from vtc_tpu.utils import checkpoint as ckpt_util


def _data(rng, nb=4, b=32, n=32):
  basis = rng.randn(6, n)
  w = rng.randn(nb * b, 6) * 2
  return (w @ basis + 0.2 * rng.randn(nb * b, n)).astype(
      np.float32).reshape(nb, b, n)


def _params(extra=None):
  p = {
      "mode": "fully-connected",
      "num_epochs": 2,
      "code_inference_algorithm": "fista",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 10}},
      "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.1, "num_iters": 1}},
      "fc_formulation": "gram",
  }
  p.update(extra or {})
  return p


def test_data_parallel_trainer_matches_single_device(rng):
  data = _data(rng)
  d0 = rng.randn(48, 32).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  ref = np.asarray(sc.train_dictionary(data, data[:1], d0, _params()))
  dp = np.asarray(sc.train_dictionary(
      data, data[:1], d0, _params({"data_parallel": True})))
  np.testing.assert_allclose(dp, ref, atol=5e-5)


def test_resume_training_state(rng, tmp_path):
  data = _data(rng)
  d0 = rng.randn(32, 32).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  logdir = tmp_path / "resume_run"
  sc.train_dictionary(data, data[:1], d0, _params({
      "checkpoint_schedule": {2, 6},
      "logging_folder_fullpath": logdir}))
  dictionary, state, iteration = ckpt_util.resume_training_state(logdir)
  assert iteration == 6
  assert dictionary.shape == (32, 32)
  assert state is not None
  assert int(state["train_iteration"]) == 6
  assert state["hessian_diagonal"].shape == (32,)


def test_exact_resume_matches_uninterrupted(rng, tmp_path):
  """all_params['resume_state'] continues an interrupted run exactly:
  resuming from an epoch-boundary checkpoint (dictionary + Hessian EMA
  + iteration counter, so mid-run schedule changes resolve at their
  original global iterations) reproduces the uninterrupted run."""
  data = _data(rng)
  k = data.shape[0]
  d0 = rng.randn(32, 32).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  sched = {"inference_param_schedule": {
               0: {"sparsity_weight": 0.05, "num_iters": 10},
               k + 1: {"sparsity_weight": 0.05, "num_iters": 15}}}
  full = np.asarray(sc.train_dictionary(
      data, None, d0, _params(sched)))
  logdir = tmp_path / "interrupted"
  sc.train_dictionary(data, None, d0, _params(dict(
      sched, checkpoint_schedule={k},
      logging_folder_fullpath=logdir)))
  d_ck, state, it = ckpt_util.resume_training_state(logdir)
  assert it == k
  resumed = np.asarray(sc.train_dictionary(
      data, None, d_ck, _params(dict(
          sched, num_epochs=1, resume_state=state))))
  np.testing.assert_allclose(resumed, full, atol=1e-6)
