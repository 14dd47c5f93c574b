"""END-TO-END trainer trajectory parity against the ACTUAL reference.

test_reference_parity.py proves per-op parity; these tests close the
remaining gap by running N full training steps (schedule changes,
checkpoints, epochs) through BOTH trainers -- the PyTorch reference's
training/sparse_coding.py:450-519 loop and vtc_tpu's -- from identical
data and initialization, and comparing the dictionary at every
checkpoint plus the final loss/pSNR metrics.

Measured headroom (2026-08-17, CPU float32): fc steepest descent
1.2e-7, fc cheap-quad 2.8e-6, subspace cheap-quad with alignment
penalty 4.4e-6, conv (both rules) 1.8e-7 -- the 1e-4 contract holds
with >20x margin at this trajectory length.  (The cheap-quad Hessian
EMA is chaotic over LONG trajectories -- shrinkage-boundary flips
amplify fp noise -- so these tests keep to ~10-step runs where the
comparison is meaningful.)

Skipped automatically when torch or the reference checkout is missing.
"""
import pickle
import sys
import types
from pathlib import Path

import numpy as np
import pytest

_REF = Path("/root/reference/vision_transform_codes")

torch = pytest.importorskip("torch")
if not _REF.exists():  # pragma: no cover
  pytest.skip("reference checkout not available", allow_module_level=True)

# same compatibility shims as test_reference_parity.py: symeig was
# removed from modern torch (the modern one raises), and the reference's
# plotting module imports the long-removed skimage.measure.compare_ssim
# at module scope (unused by the training loop itself)
torch.symeig = lambda m, eigenvectors=False: torch.linalg.eigh(m)
_sk = types.ModuleType("skimage")
_skm = types.ModuleType("skimage.measure")
_skm.compare_ssim = lambda *a, **kw: 0.0
_sk.measure = _skm
sys.modules.setdefault("skimage", _sk)
sys.modules.setdefault("skimage.measure", _skm)
sys.path.insert(0, str(_REF))


def _fc_data(rng, k=5, b=24, n=32):
  basis = rng.randn(6, n)
  w = rng.randn(k * b, 6) * 2.0
  data = (w @ basis + 0.3 * rng.randn(k * b, n)).astype(np.float32)
  return (data / 10.0).reshape(k, b, n)


def _run_both(params, d0, train, val, tmp_path, ckpt_iters=()):
  """Run the reference trainer and ours on identical inputs; return
  (ref_final, our_final, [(iter, ref_ckpt, our_ckpt), ...])."""
  from training import sparse_coding as ref_sc

  from vtc_tpu.training import sparse_coding as our_sc

  ref_dir, our_dir = tmp_path / "ref", tmp_path / "ours"
  ref_params = dict(params)
  our_params = dict(params)
  if ckpt_iters:
    for p, d in ((ref_params, ref_dir), (our_params, our_dir)):
      p["logging_folder_fullpath"] = d
      p["checkpoint_schedule"] = set(ckpt_iters)
  ref_d = torch.from_numpy(d0.copy())
  ref_sc.train_dictionary(torch.from_numpy(train.copy()),
                          torch.from_numpy(val.copy()), ref_d,
                          ref_params)
  ours = np.asarray(our_sc.train_dictionary(train, val, d0.copy(),
                                            our_params))
  ckpts = []
  for it in ckpt_iters:
    name = f"checkpoint_dictionary_iter_{it}"
    with open(ref_dir / name, "rb") as f:
      rd = pickle.load(f)
    with open(our_dir / name, "rb") as f:
      od = pickle.load(f)
    ckpts.append((it, rd, od))
  return ref_d.numpy(), ours, ckpts


@pytest.mark.parametrize("update_alg", ["sc_steepest_descent",
                                        "sc_cheap_quadratic_descent"])
def test_fc_training_run_matches_reference(rng, update_alg, tmp_path):
  """2 epochs x 5 batches with mid-run schedule changes: the dictionary
  matches the torch reference at both checkpoints and at the end, and
  the final validation metrics (LASSO loss / pSNR) coincide."""
  from vtc_tpu.analysis_transforms.fully_connected import ista_fista
  from vtc_tpu.training.sparse_coding import compute_metrics

  k, b, n, s = 5, 24, 32, 48
  train = _fc_data(rng, k, b, n)
  val = _fc_data(rng, 1, b, n)
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  params = {
      "mode": "fully-connected",
      "num_epochs": 2,
      "code_inference_algorithm": "fista",
      "dictionary_update_algorithm": update_alg,
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 15},
          6: {"sparsity_weight": 0.04, "num_iters": 20}},
      "dict_update_param_schedule": {
          0: {"stepsize": 0.05, "num_iters": 1},
          6: {"stepsize": 0.02, "num_iters": 2}},
  }
  ref_d, ours, ckpts = _run_both(params, d0, train, val, tmp_path,
                                 ckpt_iters=(3, 7))
  for it, rd, od in ckpts:
    np.testing.assert_allclose(od, rd, atol=1e-4,
                               err_msg=f"checkpoint iter {it}")
  np.testing.assert_allclose(ours, ref_d, atol=1e-4, err_msg="final")

  # loss/pSNR trajectories coincide: evaluate both final dictionaries
  # with the same inference + metrics
  def metrics_of(dictionary):
    codes = np.asarray(ista_fista.run(val[0], dictionary, 0.04, 20))
    return compute_metrics(val[0], codes, dictionary, dictionary,
                           mode="fully-connected", sparsity_weight=0.04)

  m_ref, m_ours = metrics_of(ref_d), metrics_of(ours)
  for key in ("Average LASSO Loss", "Average pSNR of reconstructions"):
    np.testing.assert_allclose(m_ours[key], m_ref[key], rtol=1e-4,
                               err_msg=key)


def test_subspace_training_run_matches_reference(rng, tmp_path):
  """Subspace inference + cheap-quad update WITH the anti-alignment
  regularizer, 2 epochs."""
  k, b, n, s = 5, 24, 32, 48
  train = _fc_data(rng, k, b, n)
  val = _fc_data(rng, 1, b, n)
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  params = {
      "mode": "fully-connected",
      "num_epochs": 2,
      "code_inference_algorithm": "subspace_fista",
      "dictionary_update_algorithm": (
          "subspace_sc_cheap_quadratic_descent"),
      "group_assignments": [list(range(i, i + 4))
                            for i in range(0, s, 4)],
      "subspace_alignment_penalty": 0.1,
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 12}},
      "dict_update_param_schedule": {
          0: {"stepsize": 0.05, "num_iters": 1}},
  }
  ref_d, ours, ckpts = _run_both(params, d0, train, val, tmp_path,
                                 ckpt_iters=(4,))
  np.testing.assert_allclose(ckpts[0][2], ckpts[0][1], atol=1e-4)
  np.testing.assert_allclose(ours, ref_d, atol=1e-4)


@pytest.mark.parametrize("update_alg", ["sc_steepest_descent",
                                        "sc_cheap_quadratic_descent"])
def test_conv_training_run_matches_reference(rng, update_alg, tmp_path):
  """Convolutional mode (strided kernels, explicit padding mask),
  2 epochs x 3 batches."""
  kb, c, kk, img = 3, 1, 4, 12
  stride, pad = (2, 2), ((2, 2), (2, 2))
  d0 = rng.randn(6, c, kk, kk).astype(np.float32)
  d0 /= np.sqrt((d0 ** 2).sum(axis=(1, 2, 3), keepdims=True))
  h = img + 4
  train = np.zeros((kb, 4, c, h, h), np.float32)
  train[:, :, :, 2:-2, 2:-2] = 0.2 * rng.randn(kb, 4, c, img, img)
  val = train[:1]
  params = {
      "mode": "convolutional",
      "num_epochs": 2,
      "code_inference_algorithm": "ista",
      "dictionary_update_algorithm": update_alg,
      "strides": stride,
      "padding": pad,
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.02, "num_iters": 10}},
      "dict_update_param_schedule": {
          0: {"stepsize": 0.02, "num_iters": 1}},
  }
  ref_d, ours, ckpts = _run_both(params, d0, train, val, tmp_path,
                                 ckpt_iters=(3,))
  np.testing.assert_allclose(ckpts[0][2], ckpts[0][1], atol=1e-4)
  np.testing.assert_allclose(ours, ref_d, atol=1e-4)
