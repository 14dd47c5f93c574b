"""Direct parity against the ACTUAL reference implementation.

These tests import the PyTorch reference from /root/reference (where the
build environment mounts it read-only) and compare our solvers' outputs
against the reference's own code paths on identical inputs -- the
strongest form of the 1e-4 parity contract.  Skipped automatically when
the reference checkout or torch is unavailable (the suite stays
hermetic).

torch.symeig was removed from modern PyTorch; the reference calls it
(fully_connected/ista_fista.py:73), so a compatibility shim mapping it
to torch.linalg.eigh is installed before importing the reference.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

_REF = Path("/root/reference/vision_transform_codes")

torch = pytest.importorskip("torch")
if not _REF.exists():  # pragma: no cover
  pytest.skip("reference checkout not available", allow_module_level=True)

# --- compatibility shims so the (older-torch) reference runs ------------
if not hasattr(torch, "symeig") or True:
  def _symeig_compat(matrix, eigenvectors=False):
    vals, vecs = torch.linalg.eigh(matrix)
    return vals, vecs
  torch.symeig = _symeig_compat

sys.path.insert(0, str(_REF))


def _fc_problem(rng, b=16, s=48, n=32):
  d = rng.randn(s, n).astype(np.float32)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  x = rng.randn(b, n).astype(np.float32)
  return x, d


@pytest.mark.parametrize("variant", ["ista", "fista"])
def test_fc_codes_match_reference(rng, variant):
  from analysis_transforms.fully_connected import ista_fista as ref_if

  from vtc_tpu.analysis_transforms.fully_connected import ista_fista

  x, d = _fc_problem(rng)
  lam, iters = 0.1, 25
  ref_codes = ref_if.run(
      torch.from_numpy(x), torch.from_numpy(d),
      torch.tensor(lam), iters, variant=variant).numpy()
  for formulation in ("direct", "gram", "pallas"):
    ours = np.asarray(ista_fista.run(
        x, d, lam, iters, variant=variant, formulation=formulation))
    np.testing.assert_allclose(ours, ref_codes, atol=1e-4,
                               err_msg=formulation)


@pytest.mark.parametrize("nonneg,hard", [(True, False), (False, True)])
def test_fc_threshold_variants_match_reference(rng, nonneg, hard):
  from analysis_transforms.fully_connected import ista_fista as ref_if

  from vtc_tpu.analysis_transforms.fully_connected import ista_fista

  x, d = _fc_problem(rng)
  ref_codes = ref_if.run(
      torch.from_numpy(x), torch.from_numpy(d), torch.tensor(0.1), 20,
      variant="fista", nonnegative_only=nonneg,
      hard_threshold=hard).numpy()
  ours = np.asarray(ista_fista.run(
      x, d, 0.1, 20, nonnegative_only=nonneg, hard_threshold=hard))
  np.testing.assert_allclose(ours, ref_codes, atol=1e-4)


def test_subspace_codes_match_reference(rng):
  from analysis_transforms.fully_connected import (
      subspace_ista_fista as ref_sub)

  from vtc_tpu.analysis_transforms.fully_connected import (
      subspace_ista_fista)

  x, d = _fc_problem(rng, b=8, s=32, n=24)
  groups = [[0, 2, 5], [1], [2, 3, 4, 5]] + [
      list(range(i, i + 4)) for i in range(6, 30, 4)] + [[30, 31]]
  ref_codes = ref_sub.run(
      torch.from_numpy(x), torch.from_numpy(d), groups,
      torch.tensor(0.08), 15).numpy()
  ours = np.asarray(subspace_ista_fista.run(x, d, groups, 0.08, 15))
  np.testing.assert_allclose(ours, ref_codes, atol=1e-4)


def test_fc_dict_updates_match_reference(rng):
  from dict_update_rules.fully_connected import (
      sc_cheap_quadratic_descent as ref_cqd)
  from dict_update_rules.fully_connected import (
      sc_steepest_descent as ref_sd)

  from vtc_tpu.dict_update_rules.fully_connected import (
      sc_cheap_quadratic_descent, sc_steepest_descent)

  x, d = _fc_problem(rng, b=24)
  codes = (rng.randn(24, 48) * (rng.rand(24, 48) > 0.6)).astype(
      np.float32)
  # steepest descent (reference mutates in place)
  ref_d = torch.from_numpy(d.copy())
  ref_sd.run(torch.from_numpy(x), ref_d, torch.from_numpy(codes),
             stepsize=0.05, num_iters=2)
  ours = np.asarray(sc_steepest_descent.run(x, d, codes, 0.05, 2))
  np.testing.assert_allclose(ours, ref_d.numpy(), atol=1e-5)
  # cheap quadratic descent
  hessian = (np.abs(rng.rand(48)) * 0.01).astype(np.float32)
  ref_d = torch.from_numpy(d.copy())
  ref_cqd.run(torch.from_numpy(x), ref_d, torch.from_numpy(codes),
              torch.from_numpy(hessian), stepsize=0.1, num_iters=1)
  ours = np.asarray(sc_cheap_quadratic_descent.run(
      x, d, codes, hessian, 0.1, 1))
  np.testing.assert_allclose(ours, ref_d.numpy(), atol=1e-5)


def test_ica_update_matches_reference(rng):
  from dict_update_rules.fully_connected import (
      ica_natural_gradient as ref_ica)

  from vtc_tpu.dict_update_rules.fully_connected import (
      ica_natural_gradient)

  n = 24
  d = np.linalg.qr(rng.randn(n, n))[0].astype(np.float32)
  codes = rng.randn(40, n).astype(np.float32)
  ref_d = torch.from_numpy(d.copy())
  ref_ica.run(ref_d, torch.from_numpy(codes), stepsize=0.01,
              num_iters=2)
  ours = np.asarray(ica_natural_gradient.run(d, codes, 0.01, 2))
  np.testing.assert_allclose(ours, ref_d.numpy(), atol=1e-5)


def test_conv_codes_match_reference(rng):
  import utils.convolutions  # reference needs its own utils on path
  from analysis_transforms.convolutional import ista_fista as ref_conv

  from vtc_tpu.analysis_transforms.convolutional import ista_fista

  b, s, c, k, img = 2, 6, 1, 4, 12
  pad = ((2, 2), (2, 2))
  stride = (2, 2)
  d = rng.randn(s, c, k, k).astype(np.float32)
  d /= np.sqrt((d**2).sum(axis=(1, 2, 3), keepdims=True))
  h = img + 4
  x = np.zeros((b, c, h, h), np.float32)
  x[:, :, 2:-2, 2:-2] = rng.randn(b, c, img, img)
  ref_codes = ref_conv.run(
      torch.from_numpy(x), torch.from_numpy(d), stride, pad,
      torch.tensor(0.05), 10, variant="ista").numpy()
  ours = np.asarray(ista_fista.run(x, d, stride, pad, 0.05, 10,
                                   variant="ista"))
  np.testing.assert_allclose(ours, ref_codes, atol=1e-4)
