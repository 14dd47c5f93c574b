"""Fused whole-segment train kernel vs the composed XLA path
(interpreter mode on the CPU test mesh; the real-TPU comparison runs in
bench/verify).  The invariant: one kernel launch over k batches must
reproduce the scan of [power_iterate -> raw fused step ('gram')] that
the scanned trainer / bench.py run, to float tolerance."""
import numpy as np
import pytest

import jax.numpy as jnp

from vtc_tpu.ops import lipschitz as lip
from vtc_tpu.ops.pallas_train_step import (
    fused_segment_supported, fused_train_segment_pallas)
from vtc_tpu.training import sparse_coding as sc


def _reference_segment(d0, h0, v0, batches, sw, n_it, upd_step,
                       upd_niters, variant, update_alg, nonneg=False,
                       hard=False, power_iters=2):
  raw = sc.build_raw_step_fn(
      "fully-connected", variant, update_alg, nonneg=nonneg,
      hard_threshold=hard, fc_formulation="gram",
      compute_stepsize_in_step=False)
  d, h, v = jnp.asarray(d0), jnp.asarray(h0), jnp.asarray(v0)
  codes = None
  for batch in batches:
    eigval, v = lip.power_iterate(d, v, num_iters=power_iters)
    d, h, codes = raw(d, h, jnp.asarray(batch), jnp.float32(sw),
                      jnp.int32(n_it), jnp.float32(upd_step),
                      upd_niters, 1.0 / eigval)
  return np.asarray(d), np.asarray(h), np.asarray(v), np.asarray(codes)


def _problem(rng, k=3, b=10, s=24, n=16):
  d = rng.randn(s, n).astype(np.float32)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  batches = rng.randn(k, b, n).astype(np.float32)
  h = np.abs(rng.rand(s)).astype(np.float32) * 0.01
  v = rng.randn(min(s, n)).astype(np.float32)
  return d, h, v, batches


@pytest.mark.parametrize("variant,update_alg", [
    ("fista", "sc_cheap_quadratic_descent"),
    ("fista", "sc_steepest_descent"),
    ("ista", "sc_cheap_quadratic_descent"),
])
def test_fused_segment_matches_composed_path(rng, variant, update_alg):
  d, h, v, batches = _problem(rng)
  # single step first: strict (no trajectory feedback)
  want1 = _reference_segment(d, h, v, batches[:1], 0.05, 12, 0.1, 1,
                             variant, update_alg)
  got1 = fused_train_segment_pallas(
      d, h, v, batches[:1], 0.05, 12, 0.1, variant=variant,
      update_alg=update_alg, power_iters=2, interpret=True)
  for w, g, name in zip(want1, got1, ["dict", "hessian", "eigvec",
                                      "codes"]):
    np.testing.assert_allclose(np.asarray(g), w, atol=2e-5, err_msg=name)
  # multi-step: the fista + cheap-quad combination amplifies ~1e-7
  # per-iteration rounding differences through shrinkage-boundary flips
  # (same chaos documented in test_warm_power), so its Hessian EMA gets
  # a chaos-tolerant bound; everything else stays strict
  want = _reference_segment(d, h, v, batches, 0.05, 12, 0.1, 1,
                            variant, update_alg)
  got = fused_train_segment_pallas(
      d, h, v, batches, 0.05, 12, 0.1, variant=variant,
      update_alg=update_alg, power_iters=2, interpret=True)
  chaotic = variant == "fista" and update_alg == (
      "sc_cheap_quadratic_descent")
  tols = {"dict": 2e-5, "hessian": 1e-3 if chaotic else 2e-5,
          "eigvec": 2e-5, "codes": 5e-3 if chaotic else 2e-5}
  for w, g, name in zip(want, got, ["dict", "hessian", "eigvec",
                                    "codes"]):
    np.testing.assert_allclose(np.asarray(g), w, atol=tols[name],
                               err_msg=name)


def test_fused_segment_overcomplete_and_multi_update(rng):
  """s > n exercises the n x n power Gram; upd_num_iters > 1 the inner
  descent loop; odd shapes the zero-padding guards."""
  d, h, v, batches = _problem(rng, k=2, b=7, s=33, n=12)
  want = _reference_segment(d, h, v, batches, 0.03, 8, 0.05, 3,
                            "fista", "sc_cheap_quadratic_descent")
  got = fused_train_segment_pallas(
      d, h, v, batches, 0.03, 8, 0.05, upd_num_iters=3,
      power_iters=2, interpret=True)
  for w, g in zip(want, got):
    np.testing.assert_allclose(np.asarray(g), w, atol=2e-5)


def test_fused_segment_nonneg(rng):
  d, h, v, batches = _problem(rng, k=2)
  want = _reference_segment(d, h, v, batches, 0.05, 10, 0.1, 1,
                            "fista", "sc_cheap_quadratic_descent",
                            nonneg=True)
  got = fused_train_segment_pallas(
      d, h, v, batches, 0.05, 10, 0.1, nonneg=True, power_iters=2, interpret=True)
  for w, g in zip(want, got):
    np.testing.assert_allclose(np.asarray(g), w, atol=2e-5)


def test_supported_gate():
  assert fused_segment_supported(
      "fully-connected", "fista", "sc_cheap_quadratic_descent",
      batch_size=250, code_size=256, input_size=256)
  assert not fused_segment_supported(
      "convolutional", "fista", "sc_cheap_quadratic_descent")
  assert not fused_segment_supported(
      "fully-connected", "subspace_fista",
      "subspace_sc_cheap_quadratic_descent",
      group_assignments=[[0, 1]])
  # a batch too large for one VMEM tile falls back
  assert not fused_segment_supported(
      "fully-connected", "fista", "sc_cheap_quadratic_descent",
      batch_size=65536, code_size=1024, input_size=1024)


def test_fused_segment_batch_tiled(rng):
  """The batch-tiled kernel (per-tile gradient accumulation in VMEM
  scratch, update on the step's last tile) must match the whole-batch
  composed path -- including a batch that pads up to the tile size."""
  d, h, v, batches = _problem(rng, k=3, b=30, s=24, n=16)
  want = _reference_segment(d, h, v, batches, 0.05, 12, 0.1, 1,
                            "fista", "sc_cheap_quadratic_descent")
  got = fused_train_segment_pallas(
      d, h, v, batches, 0.05, 12, 0.1, batch_tile=8, power_iters=2, interpret=True)
  for w, g, name in zip(want, got, ["dict", "hessian", "eigvec",
                                    "codes"]):
    np.testing.assert_allclose(np.asarray(g), w, atol=2e-5, err_msg=name)


def test_fused_segment_batch_tiled_steepest(rng):
  d, h, v, batches = _problem(rng, k=2, b=16, s=12, n=20)
  want = _reference_segment(d, h, v, batches, 0.04, 10, 0.08, 1,
                            "fista", "sc_steepest_descent")
  got = fused_train_segment_pallas(
      d, h, v, batches, 0.04, 10, 0.08,
      update_alg="sc_steepest_descent", batch_tile=8,
      power_iters=2, interpret=True)
  for w, g in zip(want, got):
    np.testing.assert_allclose(np.asarray(g), w, atol=2e-5)


def test_fused_segment_batch_tiled_multi_update_iters(rng):
  """Gram-form accumulation (C = sum codes^T codes, B = sum codes^T X)
  makes the tiled kernel's multi-iteration update EXACT: each descent
  iteration's gradient (C D' - B)/b equals the reference's
  full-batch codes^T (codes D' - X)/b at the current dictionary D'."""
  d, h, v, batches = _problem(rng, k=2, b=30, s=24, n=16)
  want = _reference_segment(d, h, v, batches, 0.05, 12, 0.1, 3,
                            "fista", "sc_cheap_quadratic_descent")
  got = fused_train_segment_pallas(
      d, h, v, batches, 0.05, 12, 0.1, upd_num_iters=3, batch_tile=8,
      power_iters=2, interpret=True)
  for w, g, name in zip(want, got, ["dict", "hessian", "eigvec",
                                    "codes"]):
    np.testing.assert_allclose(np.asarray(g), w, atol=2e-5, err_msg=name)
  # the support gate no longer special-cases multi-iteration updates
  assert fused_segment_supported(
      "fully-connected", "fista", "sc_cheap_quadratic_descent",
      batch_size=8192, code_size=256, input_size=256, upd_num_iters=3)


def _reference_group_segment(d0, h0, v0, batches, groups, sw, n_it,
                             upd_step, upd_niters, variant, update_alg,
                             power_iters=2, alignment_penalty=0.0,
                             early_stopping_epsilon=None):
  from vtc_tpu.analysis_transforms.fully_connected import (
      subspace_ista_fista)
  raw = sc.build_raw_step_fn(
      "fully-connected", "subspace_" + variant, update_alg,
      group_assignments=groups, alignment_penalty=alignment_penalty,
      fc_formulation="gram", compute_stepsize_in_step=False,
      early_stopping_epsilon=early_stopping_epsilon)
  gi, vm = subspace_ista_fista.pack_group_indices(groups, d0.shape[0])
  d, h, v = jnp.asarray(d0), jnp.asarray(h0), jnp.asarray(v0)
  codes = None
  for batch in batches:
    grouped = subspace_ista_fista.build_grouped_dictionary(d, gi, vm)
    eigval, v = lip.power_iterate(grouped, v, num_iters=power_iters)
    d, h, codes = raw(d, h, jnp.asarray(batch), jnp.float32(sw),
                      jnp.int32(n_it), jnp.float32(upd_step),
                      upd_niters, 1.0 / eigval)
  return np.asarray(d), np.asarray(h), np.asarray(v), np.asarray(codes)


@pytest.mark.parametrize("update_alg", [
    "subspace_sc_cheap_quadratic_descent",
    "subspace_sc_steepest_descent"])
def test_fused_group_segment_matches_composed_path(rng, update_alg):
  """Ragged, overlapping groups; the fused kernel's gsel/expand matmul
  formulation must reproduce the gather/segment-sum XLA path."""
  from vtc_tpu.ops.pallas_train_step import (
      fused_group_segment_supported, fused_group_train_segment_pallas)

  s, n, b, k = 14, 16, 10, 3
  groups = [[0, 1, 2, 3], [4, 5], [6, 7, 8], [9, 10, 11, 12], [13, 0]]
  d = rng.randn(s, n).astype(np.float32)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  batches = rng.randn(k, b, n).astype(np.float32)
  h = np.abs(rng.rand(s)).astype(np.float32) * 0.01
  gm = len(groups) * max(len(g) for g in groups)
  v = rng.randn(min(gm, n)).astype(np.float32)

  assert fused_group_segment_supported(
      "subspace_fista", update_alg, groups,
      batch_size=b, code_size=s, input_size=n)
  want = _reference_group_segment(d, h, v, batches, groups, 0.05, 10,
                                  0.1, 1, "fista", update_alg)
  got = fused_group_train_segment_pallas(
      d, h, v, batches, 0.05, 10, 0.1, group_assignments=groups,
      update_alg=update_alg, power_iters=2, interpret=True)
  for w, g, name in zip(want, got, ["dict", "hessian", "eigvec",
                                    "codes"]):
    np.testing.assert_allclose(np.asarray(g), w, atol=3e-5, err_msg=name)


def test_fused_group_segment_in_kernel_early_stop(rng):
  """The group segment kernel's in-kernel early stop (grouped-tensor
  batch-global mean) == the composed XLA path with the same epsilon,
  and is non-vacuous."""
  from vtc_tpu.ops.pallas_train_step import (
      fused_group_train_segment_pallas)

  from vtc_tpu.analysis_transforms.fully_connected import (
      subspace_ista_fista)

  s, n, b, k = 14, 16, 10, 3
  eps = 3e-2
  groups = [[0, 1, 2, 3], [4, 5], [6, 7, 8], [9, 10, 11, 12], [13, 0]]
  d = rng.randn(s, n).astype(np.float32)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  batches = rng.randn(k, b, n).astype(np.float32) * 0.5
  h = np.abs(rng.rand(s)).astype(np.float32) * 0.01
  # exact eigenpair seed: a random power-2 seed underestimates the
  # Lipschitz constant, and 40 FISTA iterations of a slightly-too-long
  # step diverge (the trainer always seeds exactly; see seed_eigvec)
  gi, vm = subspace_ista_fista.pack_group_indices(groups, s)
  grouped0 = subspace_ista_fista.build_grouped_dictionary(
      jnp.asarray(d), gi, vm)
  _, v = lip.top_gram_eigenpair(grouped0)
  v = np.asarray(v)

  want = _reference_group_segment(
      d, h, v, batches, groups, 0.05, 40, 0.005, 1, "fista",
      "subspace_sc_cheap_quadratic_descent",
      early_stopping_epsilon=eps)
  got = fused_group_train_segment_pallas(
      d, h, v, batches, 0.05, 40, 0.005, group_assignments=groups,
      update_alg="subspace_sc_cheap_quadratic_descent", power_iters=2,
      interpret=True, early_stopping_epsilon=eps)
  for w, g, name in zip(want, got, ["dict", "hessian", "eigvec",
                                    "codes"]):
    np.testing.assert_allclose(np.asarray(g), w, atol=3e-5,
                               err_msg=name)
  # non-vacuous: differs from the full-40-iteration run
  full = fused_group_train_segment_pallas(
      d, h, v, batches, 0.05, 40, 0.005, group_assignments=groups,
      update_alg="subspace_sc_cheap_quadratic_descent", power_iters=2,
      interpret=True)
  assert np.abs(np.asarray(got[0]) - np.asarray(full[0])).max() > 1e-7


@pytest.mark.parametrize("update_alg", [
    "subspace_sc_cheap_quadratic_descent",
    "subspace_sc_steepest_descent"])
def test_fused_group_segment_with_alignment_penalty(rng, update_alg):
  """The in-kernel anti-alignment regularizer (dense co-membership-mask
  formulation) must reproduce the XLA gather/segment-sum regularizer,
  including overlapping groups (pairs co-member in two groups count
  twice)."""
  from vtc_tpu.ops.pallas_train_step import (
      fused_group_segment_supported, fused_group_train_segment_pallas)

  s, n, b, k = 14, 16, 10, 3
  groups = [[0, 1, 2, 3], [4, 5], [6, 7, 8], [9, 10, 11, 12], [13, 0],
            [0, 1]]
  d = rng.randn(s, n).astype(np.float32)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  batches = rng.randn(k, b, n).astype(np.float32)
  h = np.abs(rng.rand(s)).astype(np.float32) * 0.01
  gm = len(groups) * max(len(g) for g in groups)
  v = rng.randn(min(gm, n)).astype(np.float32)

  assert fused_group_segment_supported(
      "subspace_fista", update_alg, groups, alignment_penalty=0.4,
      batch_size=b, code_size=s, input_size=n)
  want = _reference_group_segment(d, h, v, batches, groups, 0.05, 10,
                                  0.1, 1, "fista", update_alg,
                                  alignment_penalty=0.4)
  got = fused_group_train_segment_pallas(
      d, h, v, batches, 0.05, 10, 0.1, group_assignments=groups,
      update_alg=update_alg, alignment_penalty=0.4, power_iters=2,
      interpret=True)
  for w, g, name in zip(want, got, ["dict", "hessian", "eigvec",
                                    "codes"]):
    np.testing.assert_allclose(np.asarray(g), w, atol=3e-5, err_msg=name)


def test_fused_group_gate():
  from vtc_tpu.ops.pallas_train_step import fused_group_segment_supported
  groups = [[0, 1], [2, 3]]
  assert fused_group_segment_supported(
      "subspace_fista", "subspace_sc_cheap_quadratic_descent", groups,
      batch_size=250, code_size=4, input_size=16)
  assert fused_group_segment_supported(  # penalty now in-kernel
      "subspace_fista", "subspace_sc_cheap_quadratic_descent", groups,
      alignment_penalty=0.5)
  assert not fused_group_segment_supported(  # ...but needs unit norms
      "subspace_fista", "subspace_sc_cheap_quadratic_descent", groups,
      alignment_penalty=0.5, renormalize=False)
  assert not fused_group_segment_supported(
      "fista", "sc_cheap_quadratic_descent", None)


def test_tile_picker_low_waste():
  """The batch-tiled fallback sizes tiles to the batch, so zero-row
  padding stays under one sublane-group per tile (not up to 33% as a
  power-of-two tile would give for b just above a boundary)."""
  from vtc_tpu.ops.pallas_train_step import (_SUBLANES, _pick_batch_tile,
                                             round_up)
  for b in (1537, 2048, 8192, 3000):
    tile = _pick_batch_tile(b, 256, 256)
    assert tile is not None
    b_pad = round_up(b, tile)
    waste = (b_pad - b) / b
    assert waste <= _SUBLANES * (b_pad // tile) / b, (b, tile, waste)
    assert waste < 0.03, (b, tile, waste)
  assert _pick_batch_tile(65536, 1024, 1024) is None


def test_fused_segment_early_stop_matches_composed_path(rng):
  """In-kernel early stopping (the whole-segment kernel's per-step
  lax.while_loop) must reproduce the XLA while_loop stop rule
  (ops/solver.py:96-98, reference fc/ista_fista.py:135-144): same trip
  counts per step, hence same codes / dictionary / Hessian -- and the
  stop must genuinely fire (the run differs from the eps=None one)."""
  eps = 5e-3
  s, n, k, b = 24, 16, 3, 10
  basis = rng.randn(8, n)
  wts = rng.randn(k * b, 8) * 2.0
  batches = (wts @ basis + 0.2 * rng.randn(k * b, n)).astype(
      np.float32).reshape(k, b, n)
  d = rng.randn(s, n).astype(np.float32)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  h = np.abs(rng.rand(s)).astype(np.float32) * 0.01
  v = rng.randn(min(s, n)).astype(np.float32)

  raw = sc.build_raw_step_fn(
      "fully-connected", "fista", "sc_cheap_quadratic_descent",
      fc_formulation="gram", compute_stepsize_in_step=False,
      early_stopping_epsilon=eps)
  dj, hj, vj = jnp.asarray(d), jnp.asarray(h), jnp.asarray(v)
  codes = None
  for batch in batches:
    eigval, vj = lip.power_iterate(dj, vj, num_iters=2)
    dj, hj, codes = raw(dj, hj, jnp.asarray(batch), jnp.float32(0.05),
                        jnp.int32(60), jnp.float32(0.01), 1,
                        1.0 / eigval)
  want = (np.asarray(dj), np.asarray(hj), np.asarray(vj),
          np.asarray(codes))
  assert np.isfinite(want[3]).all()

  got = fused_train_segment_pallas(
      d, h, v, batches, 0.05, 60, 0.01, power_iters=2, interpret=True,
      early_stopping_epsilon=eps)
  # fista + cheap-quad over a 3-step trajectory amplifies ~1e-7
  # per-iteration rounding through shrinkage-boundary flips (same chaos
  # bounds as test_fused_segment_matches_composed_path); a TRIP-COUNT
  # mismatch in the stop rule would blow far past these
  tols = {"dict": 2e-5, "hessian": 1e-3, "eigvec": 2e-5, "codes": 5e-3}
  for w, g, name in zip(want, got, ["dict", "hessian", "eigvec",
                                    "codes"]):
    np.testing.assert_allclose(np.asarray(g), w, atol=tols[name],
                               err_msg=name)
  # the stop fired: the fixed-60-iteration run lands elsewhere
  full = fused_train_segment_pallas(
      d, h, v, batches, 0.05, 60, 0.01, power_iters=2, interpret=True)
  assert np.abs(np.asarray(full[3]) - want[3]).max() > 1e-5


def test_fused_segment_early_stop_gate():
  """Early stopping needs the whole batch in ONE VMEM tile (the stop
  test is a batch-global mean; sequential grid tiles cannot share it
  per-iteration) -- the support gate must reflect that."""
  assert fused_segment_supported(
      "fully-connected", "fista", "sc_cheap_quadratic_descent",
      batch_size=250, code_size=256, input_size=256,
      early_stopping_epsilon=1e-4)
  # this batch is supported batch-TILED without eps, but not with it
  assert fused_segment_supported(
      "fully-connected", "fista", "sc_cheap_quadratic_descent",
      batch_size=8192, code_size=512, input_size=512)
  assert not fused_segment_supported(
      "fully-connected", "fista", "sc_cheap_quadratic_descent",
      batch_size=8192, code_size=512, input_size=512,
      early_stopping_epsilon=1e-4)


def test_fused_segment_bf16_training_mode(rng):
  """The opt-in bf16 training-speed tier (mxu='bf16') is NOT parity
  grade, but the training trajectory must stay healthy: finite,
  unit-norm rows, and a final-dictionary reconstruction quality close
  to the f32 path's on the same segment (single-tile and batch-tiled
  variants)."""
  from vtc_tpu.analysis_transforms.fully_connected import ista_fista

  sw = 0.05

  def lasso_loss(d, x):
    """The objective training minimizes: 0.5|x - cD|^2 + sw |c|_1."""
    codes = np.asarray(ista_fista.run(x, d, sw, 25))
    recon = codes @ np.asarray(d)
    return float(np.mean(0.5 * np.sum((x - recon) ** 2, axis=1)
                         + sw * np.sum(np.abs(codes), axis=1)))

  # structured (sparse-synthesizable) data: pure noise at an aggressive
  # stepsize diverges for f32 and bf16 alike, which tests nothing
  s, n, k, b = 24, 16, 6, 16
  basis = rng.randn(8, n)
  w = rng.randn(k * b, 8) * 2.0
  batches = (w @ basis + 0.2 * rng.randn(k * b, n)).astype(
      np.float32).reshape(k, b, n)
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  h0 = np.abs(rng.rand(s)).astype(np.float32) * 0.01
  v0 = rng.randn(min(s, n)).astype(np.float32)

  for tile in (None, 8):  # None = single-tile; 8 forces batch tiling
    d, h, v = d0.copy(), h0.copy(), v0.copy()
    # stepsize 0.01: the cheap-quad Hessian divide makes early steps
    # ~100x effective (EMA starts near the 0.001 floor), so larger
    # steps destabilize f32 and bf16 alike on a 6-step segment
    d32 = fused_train_segment_pallas(
        d, h, v, batches, sw, 12, 0.01, power_iters=2,
        interpret=True, batch_tile=tile)[0]
    dbf = fused_train_segment_pallas(
        d, h, v, batches, sw, 12, 0.01, power_iters=2,
        interpret=True, batch_tile=tile, mxu="bf16")[0]
    dbf = np.asarray(dbf)
    assert np.isfinite(dbf).all()
    np.testing.assert_allclose(np.linalg.norm(dbf, axis=1), 1.0,
                               atol=1e-5)
    x = batches.reshape(-1, batches.shape[-1])
    l32, lbf = lasso_loss(np.asarray(d32), x), lasso_loss(dbf, x)
    l0 = lasso_loss(d0, x)
    assert lbf < l0, (lbf, l0)          # it actually trains
    assert lbf < 1.05 * l32 + 1e-6, (lbf, l32)  # and tracks the f32 run
    # bf16 noise must stay update-scale, not blow up the trajectory
    assert np.abs(dbf - np.asarray(d32)).max() < 0.1


def test_fused_group_segment_bf16_training_mode(rng):
  """bf16 training-speed mode on the subspace/group segment kernel:
  finite, unit norms, update-scale distance from the f32 trajectory
  (incl. the in-kernel alignment regularizer, whose sign-sensitive
  Gram stays full precision)."""
  from vtc_tpu.ops.pallas_train_step import (
      fused_group_train_segment_pallas)
  from vtc_tpu.analysis_transforms.fully_connected import (
      subspace_ista_fista)
  from vtc_tpu.ops import lipschitz as lip

  s, n, k, b = 16, 16, 5, 16
  groups = tuple(tuple(range(i, i + 4)) for i in range(0, s, 4))
  basis = rng.randn(6, n)
  w = rng.randn(k * b, 6) * 2.0
  batches = (w @ basis + 0.2 * rng.randn(k * b, n)).astype(
      np.float32).reshape(k, b, n)
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  h0 = np.zeros(s, np.float32)
  gi, vm = subspace_ista_fista.pack_group_indices(groups, s)
  grouped = subspace_ista_fista.build_grouped_dictionary(
      jnp.asarray(d0), gi, vm)
  _, v0 = lip.top_gram_eigenpair(grouped)

  common = dict(group_assignments=groups,
                update_alg="subspace_sc_cheap_quadratic_descent",
                power_iters=2, alignment_penalty=0.1, interpret=True)
  d32 = fused_group_train_segment_pallas(
      d0, h0, v0, batches, 0.05, 10, 0.01, **common)[0]
  dbf = fused_group_train_segment_pallas(
      d0, h0, v0, batches, 0.05, 10, 0.01, mxu="bf16", **common)[0]
  dbf = np.asarray(dbf)
  assert np.isfinite(dbf).all()
  np.testing.assert_allclose(np.linalg.norm(dbf, axis=1), 1.0,
                             atol=1e-5)
  assert np.abs(dbf - np.asarray(d32)).max() < 0.1


def test_fused_segment_bf16x3_tracks_f32(rng):
  """The 'bf16x3' tier (3-pass split iteration matmul) must track the
  f32 trajectory at near-parity tolerance over a multi-step segment
  (single-tile and batch-tiled)."""
  for tile in (None, 8):
    d, h, v, batches = _problem(rng, k=4, b=16)
    d32 = fused_train_segment_pallas(
        d, h, v, batches, 0.05, 12, 0.05, power_iters=2,
        interpret=True, batch_tile=tile)[0]
    dx3 = fused_train_segment_pallas(
        d, h, v, batches, 0.05, 12, 0.05, power_iters=2,
        interpret=True, batch_tile=tile, mxu="bf16x3")[0]
    np.testing.assert_allclose(np.asarray(dx3), np.asarray(d32),
                               atol=5e-3)


def test_fused_group_segment_bf16x3_tracks_f32(rng):
  from vtc_tpu.ops.pallas_train_step import (
      fused_group_train_segment_pallas)
  from vtc_tpu.analysis_transforms.fully_connected import (
      subspace_ista_fista)
  from vtc_tpu.ops import lipschitz as lip

  s, n, k, b = 16, 16, 4, 16
  groups = tuple(tuple(range(i, i + 4)) for i in range(0, s, 4))
  batches = (0.5 * rng.randn(k, b, n)).astype(np.float32)
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  h0 = np.zeros(s, np.float32)
  gi, vm = subspace_ista_fista.pack_group_indices(groups, s)
  grouped = subspace_ista_fista.build_grouped_dictionary(
      jnp.asarray(d0), gi, vm)
  _, v0 = lip.top_gram_eigenpair(grouped)
  common = dict(group_assignments=groups,
                update_alg="subspace_sc_cheap_quadratic_descent",
                power_iters=2, interpret=True)
  d32 = fused_group_train_segment_pallas(
      d0, h0, v0, batches, 0.05, 10, 0.05, **common)[0]
  dx3 = fused_group_train_segment_pallas(
      d0, h0, v0, batches, 0.05, 10, 0.05, mxu="bf16x3", **common)[0]
  np.testing.assert_allclose(np.asarray(dx3), np.asarray(d32),
                             atol=5e-3)


def test_split3_is_exact_and_prox_highest_matches_f32(rng):
  """The 'highest' prox tier's 3-term bf16 split (pallas_train_step.
  _split3) must reconstruct f32 bitwise, and the 3-pass prox matmuls
  against a 0/1 membership operand must match a true f32 matmul to f32
  accumulation rounding (BENCH_NOTES UPDATE 28)."""
  from vtc_tpu.ops.pallas_train_step import (_split3, _make_prox_dots,
                                             _dot, _dot_t)

  x = jnp.asarray((rng.randn(64, 128) *
                   np.exp(rng.uniform(-12, 12, (64, 128))))
                  .astype(np.float32))
  hi, mid, lo = _split3(x)
  recon = (hi.astype(jnp.float32) + mid.astype(jnp.float32)
           + lo.astype(jnp.float32))
  assert np.array_equal(np.asarray(recon), np.asarray(x))

  # membership-style 0/1 operand: 128 slots -> 32 groups of 4
  e = np.zeros((128, 32), np.float32)
  for g in range(32):
    e[4 * g:4 * g + 4, g] = 1.0
  e = jnp.asarray(e)
  pdot, pdot_t = _make_prox_dots("highest")
  sums = pdot(x * x, e)
  np.testing.assert_allclose(np.asarray(sums), np.asarray(_dot(x * x, e)),
                             rtol=1e-6)
  scale = jnp.asarray(rng.rand(64, 32).astype(np.float32))
  np.testing.assert_allclose(np.asarray(pdot_t(scale, e)),
                             np.asarray(_dot_t(scale, e)), rtol=1e-6)


def test_fused_segment_bf16x5_tracks_f32_tighter_than_bf16x3(rng):
  """'bf16x5' (exact 3-term split both operands, 5 passes, drop only
  mid*mid) must track the f32 trajectory and land tighter than
  'bf16x3' (BENCH_NOTES UPDATE 29: 1.3e-4 vs 4.0e-4 one-shot codes at
  the bench config on-chip)."""
  d, h, v, batches = _problem(rng, k=4, b=16)
  common = dict(power_iters=2, interpret=True)
  d32 = fused_train_segment_pallas(
      d, h, v, batches, 0.05, 12, 0.05, **common)[0]
  dx5 = fused_train_segment_pallas(
      d, h, v, batches, 0.05, 12, 0.05, mxu="bf16x5", **common)[0]
  dx3 = fused_train_segment_pallas(
      d, h, v, batches, 0.05, 12, 0.05, mxu="bf16x3", **common)[0]
  e5 = np.abs(np.asarray(dx5) - np.asarray(d32)).max()
  e3 = np.abs(np.asarray(dx3) - np.asarray(d32)).max()
  assert e5 < 5e-4, e5
  assert e5 <= e3, (e5, e3)
