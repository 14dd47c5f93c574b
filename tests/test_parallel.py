"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The key invariant: the data-parallel fused step produces the SAME
dictionary/Hessian update as the single-device fused step on the
identical global batch (psum of per-shard statistics == full-batch
statistics), to float tolerance.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtc_tpu import parallel
from vtc_tpu.training import sparse_coding as sc


def _fc_problem(rng, b=32, s=24, n=16):
  d = rng.randn(s, n).astype(np.float32)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  batch = rng.randn(b, n).astype(np.float32)
  return d, batch


def test_mesh_shapes():
  mesh = parallel.make_mesh(data=4, code=2)
  assert mesh.shape["data"] == 4 and mesh.shape["code"] == 2
  mesh = parallel.make_mesh()
  assert mesh.shape["data"] == 8 and mesh.shape["code"] == 1


@pytest.mark.parametrize("update_alg", [
    "sc_steepest_descent", "sc_cheap_quadratic_descent"])
def test_shard_map_dp_matches_single_device_fc(rng, update_alg):
  d0, batch = _fc_problem(rng)
  hess0 = np.abs(rng.rand(24)).astype(np.float32) * 0.01
  mesh = parallel.make_mesh(data=8)

  single = sc.build_train_step("fully-connected", "fista", update_alg)
  d1, h1, c1 = single(jnp.asarray(d0), jnp.asarray(hess0),
                      jnp.asarray(batch), jnp.float32(0.05),
                      jnp.int32(10), jnp.float32(0.1), 1,
                      jnp.float32(0.0))

  sharded = parallel.build_shard_map_train_step(
      mesh, "fully-connected", "fista", update_alg)
  d2, h2, c2 = sharded(jnp.asarray(d0), jnp.asarray(hess0),
                       jnp.asarray(batch), jnp.float32(0.05),
                       jnp.int32(10), jnp.float32(0.1))

  np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), atol=1e-5)
  np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=1e-6)
  np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), atol=1e-5)


@pytest.mark.parametrize("update_alg", [
    "sc_steepest_descent", "sc_cheap_quadratic_descent"])
def test_dp_fused_segment_matches_single_chip_fused(rng, update_alg):
  """The fused-DP composition (per-shard solve+stats Pallas kernel +
  one psum of gram-form stats + replicated update, warm Lipschitz
  eigenvector riding the scan) must reproduce the single-chip
  whole-segment fused kernel over a multi-step segment."""
  from vtc_tpu.ops import lipschitz as lip
  from vtc_tpu.ops.pallas_train_step import fused_train_segment_pallas
  from vtc_tpu.parallel.data_parallel import build_dp_fused_local_step
  from vtc_tpu.training.compiled_epoch import _dp_fused_segment_runner

  k, b, s, n = 3, 32, 24, 16
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  hess0 = np.abs(rng.rand(s)).astype(np.float32) * 0.01
  batches = rng.randn(k, b, n).astype(np.float32)
  _, v0 = lip.top_gram_eigenpair(jnp.asarray(d0))

  want = fused_train_segment_pallas(
      jnp.asarray(d0), jnp.asarray(hess0), v0, jnp.asarray(batches),
      jnp.float32(0.05), jnp.int32(10), jnp.float32(0.1),
      update_alg=update_alg, upd_num_iters=2, power_iters=2,
      interpret=True)

  mesh = parallel.make_mesh(data=8)
  runner = _dp_fused_segment_runner(
      build_dp_fused_local_step(8, "fista", update_alg,
                                upd_num_iters=2, power_iters=2), mesh)
  got = runner(jnp.asarray(d0), jnp.asarray(hess0), v0,
               jnp.asarray(batches), jnp.float32(0.05), jnp.int32(10),
               jnp.float32(0.1))
  for w, g, name in zip(want, got, ["dict", "hessian", "eigvec"]):
    np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-5,
                               err_msg=name)


def test_dp_fused_scanned_trainer_auto_select(rng, tmp_path):
  """train_dictionary_scanned with data_parallel + the pallas
  formulation auto-selects the fused-DP segment runner (warm tracking
  preserved across the mesh) and matches the single-device scanned
  trainer on the same data."""
  from vtc_tpu.training import compiled_epoch

  k, b, s, n = 4, 16, 12, 16
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  batches = rng.randn(k, b, n).astype(np.float32) * 0.5
  params = {
      "mode": "fully-connected",
      "num_epochs": 2,
      "code_inference_algorithm": "fista",
      "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 8}},
      "dict_update_param_schedule": {
          0: {"stepsize": 0.05, "num_iters": 1}},
      "fc_formulation": "pallas",  # forces the fused-DP path on CPU
  }
  single = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(), dict(params)))
  dp = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(),
      dict(params, data_parallel=parallel.make_mesh(data=8))))
  np.testing.assert_allclose(dp, single, atol=2e-5)


def test_shard_map_dp_matches_single_device_subspace(rng):
  d0, batch = _fc_problem(rng, b=16, s=16, n=16)
  groups = [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11], [12, 13, 14, 15]]
  hess0 = np.zeros(16, np.float32)
  mesh = parallel.make_mesh(data=4)

  kw = dict(group_assignments=groups, alignment_penalty=0.2)
  single = sc.build_train_step(
      "fully-connected", "subspace_fista",
      "subspace_sc_cheap_quadratic_descent", **kw)
  d1, h1, _ = single(jnp.asarray(d0), jnp.asarray(hess0),
                     jnp.asarray(batch), jnp.float32(0.05), jnp.int32(8),
                     jnp.float32(0.1), 1, jnp.float32(0.0))
  sharded = parallel.build_shard_map_train_step(
      mesh, "fully-connected", "subspace_fista",
      "subspace_sc_cheap_quadratic_descent", **kw)
  d2, h2, _ = sharded(jnp.asarray(d0), jnp.asarray(hess0),
                      jnp.asarray(batch), jnp.float32(0.05),
                      jnp.int32(8), jnp.float32(0.1))
  np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=1e-6)
  np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), atol=1e-5)


@pytest.mark.parametrize("update_alg,penalty", [
    ("subspace_sc_steepest_descent", 0.0),
    ("subspace_sc_cheap_quadratic_descent", 0.0),
    ("subspace_sc_cheap_quadratic_descent", 0.2)])
def test_dp_group_fused_segment_matches_single_chip(rng, update_alg,
                                                    penalty):
  """The subspace fused-DP composition (per-shard group solve+stats
  Pallas kernel + one psum of gram-form stats + replicated subspace
  update) must reproduce the single-chip whole-segment group kernel
  over a multi-step segment, including the anti-alignment penalty
  (computed replicated in the epilogue vs in-kernel single-chip)."""
  from vtc_tpu.analysis_transforms.fully_connected import (
      subspace_ista_fista)
  from vtc_tpu.ops import lipschitz as lip
  from vtc_tpu.ops.pallas_train_step import (
      fused_group_train_segment_pallas)
  from vtc_tpu.parallel.data_parallel import (
      build_dp_group_fused_local_step)
  from vtc_tpu.training.compiled_epoch import _dp_fused_segment_runner

  k, b, s, n = 3, 32, 16, 16
  groups = tuple(tuple(range(i, i + 4)) for i in range(0, s, 4))
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  hess0 = np.abs(rng.rand(s)).astype(np.float32) * 0.01
  batches = rng.randn(k, b, n).astype(np.float32)
  gi, vm = subspace_ista_fista.pack_group_indices(groups, s)
  grouped0 = subspace_ista_fista.build_grouped_dictionary(
      jnp.asarray(d0), gi, vm)
  _, v0 = lip.top_gram_eigenpair(grouped0)

  want = fused_group_train_segment_pallas(
      jnp.asarray(d0), jnp.asarray(hess0), v0, jnp.asarray(batches),
      jnp.float32(0.05), jnp.int32(10), jnp.float32(0.1),
      group_assignments=groups, update_alg=update_alg,
      upd_num_iters=2, power_iters=2, alignment_penalty=penalty,
      interpret=True)

  mesh = parallel.make_mesh(data=8)
  runner = _dp_fused_segment_runner(
      build_dp_group_fused_local_step(
          8, "subspace_fista", update_alg, group_assignments=groups,
          alignment_penalty=penalty, upd_num_iters=2, power_iters=2),
      mesh)
  got = runner(jnp.asarray(d0), jnp.asarray(hess0), v0,
               jnp.asarray(batches), jnp.float32(0.05), jnp.int32(10),
               jnp.float32(0.1))
  for w, g, name in zip(want, got, ["dict", "hessian", "eigvec"]):
    np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-5,
                               err_msg=name)


def test_dp_group_fused_scanned_trainer_auto_select(rng):
  """train_dictionary_scanned with data_parallel + groups + the pallas
  formulation auto-selects the group fused-DP runner and matches the
  single-device scanned trainer on the same data."""
  from vtc_tpu.training import compiled_epoch

  k, b, s, n = 4, 16, 16, 16
  groups = [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11],
            [12, 13, 14, 15]]
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  batches = rng.randn(k, b, n).astype(np.float32) * 0.5
  params = {
      "mode": "fully-connected",
      "num_epochs": 2,
      "code_inference_algorithm": "subspace_fista",
      "dictionary_update_algorithm":
          "subspace_sc_cheap_quadratic_descent",
      "group_assignments": groups,
      "subspace_alignment_penalty": 0.1,
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 8}},
      "dict_update_param_schedule": {
          0: {"stepsize": 0.05, "num_iters": 1}},
      "fc_formulation": "pallas",  # forces the fused-DP path on CPU
  }
  single = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(), dict(params)))
  dp = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(),
      dict(params, data_parallel=parallel.make_mesh(data=8))))
  np.testing.assert_allclose(dp, single, atol=2e-5)


def test_shard_map_dp_matches_single_device_conv(rng):
  k, stride, img = 4, (2, 2), 8
  pad = ((2, 2), (2, 2))
  h = img + 4
  batch = np.zeros((8, 1, h, h), np.float32)
  batch[:, :, 2:-2, 2:-2] = rng.randn(8, 1, img, img)
  d0 = rng.randn(6, 1, k, k).astype(np.float32)
  d0 /= np.sqrt((d0**2).sum(axis=(1, 2, 3), keepdims=True))
  hess0 = np.zeros(6, np.float32)
  mesh = parallel.make_mesh(data=8)

  kw = dict(kernel_stride=stride, padding=pad)
  single = sc.build_train_step(
      "convolutional", "ista", "sc_cheap_quadratic_descent", **kw)
  d1, h1, _ = single(jnp.asarray(d0), jnp.asarray(hess0),
                     jnp.asarray(batch), jnp.float32(0.02), jnp.int32(5),
                     jnp.float32(0.05), 1, jnp.float32(0.0))
  sharded = parallel.build_shard_map_train_step(
      mesh, "convolutional", "ista", "sc_cheap_quadratic_descent", **kw)
  d2, h2, _ = sharded(jnp.asarray(d0), jnp.asarray(hess0),
                      jnp.asarray(batch), jnp.float32(0.02),
                      jnp.int32(5), jnp.float32(0.05))
  np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), atol=1e-6)
  np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), atol=1e-5)


@pytest.mark.parametrize("shard_code", [False, True])
def test_pjit_dp_tp_step(rng, shard_code):
  """GSPMD path: DP over 'data', optional dictionary-row sharding over
  'code'; result must match the single-device step."""
  d0, batch = _fc_problem(rng, b=16, s=32, n=16)
  hess0 = np.zeros(32, np.float32)
  mesh = parallel.make_mesh(data=4, code=2)

  single = sc.build_train_step(
      "fully-connected", "fista", "sc_cheap_quadratic_descent")
  d1, h1, c1 = single(jnp.asarray(d0), jnp.asarray(hess0),
                      jnp.asarray(batch), jnp.float32(0.05),
                      jnp.int32(10), jnp.float32(0.1), 1,
                      jnp.float32(0.0))
  sharded = parallel.build_pjit_train_step(
      mesh, "fully-connected", "fista", "sc_cheap_quadratic_descent",
      shard_code_axis=shard_code)
  d2, h2, c2 = sharded(jnp.asarray(d0), jnp.asarray(hess0),
                       jnp.asarray(batch), jnp.float32(0.05),
                       jnp.int32(10), jnp.float32(0.1))
  np.testing.assert_allclose(np.asarray(c2), c1, atol=1e-4)
  np.testing.assert_allclose(np.asarray(d2), d1, atol=1e-4)
  np.testing.assert_allclose(np.asarray(h2), h1, atol=1e-5)


def test_graft_entry_dryrun():
  """The driver's multi-chip dry run must work with 8 virtual devices."""
  import importlib.util
  spec = importlib.util.spec_from_file_location(
      "__graft_entry__", "/root/repo/__graft_entry__.py")
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  fn, args = mod.entry()
  out = jax.jit(fn)(*args)
  assert np.isfinite(np.asarray(out)).all()
  mod.dryrun_multichip(8)
  mod.dryrun_multichip(4)


def test_multislice_dcn_mesh_matches_single_device(rng):
  """A (dcn, data) hierarchical mesh: gradient/statistics psums span
  both axes (ICI within a slice + DCN across slices), producing the
  same update as the single-device step on the global batch."""
  d0, batch = _fc_problem(rng)
  hess0 = np.abs(rng.rand(24)).astype(np.float32) * 0.01
  mesh = parallel.make_mesh(dcn=2, data=4)
  assert mesh.axis_names == ("dcn", "data", "code")
  assert parallel.dp_axes(mesh) == ("dcn", "data")

  single = sc.build_train_step("fully-connected", "fista",
                               "sc_cheap_quadratic_descent")
  d1, h1, c1 = single(jnp.asarray(d0), jnp.asarray(hess0),
                      jnp.asarray(batch), jnp.float32(0.05),
                      jnp.int32(10), jnp.float32(0.1), 1,
                      jnp.float32(0.0))

  sharded = parallel.build_shard_map_train_step(
      mesh, "fully-connected", "fista", "sc_cheap_quadratic_descent")
  d2, h2, c2 = sharded(jnp.asarray(d0), jnp.asarray(hess0),
                       jnp.asarray(batch), jnp.float32(0.05),
                       jnp.int32(10), jnp.float32(0.1))
  np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), atol=1e-5)
  np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), atol=1e-5)


def test_multislice_scanned_trainer(rng):
  from vtc_tpu.training import compiled_epoch

  data = rng.randn(4, 16, 24).astype(np.float32)
  d0 = rng.randn(24, 24).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  base = {
      "mode": "fully-connected", "num_epochs": 2,
      "code_inference_algorithm": "fista",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 8}},
      "dictionary_update_algorithm": "sc_steepest_descent",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.05, "num_iters": 1}},
      "fc_formulation": "gram", "lipschitz_method": "eigvalsh",
  }
  single = np.asarray(compiled_epoch.train_dictionary_scanned(
      data, data[:1], d0, base))
  dp = np.asarray(compiled_epoch.train_dictionary_scanned(
      data, data[:1], d0,
      dict(base, data_parallel=parallel.make_mesh(dcn=2, data=4))))
  np.testing.assert_allclose(dp, single, atol=2e-5)


def test_dp_conv_fused_segment_matches_single_chip_fused(rng):
  """The CONV fused-DP composition (per-shard solve+stats kernel in
  stride-block space + one psum of (grad_sum, stat) + replicated
  update, warm eigenvector riding the scan) must reproduce the
  single-chip whole-segment conv kernel over a multi-step segment
  (upd_num_iters == 1 semantics on both sides)."""
  from vtc_tpu.ops import conv_shapes
  from vtc_tpu.ops import lipschitz as lip
  from vtc_tpu.ops.pallas_conv_train import (
      fused_conv_train_segment_pallas)
  from vtc_tpu.parallel.data_parallel import (
      build_dp_conv_fused_local_step)
  from vtc_tpu.training.compiled_epoch import _dp_fused_segment_runner

  k, b, s, c, kdim, stride, img = 2, 8, 8, 1, 4, 2, 12
  pad = conv_shapes.get_padding_amt(img, kdim, stride)
  padding = (pad, pad)
  height = img + pad[0] + pad[1]
  d0 = rng.randn(s, c, kdim, kdim).astype(np.float32)
  d0 /= np.sqrt((d0 ** 2).sum(axis=(1, 2, 3), keepdims=True))
  x = np.zeros((k, b, c, height, height), np.float32)
  x[:, :, :, pad[0]:height - pad[1], pad[0]:height - pad[1]] = (
      0.3 * rng.randn(k, b, c, img, img))
  hess0 = np.abs(rng.rand(s)).astype(np.float32) * 0.01
  _, v0 = lip.top_gram_eigenpair(jnp.asarray(d0).reshape(s, -1))

  want = fused_conv_train_segment_pallas(
      jnp.asarray(d0), jnp.asarray(hess0), v0, jnp.asarray(x),
      jnp.float32(0.05), jnp.int32(10), jnp.float32(0.1),
      kernel_stride=(stride, stride), padding=padding,
      upd_num_iters=1, power_iters=2, interpret=True)

  mesh = parallel.make_mesh(data=8)
  runner = _dp_fused_segment_runner(
      build_dp_conv_fused_local_step(
          8, "fista", "sc_cheap_quadratic_descent",
          kernel_stride=(stride, stride), padding=padding,
          power_iters=2),
      mesh, conv_mode=True)
  got = runner(jnp.asarray(d0), jnp.asarray(hess0), v0,
               jnp.asarray(x), jnp.float32(0.05), jnp.int32(10),
               jnp.float32(0.1))
  for w, g, name in zip(want, got, ["dict", "hessian", "eigvec"]):
    w = np.asarray(w)
    np.testing.assert_allclose(
        np.asarray(g), w, rtol=2e-5,
        atol=2e-5 * max(1.0, float(np.abs(w).max())), err_msg=name)


def test_dp_conv_fused_multi_update_matches_single_chip(rng):
  """Conv fused-DP with upd_num_iters > 1: shards psum the gram-form
  (C_m, B_x) stats and run exact multi-iteration replicated updates --
  must match the single-chip whole-segment conv kernel (which uses the
  same gram-form accumulators when batch-tiled)."""
  from vtc_tpu.ops import conv_shapes
  from vtc_tpu.ops import lipschitz as lip
  from vtc_tpu.ops.pallas_conv_train import (
      fused_conv_train_segment_pallas)
  from vtc_tpu.parallel.data_parallel import (
      build_dp_conv_fused_local_step)
  from vtc_tpu.training.compiled_epoch import _dp_fused_segment_runner

  k, b, s, c, kdim, stride, img = 2, 8, 8, 1, 4, 2, 12
  pad = conv_shapes.get_padding_amt(img, kdim, stride)
  padding = (pad, pad)
  assert all(p % stride == 0 for p in pad)
  height = img + pad[0] + pad[1]
  d0 = rng.randn(s, c, kdim, kdim).astype(np.float32)
  d0 /= np.sqrt((d0 ** 2).sum(axis=(1, 2, 3), keepdims=True))
  x = np.zeros((k, b, c, height, height), np.float32)
  x[:, :, :, pad[0]:height - pad[1], pad[0]:height - pad[1]] = (
      0.3 * rng.randn(k, b, c, img, img))
  hess0 = np.abs(rng.rand(s)).astype(np.float32) * 0.01
  _, v0 = lip.top_gram_eigenpair(jnp.asarray(d0).reshape(s, -1))

  want = fused_conv_train_segment_pallas(
      jnp.asarray(d0), jnp.asarray(hess0), v0, jnp.asarray(x),
      jnp.float32(0.05), jnp.int32(10), jnp.float32(0.1),
      kernel_stride=(stride, stride), padding=padding,
      upd_num_iters=3, power_iters=2, interpret=True)

  mesh = parallel.make_mesh(data=8)
  runner = _dp_fused_segment_runner(
      build_dp_conv_fused_local_step(
          8, "fista", "sc_cheap_quadratic_descent",
          kernel_stride=(stride, stride), padding=padding,
          upd_num_iters=3, power_iters=2),
      mesh, conv_mode=True)
  got = runner(jnp.asarray(d0), jnp.asarray(hess0), v0,
               jnp.asarray(x), jnp.float32(0.05), jnp.int32(10),
               jnp.float32(0.1))
  for w, g, name in zip(want, got, ["dict", "hessian", "eigvec"]):
    w = np.asarray(w)
    np.testing.assert_allclose(
        np.asarray(g), w, rtol=2e-5,
        atol=2e-5 * max(1.0, float(np.abs(w).max())), err_msg=name)


def test_dp_ica_scanned_matches_single_device(rng):
  """ICA DP: per-shard codes + one psum of the natural-gradient
  statistic per step == single-device scanned trainer, for both the
  warm-inverse and per-shard-LU paths."""
  from vtc_tpu.training import ica as ica_trainer

  n = 16
  batches = (0.5 * rng.randn(6, 32, n)).astype(np.float32)
  d0 = np.linalg.qr(rng.randn(n, n))[0].astype(np.float32)
  params = {
      "num_epochs": 2,
      "dictionary_update_algorithm": "ica_natural_gradient",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.02, "num_iters": 1},
          4: {"stepsize": 0.01, "num_iters": 2}},
  }
  for warm in (True, False):
    single = np.asarray(ica_trainer.train_dictionary_scanned(
        batches, d0, dict(params, warm_inverse=warm)))
    dp = np.asarray(ica_trainer.train_dictionary_scanned(
        batches, d0, dict(params, warm_inverse=warm,
                          data_parallel=parallel.make_mesh(data=8))))
    np.testing.assert_allclose(dp, single, atol=2e-5,
                               err_msg=f"warm_inverse={warm}")
  # the train_precision tier flag composes with DP (exact on the CPU
  # backend, where every tier executes in f32)
  single = np.asarray(ica_trainer.train_dictionary_scanned(
      batches, d0, dict(params, train_precision="bf16x3")))
  dp = np.asarray(ica_trainer.train_dictionary_scanned(
      batches, d0, dict(params, train_precision="bf16x3",
                        data_parallel=parallel.make_mesh(data=8))))
  np.testing.assert_allclose(dp, single, atol=2e-5)


def test_dp_pca_matches_single_device(rng):
  """PCA DP: psum'd per-shard covariance + replicated SVD == the
  single-device covariance branch."""
  from vtc_tpu.training import pca as pca_trainer

  data = rng.randn(320, 24).astype(np.float32)
  data -= data.mean(axis=0)
  single = np.asarray(pca_trainer.train_dictionary(data))
  dp = np.asarray(pca_trainer.train_dictionary(
      data, data_parallel=parallel.make_mesh(data=8)))
  # principal directions match up to per-axis sign
  overlap = np.abs(np.sum(single * dp, axis=1))
  np.testing.assert_allclose(overlap, 1.0, atol=1e-3)


def test_dp_fused_bf16_training_mode(rng):
  """train_precision='bf16' composes with data_parallel: the per-shard
  solve runs bf16, the psum'd gram-form stats stay f32, and the
  trajectory stays within update-scale distance of the f32 fused-DP
  run (fc family; the group/conv builders take the same flag)."""
  from vtc_tpu.training import compiled_epoch

  k, b, s, n = 4, 16, 16, 16
  basis = rng.randn(6, n)
  w = rng.randn(k * b, 6) * 2.0
  batches = (w @ basis + 0.2 * rng.randn(k * b, n)).astype(
      np.float32).reshape(k, b, n)
  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  params = {
      "mode": "fully-connected", "num_epochs": 2,
      "code_inference_algorithm": "fista",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 8}},
      "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.01, "num_iters": 1}},
      "fc_formulation": "pallas",
      "data_parallel": parallel.make_mesh(data=8),
  }
  d32 = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(), dict(params)))
  dbf = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(),
      dict(params, train_precision="bf16")))
  assert np.isfinite(dbf).all()
  np.testing.assert_allclose(np.linalg.norm(dbf, axis=1), 1.0,
                             atol=1e-5)
  assert np.abs(dbf - d32).max() < 0.1
  assert np.abs(dbf - d32).max() > 0  # the flag actually changed math
