"""The batched/streamed/compiled dataset-encoding path must reproduce
the one-shot solver exactly (it is the same solver, scanned), across
tail padding, chunk boundaries, all three model families, and DP."""
import numpy as np
import pytest

from vtc_tpu import parallel
from vtc_tpu.encode import encode_dataset


@pytest.mark.quick
def test_fc_encode_matches_one_shot(rng):
  from vtc_tpu.analysis_transforms.fully_connected import ista_fista

  d = rng.randn(32, 24).astype(np.float32)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  data = rng.randn(53, 24).astype(np.float32)  # 53 = 4*13+1: ragged tail
  want = np.asarray(ista_fista.run(data, d, 0.05, 20))
  got = encode_dataset(data, d, 0.05, 20, batch_size=13,
                       chunk_batches=2)
  np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.quick
def test_subspace_encode_matches_one_shot(rng):
  from vtc_tpu.analysis_transforms.fully_connected import (
      subspace_ista_fista)

  groups = [[0, 1, 2], [3, 4, 5], [6, 7], [8, 9, 10, 11]]
  d = rng.randn(12, 16).astype(np.float32)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  data = rng.randn(40, 16).astype(np.float32)
  want = np.asarray(subspace_ista_fista.run(data, d, groups, 0.05, 15))
  got = encode_dataset(data, d, 0.05, 15, batch_size=16,
                       chunk_batches=2, group_assignments=groups)
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv_encode_matches_one_shot(rng):
  from vtc_tpu.analysis_transforms.convolutional import ista_fista

  stride, pad = (2, 2), ((2, 2), (2, 2))
  imgs = np.zeros((11, 1, 12, 12), np.float32)
  imgs[:, :, 2:-2, 2:-2] = rng.randn(11, 1, 8, 8)
  d = rng.randn(6, 1, 4, 4).astype(np.float32)
  d /= np.sqrt((d ** 2).sum(axis=(1, 2, 3), keepdims=True))
  want = np.asarray(ista_fista.run(imgs, d, stride, pad, 0.02, 10))
  got = encode_dataset(imgs, d, 0.02, 10, mode="convolutional",
                       batch_size=4, chunk_batches=2,
                       kernel_stride=stride, padding=pad)
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_dp_encode_matches_single_device(rng):
  d = rng.randn(32, 24).astype(np.float32)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  data = rng.randn(70, 24).astype(np.float32)
  single = encode_dataset(data, d, 0.05, 20, batch_size=16,
                          chunk_batches=2)
  dp = encode_dataset(data, d, 0.05, 20, batch_size=16,
                      chunk_batches=2,
                      data_parallel=parallel.make_mesh(data=8))
  np.testing.assert_allclose(dp, single, atol=1e-5)


def test_dp_encode_pallas_formulation(rng):
  """The pallas kernels run per-shard inside shard_map (interpret mode
  off-TPU) and match the gram path."""
  d = rng.randn(16, 16).astype(np.float32)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  data = rng.randn(32, 16).astype(np.float32)
  want = encode_dataset(data, d, 0.05, 12, batch_size=16,
                        formulation="gram")
  got = encode_dataset(data, d, 0.05, 12, batch_size=16,
                       formulation="pallas",
                       data_parallel=parallel.make_mesh(data=8))
  np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.quick
def test_api_encode_batched_matches_direct(rng):
  from vtc_tpu.api import SparseCoder

  coder = SparseCoder(num_atoms=24, sparsity_weight=0.05,
                      inference_iters=15)
  patches = (0.5 * rng.randn(120, 16)).astype(np.float32)
  coder.fit(patches, num_epochs=1, batch_size=40)
  direct = np.asarray(coder.encode(patches))
  batched = coder.encode(patches, batch_size=32)
  np.testing.assert_allclose(batched, direct, atol=1e-5)


@pytest.mark.quick
def test_encode_precision_tiers(rng):
  """mxu_precision is honored by the fc pallas path: bf16x3 stays near
  the parity result (~1e-5 grade); 'default' (single bf16 pass) differs
  measurably but stays a valid solve (finite, sparse pattern close)."""
  d = rng.randn(16, 16).astype(np.float32)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  data = rng.randn(32, 16).astype(np.float32)
  base = encode_dataset(data, d, 0.05, 15, batch_size=16,
                        formulation="pallas")
  x3 = encode_dataset(data, d, 0.05, 15, batch_size=16,
                      formulation="pallas", mxu_precision="bf16x3")
  bf = encode_dataset(data, d, 0.05, 15, batch_size=16,
                      formulation="pallas", mxu_precision="default")
  np.testing.assert_allclose(x3, base, atol=5e-4)
  # 'default' is exact on the CPU interpreter (DEFAULT-precision f32
  # matmuls are full f32 off-TPU); the real bf16 divergence shows only
  # on the MXU, so here we check the tier threads through and solves
  assert np.isfinite(bf).all()
  assert np.abs(bf - base).max() < 0.5 * (np.abs(base).max() + 1.0)


@pytest.mark.quick
def test_subspace_encode_precision_tiers(rng):
  """mxu_precision threads through the subspace pallas path: bf16x3
  stays near parity; 'default' solves (exact on the CPU interpreter)."""
  groups = [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11], [12, 13, 14, 15]]
  d = rng.randn(16, 16).astype(np.float32)
  d /= np.linalg.norm(d, axis=1, keepdims=True)
  data = rng.randn(32, 16).astype(np.float32)
  base = encode_dataset(data, d, 0.05, 12, batch_size=16,
                        group_assignments=groups, formulation="pallas")
  x3 = encode_dataset(data, d, 0.05, 12, batch_size=16,
                      group_assignments=groups, formulation="pallas",
                      mxu_precision="bf16x3")
  bf = encode_dataset(data, d, 0.05, 12, batch_size=16,
                      group_assignments=groups, formulation="pallas",
                      mxu_precision="bf16")
  np.testing.assert_allclose(x3, base, atol=5e-4)
  assert np.isfinite(bf).all()


@pytest.mark.quick
def test_conv_encode_precision_tiers(rng):
  """mxu_precision threads through the conv pallas path: bf16x3 stays
  near parity; 'bf16' solves finite."""
  stride, pad = (2, 2), ((2, 2), (2, 2))
  imgs = np.zeros((8, 1, 12, 12), np.float32)
  imgs[:, :, 2:-2, 2:-2] = rng.randn(8, 1, 8, 8)
  d = rng.randn(6, 1, 4, 4).astype(np.float32)
  d /= np.sqrt((d ** 2).sum(axis=(1, 2, 3), keepdims=True))
  kw = dict(mode="convolutional", batch_size=4, kernel_stride=stride,
            padding=pad, formulation="pallas")
  base = encode_dataset(imgs, d, 0.02, 10, **kw)
  x3 = encode_dataset(imgs, d, 0.02, 10, mxu_precision="bf16x3", **kw)
  bf = encode_dataset(imgs, d, 0.02, 10, mxu_precision="bf16", **kw)
  np.testing.assert_allclose(x3, base, rtol=1e-3, atol=1e-3)
  assert np.isfinite(bf).all()


@pytest.mark.quick
def test_conv_default_formulation_geometry_routing(rng, monkeypatch):
  """formulation=None routes conv to 'gram' when the direct kernel
  cannot take the geometry (here s > 512 blows the MXU-sized weight
  gate; kernel % stride != 0 is now HANDLED by zero extension and no
  longer falls back), even on TPU."""
  import jax
  from vtc_tpu import encode as encode_mod
  from vtc_tpu.ops import pallas_conv_direct

  monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
  seen = {}
  orig = encode_mod._chunk_encoder

  def spy(kind, run_fn, variant, nonneg, hard, formulation, *a, **k):
    seen["formulation"] = formulation
    return orig(kind, run_fn, variant, nonneg, hard, formulation,
                *a, **k)

  monkeypatch.setattr(encode_mod, "_chunk_encoder", spy)
  imgs = np.zeros((4, 1, 13, 13), np.float32)
  imgs[:, :, 2:-2, 2:-2] = rng.randn(4, 1, 9, 9)
  d = rng.randn(520, 1, 4, 4).astype(np.float32)
  d /= np.sqrt((d ** 2).sum(axis=(1, 2, 3), keepdims=True))
  assert not pallas_conv_direct.supported(
      (4, 1, 13, 13), (520, 1, 4, 4), (3, 3))
  encode_mod.encode_dataset(imgs, d, 0.02, 3, mode="convolutional",
                            batch_size=4, kernel_stride=(3, 3),
                            padding=((2, 2), (2, 2)))
  assert seen["formulation"] == "gram"
