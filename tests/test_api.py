"""Estimator-style convenience API."""
import numpy as np

from vtc_tpu.api import ICACoder, PCACoder, SparseCoder


def _patches(rng, d=600, n=36):
  basis = rng.randn(6, n)
  w = rng.randn(d, 6) * 2
  data = (w @ basis + 0.2 * rng.randn(d, n)).astype(np.float32)
  return data / data.std()  # unit scale so lambda values are meaningful


def test_sparse_coder_roundtrip(rng):
  data = _patches(rng)
  coder = SparseCoder(num_atoms=48, sparsity_weight=0.05,
                      inference_iters=20)
  coder.fit(data, num_epochs=3, batch_size=100)
  codes = np.asarray(coder.encode(data[:50]))
  recon = np.asarray(coder.decode(codes))
  assert codes.shape == (50, 48) and recon.shape == (50, 36)
  rel_err = (np.linalg.norm(recon - data[:50])
             / np.linalg.norm(data[:50]))
  assert rel_err < 0.2
  l0 = float(np.mean(codes != 0))
  assert l0 < 0.9  # actually sparse


def test_ica_coder(rng):
  data = _patches(rng, n=16)
  coder = ICACoder(stepsize=0.02).fit(data, num_epochs=3,
                                      batch_size=100)
  codes = np.asarray(coder.encode(data[:20]))
  recon = np.asarray(coder.decode(codes))
  np.testing.assert_allclose(recon, data[:20], atol=1e-2, rtol=1e-2)


def test_pca_coder_truncation(rng):
  data = _patches(rng, n=24)
  coder = PCACoder(num_components=6).fit(data)
  codes = coder.encode(data[:30])
  assert codes.shape == (30, 6)
  recon = coder.decode(codes)
  # rank-6 structure + small noise: truncated PCA reconstructs well
  rel_err = np.linalg.norm(recon - data[:30]) / np.linalg.norm(
      data[:30])
  assert rel_err < 0.15
