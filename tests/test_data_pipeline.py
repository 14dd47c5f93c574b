"""Tests for the data pipeline: NumPy oracle invertibility + on-device
pipeline parity with the oracle."""
import numpy as np
import pytest

import jax

from vtc_tpu.data import dataset_generation as dg
from vtc_tpu.data import image_processing as ip
from vtc_tpu.data import jax_pipeline


def _image(rng, h=64, w=64):
  return rng.randn(h, w, 1).astype(np.float32)


def test_center_surround_whitening_roundtrip(rng):
  # norm_and_threshold floors the transfer function at 1e-3 -- exactly
  # so that the inverse filter (1/H) stays bounded and the roundtrip is
  # numerically exact; without the floor the lowpass tail is ~1e-15 and
  # inversion amplifies float noise by 1e15.
  img = _image(rng)
  white, filt = ip.whiten_center_surround(
      img, cutoffs={"low": 1e-3, "high": 0.9}, return_filter=True,
      norm_and_threshold=True)
  back = ip.unwhiten_center_surround(white, orig_filter_DFT=filt)
  np.testing.assert_allclose(back, img, atol=1e-2)


def test_whitening_flattens_spectrum(rng):
  """Whitened 1/f noise should have a flatter amplitude spectrum in the
  passband."""
  img = dg.generate_synthetic_images(1, 128, seed=0)[0]
  white = ip.whiten_center_surround(
      img, cutoffs={"low": 1e-3, "high": 0.8})
  def band_power(im, lo, hi):
    spec = np.abs(np.fft.fft2(im[:, :, 0]))
    f = np.sqrt(np.add.outer(np.fft.fftfreq(128)**2,
                             np.fft.fftfreq(128)**2))
    sel = (f >= lo) & (f < hi)
    return spec[sel].mean()
  ratio_raw = band_power(img, 0.02, 0.06) / band_power(img, 0.2, 0.3)
  ratio_white = band_power(white, 0.02, 0.06) / band_power(
      white, 0.2, 0.3)
  assert ratio_white < ratio_raw / 5.0


def test_zca_roundtrip_and_decorrelation(rng):
  data = rng.randn(2000, 16).astype(np.float32)
  data = data @ rng.randn(16, 16).astype(np.float32)  # correlate it
  # ZCA centers by the scalar mean-of-means (deliberate, to avoid patch
  # blocking artifacts), so the roundtrip is exact only for data whose
  # per-component means are already equal; pre-center to test the linear
  # part exactly.
  data = data - data.mean(axis=0, keepdims=True)
  white, params = ip.whiten_ZCA(data)
  covar = np.cov(white.T)
  off_diag = covar - np.diag(np.diag(covar))
  assert np.abs(off_diag).max() < 0.1 * np.abs(np.diag(covar)).mean()
  back = ip.unwhiten_ZCA(white, params)
  np.testing.assert_allclose(back, data, atol=1e-2, rtol=1e-3)
  # apply path with precomputed params matches estimate path
  white2 = ip.whiten_ZCA(data, precomputed_ZCA_parameters=params)
  np.testing.assert_allclose(white2, white, atol=1e-5)


def test_lcn_and_lls_invertible(rng):
  img = np.abs(_image(rng, 32, 32)) + 0.1
  normed, normalizer = ip.local_contrast_normalization(
      img, 2, return_normalizer=True)
  np.testing.assert_allclose(normed * normalizer, img, atol=1e-5)
  sub, subtractor = ip.local_luminance_subtraction(
      img, 2, return_subtractor=True)
  np.testing.assert_allclose(sub + subtractor, img, atol=1e-5)


def test_centering_and_variance_ops(rng):
  data = (rng.randn(500, 12) * 3 + 2).astype(np.float32)
  centered, means = ip.center_each_component(data)
  np.testing.assert_allclose(centered.mean(0), 0, atol=1e-5)
  np.testing.assert_allclose(centered + means[None], data, atol=1e-5)
  normed, variances = ip.normalize_component_variance(data)
  np.testing.assert_allclose(normed.var(0), 1, atol=1e-4)
  zero_dc, dc = ip.center_each_sample(data)
  np.testing.assert_allclose(zero_dc.mean(1), 0, atol=1e-5)


def test_tiling_roundtrip(rng):
  img = _image(rng, 32, 48)
  patches, positions = ip.patches_from_single_image(img, (8, 8), True)
  assert patches.shape == (24, 64)
  back = ip.assemble_image_from_patches(patches, (8, 8), positions)
  np.testing.assert_array_equal(back, img)


def test_create_patch_training_set_flat(rng):
  out = dg.create_patch_training_set(
      200, (8, 8), edge_buffer=4, dataset="synthetic",
      order_of_preproc_ops=["standardize_data_range",
                            "whiten_center_surround", "patch",
                            "center_each_component",
                            "normalize_component_variance"],
      extra_params={"seed": 0, "num_images": 4, "image_dim": 128})
  patches = out["patches"]
  assert patches.shape == (200, 64) and patches.dtype == np.float32
  assert "original_component_means" in out
  assert "original_component_variances" in out
  np.testing.assert_allclose(patches.mean(0), 0, atol=1e-4)
  np.testing.assert_allclose(patches.var(0), 1, atol=1e-3)


def test_create_patch_training_set_conv_padded(rng):
  pad = ((3, 3), (3, 3))
  out = dg.create_patch_training_set(
      20, (16, 16), edge_buffer=2, dataset="synthetic",
      order_of_preproc_ops=["patch", "pad"],
      extra_params={"seed": 1, "num_images": 2, "image_dim": 64,
                    "padding": pad, "flatten_patches": False})
  assert out["patches"].shape == (20, 1, 22, 22)  # NCHW with padding
  # padding border must be zero
  assert np.all(out["patches"][:, :, :3, :] == 0)
  assert np.all(out["patches"][:, :, :, -3:] == 0)


def test_create_patch_training_set_zca_and_lcn(rng):
  out = dg.create_patch_training_set(
      500, (6, 6), edge_buffer=2, dataset="synthetic",
      order_of_preproc_ops=["standardize_data_range",
                            "local_contrast_normalization", "patch",
                            "whiten_ZCA"],
      extra_params={"seed": 2, "num_images": 3, "image_dim": 96,
                    "lcn_filter_sigma": 2})
  assert "ZCA_parameters" in out
  assert out["local_contrasts"].shape == (500, 36)


def test_batch_iterator_epochs(rng):
  data = np.arange(100)[:, None].astype(np.float32)
  it = dg.BatchIterator(data, batch_size=16, shuffle=True, seed=0)
  epoch1 = np.concatenate([b.ravel() for b in it])
  epoch2 = np.concatenate([b.ravel() for b in it])
  assert len(it) == 6
  assert epoch1.shape == (96,)
  assert not np.array_equal(epoch1, epoch2)  # reshuffled
  assert len(np.unique(epoch1)) == 96  # no repeats within an epoch


def test_device_pipeline_whitening_matches_oracle(rng):
  imgs = dg.generate_synthetic_images(2, 64, seed=3)
  stack = np.stack([im[:, :, 0] for im in imgs])
  filt = jax_pipeline.whitening_filter_dft((64, 64), 1e-3, 0.9)
  got = np.asarray(jax_pipeline.filter_images_fd(
      jax.numpy.asarray(stack), jax.numpy.asarray(filt)))
  want = np.stack([ip.whiten_center_surround(
      im, cutoffs={"low": 1e-3, "high": 0.9},
      norm_and_threshold=False)[:, :, 0] for im in imgs])
  np.testing.assert_allclose(got, want, atol=1e-4)


def test_device_pipeline_sampling(rng):
  imgs = dg.generate_synthetic_images(3, 64, seed=4)
  pipe = jax_pipeline.DevicePatchPipeline(
      np.stack(imgs), (8, 8), edge_buffer=4, whiten=True,
      center_patches=True)
  key = jax.random.PRNGKey(0)
  batch = np.asarray(pipe.sample_batch(key, 32))
  assert batch.shape == (32, 64)
  np.testing.assert_allclose(batch.mean(1), 0, atol=1e-5)
  # deterministic given the key
  batch2 = np.asarray(pipe.sample_batch(key, 32))
  np.testing.assert_array_equal(batch, batch2)
  epoch = np.asarray(pipe.sample_epoch(key, 4, 32))
  assert epoch.shape == (4, 32, 64)
  # patches must actually come from the whitened image stack
  white = np.asarray(pipe.images)
  found = 0
  for row in range(8):
    window = batch[0].reshape(8, 8)[row]
    if any(np.abs(white[i] - window[0]).min() < 1e-6 for i in range(3)):
      found += 1
  assert found > 0


def test_device_zca_matches_oracle(rng):
  data = rng.randn(3000, 16).astype(np.float32)
  data = data @ rng.randn(16, 16).astype(np.float32)
  # pre-center: the estimate path whitens per-component-centered data
  # while the apply path subtracts the scalar mean-of-means (reference
  # semantics), so they only coincide on pre-centered data
  data = data - data.mean(axis=0, keepdims=True)
  want_white, params = ip.whiten_ZCA(data)
  basis, variances, mean = jax_pipeline.estimate_zca_device(
      jax.numpy.asarray(data))
  got_white = np.asarray(jax_pipeline.zca_whiten_device(
      jax.numpy.asarray(data), basis, variances, mean))
  # bases may differ by sign/rotation in degenerate eigenspaces, but the
  # ZCA transform itself is unique: compare whitened outputs
  np.testing.assert_allclose(got_white, want_white, atol=5e-2,
                             rtol=1e-3)
