"""On-device (XLA) preprocessing pipeline.

The reference preprocesses everything in NumPy/SciPy on the host and
ships finished patches to the device (SURVEY.md section 2.3 #14).  On
TPU the right design streams RAW images to HBM once and runs the whole
patch pipeline on-device with no Python in the loop:

  * center-surround whitening via jnp.fft (same rolled-off-ramp x
    low-pass transfer function as the host oracle),
  * random patch extraction as a vmapped dynamic_slice gather driven by
    jax.random positions,
  * ZCA whitening / centering / variance normalization as jitted matmul
    and reduction epilogues,

all fused into one jitted ``sample_batch(key) -> (b, n)`` program that
can be scanned over for an entire epoch.  Numerics match the NumPy
oracle in vtc_tpu.data.image_processing to float32 tolerance (verified
in tests/test_data_pipeline.py).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from vtc_tpu.ops.precision import matmul_precision


def whitening_filter_dft(shape_hw, cutoff_low=1e-3, cutoff_high=0.9,
                         norm_and_threshold=False):
  """Center-surround whitening transfer function (host-built constant;
  matches image_processing.whiten_center_surround's filter).

  Returned as float32: the filter is zero-phase, and a real dtype also
  sidesteps a backend limitation observed here (host->device transfer of
  complex arrays raises UNIMPLEMENTED on the axon TPU runtime; complex
  arithmetic ON device is fine)."""
  fv = np.fft.fftfreq(shape_hw[0])
  fh = np.fft.fftfreq(shape_hw[1])
  mag = np.sqrt(fv[:, None]**2 + fh[None, :]**2)
  lpf = np.exp(-np.power(mag / (0.5 * cutoff_high), 8.0))
  ramp = np.maximum(mag, cutoff_low)
  combined = ramp * lpf
  if norm_and_threshold:
    combined = combined / np.max(np.abs(combined))
    combined[np.abs(combined) < 1e-3] = 1e-3
  return combined.astype(np.float32)


@functools.partial(jax.jit, static_argnames=())
def filter_images_fd(images_hw, filter_dft):
  """Batched frequency-domain filtering of (k, h, w) grayscale images."""
  spec = jnp.fft.fft2(images_hw) * filter_dft[None]
  return jnp.real(jnp.fft.ifft2(spec)).astype(jnp.float32)


def extract_patches(images_hw, img_ids, ys, xs, patch_hw):
  """Gather patches from a stack of images at given positions.

  Args:
    images_hw: (k, h, w) image stack (device-resident).
    img_ids, ys, xs: (b,) int32 arrays selecting image and top-left
      corner per patch.
    patch_hw: static (ph, pw).

  Returns:
    (b, ph, pw) float32 patches.
  """
  ph, pw = patch_hw

  def one(i, y, x):
    # one 3-d dynamic_slice on the stack: indexing images_hw[i] first
    # would materialize a full (h, w) image PER PATCH under vmap
    # (observed as a 275 GB allocation at batch 512 x 512 batches)
    return jax.lax.dynamic_slice(images_hw, (i, y, x), (1, ph, pw))[0]

  return jax.vmap(one)(img_ids, ys, xs)


class DevicePatchPipeline:
  """End-to-end on-device random-patch sampler.

  Usage:
    pipe = DevicePatchPipeline(raw_images, (16, 16), edge_buffer=5,
                               whiten=True)
    batch = pipe.sample_batch(jax.random.PRNGKey(0), batch_size=1024)
    epoch = pipe.sample_epoch(key, num_batches=64, batch_size=1024)

  The image stack is whitened ONCE on device at construction; each
  sample_batch is a single compiled gather+postprocess program, and
  sample_epoch produces a (k, b, n) stacked array suitable for a
  lax.scan training epoch with zero host involvement.
  """

  def __init__(self, images, patch_hw, edge_buffer=0, whiten=False,
               cutoff_low=1e-3, cutoff_high=0.9, center_patches=False,
               flatten=True):
    images = np.asarray(images, np.float32)
    if images.ndim == 4:  # (k, h, w, 1) -> (k, h, w)
      assert images.shape[3] == 1, "on-device pipeline is grayscale"
      images = images[..., 0]
    self.patch_hw = tuple(patch_hw)
    self.edge_buffer = int(edge_buffer)
    self.center_patches = bool(center_patches)
    self.flatten = bool(flatten)
    stack = jnp.asarray(images)
    if whiten:
      filt = jnp.asarray(whitening_filter_dft(
          images.shape[1:], cutoff_low, cutoff_high))
      stack = filter_images_fd(stack, filt)
    self.images = stack  # (k, h, w) resident in HBM

    k, h, w = self.images.shape
    ph, pw = self.patch_hw
    self._y_range = (self.edge_buffer, h - ph - self.edge_buffer)
    self._x_range = (self.edge_buffer, w - pw - self.edge_buffer)
    self._num_images = k

    @functools.partial(jax.jit, static_argnames=("batch_size",))
    def _sample(images_hw, key, batch_size):
      kid, ky, kx = jax.random.split(key, 3)
      ids = jax.random.randint(kid, (batch_size,), 0, self._num_images)
      ys = jax.random.randint(ky, (batch_size,), *self._y_range)
      xs = jax.random.randint(kx, (batch_size,), *self._x_range)
      patches = extract_patches(images_hw, ids, ys, xs, self.patch_hw)
      if self.center_patches:
        patches = patches - jnp.mean(patches, axis=(1, 2), keepdims=True)
      if self.flatten:
        return patches.reshape(batch_size, -1)
      return patches[:, None, :, :]  # NCHW single channel

    self._sample = _sample

  def sample_batch(self, key, batch_size):
    """One (b, n) or (b, 1, ph, pw) batch of random patches."""
    return self._sample(self.images, key, batch_size)

  def sample_epoch(self, key, num_batches, batch_size):
    """(k, b, ...) stacked batches via one compiled vmapped program."""
    keys = jax.random.split(key, num_batches)
    return jax.vmap(
        lambda k: self._sample(self.images, k, batch_size))(keys)


@jax.jit
def zca_whiten_device(flat_patches, pca_basis, axis_variances,
                      subtracted_mean):
  """Device-side application of a precomputed ZCA transform (same math
  as image_processing.whiten_ZCA's apply path)."""
  with matmul_precision():
    centered = flat_patches - subtracted_mean
    scaled = (centered @ pca_basis) / (
        jnp.sqrt(axis_variances) + 1e-4)[None, :]
    return (scaled @ pca_basis.T) + subtracted_mean


@jax.jit
def estimate_zca_device(flat_patches):
  """Device-side ZCA estimation: returns (pca_basis, axis_variances,
  subtracted_mean) from a patch sample."""
  with matmul_precision():
    comp_means = jnp.mean(flat_patches, axis=0)
    centered = flat_patches - comp_means[None, :]
    covar = centered.T @ centered / flat_patches.shape[0]
    w, u = jnp.linalg.eigh(covar)
    # eigh is ascending; flip to match the SVD (descending) convention
    return u[:, ::-1], w[::-1], jnp.mean(comp_means)
