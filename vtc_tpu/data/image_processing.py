"""Host-side (NumPy/SciPy) image preprocessing toolkit.

Semantics parity with reference utils/image_processing.py:18-699 --
spatial/DFT filtering, downsampling, binomial/gaussian kernels,
exponential low-pass and whitening-ramp DFT filters, center-surround
whitening (with low-frequency pass-through cutoff) and its exact inverse,
ZCA whitening with mean-of-means centering, local contrast normalization
and local luminance subtraction (both invertible), per-component /
per-sample centering and variance normalization, and deterministic image
tiling/assembly.

Images are (h, w, c) float32; flat datasets are (D, n).
"""
import numpy as np
from scipy.ndimage import convolve1d
from scipy.signal import convolve, convolve2d


# ---------------------------------------------------------------------------
# filtering primitives
# ---------------------------------------------------------------------------
def filter_sd(image, filter_spatial, separable_vert=None,
              separable_horz=None):
  """Spatial-domain filtering per color channel; a separable fast path
  does two 1-d passes (reference image_processing.py:18-60)."""
  image = np.asarray(image)
  out = np.zeros(image.shape, dtype="float32")
  for ch in range(image.shape[2]):
    if separable_vert is None:
      out[:, :, ch] = convolve2d(image[:, :, ch], filter_spatial, "same",
                                 boundary="symm")
    else:
      tmp = np.empty_like(out[:, :, ch])
      for row in range(image.shape[0]):
        tmp[row] = convolve1d(image[row, :, ch], separable_horz,
                              mode="reflect")
      for col in range(image.shape[1]):
        out[:, col, ch] = convolve1d(tmp[:, col], separable_vert,
                                     mode="reflect")
  return out


def filter_fd(image, filter_DFT):
  """Frequency-domain filtering per channel.  The filter DFT must have at
  least as many samples as the image in each dimension."""
  image = np.asarray(image)
  assert filter_DFT.shape[0] >= image.shape[0]
  assert filter_DFT.shape[1] >= image.shape[1]
  out = np.zeros(image.shape, dtype="float32")
  for ch in range(image.shape[2]):
    spec = filter_DFT * np.fft.fft2(image[:, :, ch], filter_DFT.shape)
    out[:, :, ch] = np.real(
        np.fft.ifft2(spec, filter_DFT.shape)
    ).astype("float32")[:image.shape[0], :image.shape[1]]
  return out


def downsample(image, factor=2):
  """Take every Nth sample in both spatial dimensions."""
  assert isinstance(factor, int)
  return image[::factor, ::factor]


def get_binomial_filter_1d(size):
  """1-d binomial (Pascal's triangle / 2^k) smoothing kernel."""
  assert size > 1
  kernel = np.array([0.5, 0.5])
  for _ in range(size - 2):
    kernel = convolve(np.array([0.5, 0.5]), kernel)
  return kernel


def get_binomial_filter_2d(height, width):
  return (get_binomial_filter_1d(height)[:, None] *
          get_binomial_filter_1d(width)[None, :])


def get_gaussian_filter_2d(sigma, window_size, normalized=True):
  """Isotropic 2-d gaussian on an odd-preferring window grid."""
  lower = [-int(np.floor(window_size[i] / 2)) for i in range(2)]
  upper = [int(np.floor(window_size[i] / 2)) + (window_size[i] % 2)
           for i in range(2)]
  vv, hh = np.meshgrid(np.arange(lower[0], upper[0]),
                       np.arange(lower[1], upper[1]), indexing="ij")
  kernel = np.exp(-0.5 * (vv**2 + hh**2) / sigma**2)
  return kernel / np.sum(kernel) if normalized else kernel


def get_low_pass_filter(DFT_num_samples, filter_parameters,
                        norm_and_threshold=True):
  """Exponential low-pass transfer function in the DFT domain.

  filter_parameters: {'shape': 'exponential', 'cutoff': fraction of the
  2-d Nyquist in [0,1], 'order': exponent >= 1}.  Magnitudes below 1e-3
  are floored when norm_and_threshold so the inverse filter stays sane.
  """
  if filter_parameters["shape"] != "exponential":
    raise KeyError("Unrecognized filter shape: "
                   + filter_parameters["shape"])
  cutoff = filter_parameters["cutoff"]
  order = filter_parameters["order"]
  assert 0.0 <= cutoff <= 1.0 and order >= 1.0
  fv = np.fft.fftfreq(DFT_num_samples[0])
  fh = np.fft.fftfreq(DFT_num_samples[1])
  grid = np.meshgrid(fv, fh, indexing="ij")
  mag = np.sqrt(grid[0]**2 + grid[1]**2)
  lpf = np.exp(-np.power(mag / (0.5 * cutoff), order))
  if norm_and_threshold:
    lpf[lpf < 1e-3] = 1e-3
  return lpf * np.exp(1j * 0.0)


def get_whitening_ramp_filter(DFT_num_samples, norm_and_threshold=True):
  """|f| magnitude-ramp whitening transfer function (zero phase)."""
  fv = np.fft.fftfreq(DFT_num_samples[0])
  fh = np.fft.fftfreq(DFT_num_samples[1])
  grid = np.meshgrid(fv, fh, indexing="ij")
  mag = np.sqrt(grid[0]**2 + grid[1]**2)
  if norm_and_threshold:
    mag = mag / np.max(mag)
    mag[mag < 1e-5] = 1e-5
  return mag * np.exp(1j * 0.0)


def whiten_center_surround(image, cutoffs, return_filter=False,
                           norm_and_threshold=True):
  """Rolled-off ramp x low-pass: a center-surround whitening filter that
  passes some low-frequency content through (reference
  image_processing.py:267-308).  cutoffs = {'low', 'high'}."""
  lpf = get_low_pass_filter(
      image.shape,
      {"shape": "exponential", "cutoff": cutoffs["high"], "order": 8.0},
      norm_and_threshold=False)
  ramp = get_whitening_ramp_filter(image.shape, norm_and_threshold=False)
  rolled_off = np.maximum(ramp, cutoffs["low"])
  combined = rolled_off * lpf
  if norm_and_threshold:
    combined = combined / np.max(np.abs(combined))
    combined[np.abs(combined) < 1e-3] = 1e-3
  filtered = filter_fd(image, combined)
  return (filtered, combined) if return_filter else filtered


def unwhiten_center_surround(image, low_cutoff=None, orig_filter_DFT=None):
  """Invert center-surround whitening; exact when the original filter
  DFT is provided, else a rolled-off-ramp approximation."""
  assert not (low_cutoff is None and orig_filter_DFT is None)
  if orig_filter_DFT is None:
    ramp = get_whitening_ramp_filter(image.shape,
                                     norm_and_threshold=False)
    orig_filter_DFT = np.maximum(ramp, low_cutoff)
  return filter_fd(image, 1.0 / orig_filter_DFT)


# ---------------------------------------------------------------------------
# dataset-level transforms
# ---------------------------------------------------------------------------
def whiten_ZCA(flat_data, precomputed_ZCA_parameters=None):
  """ZCA whitening: rotate into the PCA basis, normalize per-axis
  standard deviation (with a +1e-4 guard), rotate back.

  Centering subtracts the MEAN OF THE COMPONENT MEANS (a scalar) rather
  than per-component means -- this avoids blocking artifacts when
  patches are reassembled into images (reference
  image_processing.py:396-404).

  Returns (white_data, ZCA_parameters) when estimating, else white_data.
  ZCA_parameters = {'PCA_basis' (n,n), 'PCA_axis_variances' (n,),
  'subtracted_mean' scalar}.
  """
  flat_data = np.asarray(flat_data)
  num_samples, num_components = flat_data.shape
  estimating = precomputed_ZCA_parameters is None
  if estimating:
    if num_components > 0.1 * num_samples:
      raise RuntimeError(
          "too few samples to estimate the PCA basis reliably")
    centered, comp_means = center_each_component(flat_data)
    u, w, _ = np.linalg.svd(
        centered.T @ centered / num_samples, full_matrices=True)
    params = {"PCA_basis": u, "PCA_axis_variances": w,
              "subtracted_mean": np.mean(comp_means)}
  else:
    params = dict(precomputed_ZCA_parameters)
    centered = flat_data - params["subtracted_mean"]

  scaled = (centered @ params["PCA_basis"]) / (
      np.sqrt(params["PCA_axis_variances"]) + 1e-4)[None, :]
  white = (scaled @ params["PCA_basis"].T).astype("float32") + (
      params["subtracted_mean"])
  return (white, params) if estimating else white


def unwhiten_ZCA(white_flat_data, precomputed_ZCA_parameters):
  """Inverse of whiten_ZCA given the estimated parameters."""
  params = precomputed_ZCA_parameters
  centered = white_flat_data - params["subtracted_mean"]
  scaled = (centered @ params["PCA_basis"]) * (
      np.sqrt(params["PCA_axis_variances"]) + 1e-4)[None, :]
  return (scaled @ params["PCA_basis"].T).astype("float32") + (
      params["subtracted_mean"])


def local_contrast_normalization(image, filter_sigma,
                                 return_normalizer=False):
  """Divide by a gaussian-smoothed local standard-deviation estimate."""
  kernel = get_gaussian_filter_2d(
      filter_sigma, (4 * filter_sigma + 1, 4 * filter_sigma + 1))
  local_var = filter_sd(np.asarray(image)**2, kernel)
  local_var[local_var == 0] = 1.0
  normalizer = np.sqrt(local_var)
  if return_normalizer:
    return image / normalizer, normalizer
  return image / normalizer


def local_luminance_subtraction(image, filter_sigma,
                                return_subtractor=False):
  """Subtract a gaussian-smoothed local luminance estimate."""
  kernel = get_gaussian_filter_2d(
      filter_sigma, (4 * filter_sigma + 1, 4 * filter_sigma + 1))
  local_lum = filter_sd(np.asarray(image), kernel)
  if return_subtractor:
    return image - local_lum, local_lum
  return image - local_lum


def center_each_component(flat_data):
  """Zero-mean each component across the dataset; returns the original
  means for inversion."""
  means = np.mean(flat_data, axis=0)
  return (flat_data - means[None, :]).astype("float32"), means


def center_each_sample(flat_data):
  """Zero the DC value of each sample; returns the original DC values."""
  means = np.mean(flat_data, axis=1)
  return (flat_data - means[:, None]).astype("float32"), means


def normalize_component_variance(flat_data):
  """Unit-variance each component across the dataset; returns the
  original variances for inversion."""
  variances = np.var(flat_data, axis=0)
  return ((flat_data / np.sqrt(variances)[None, :]).astype("float32"),
          variances)


# ---------------------------------------------------------------------------
# deterministic tiling
# ---------------------------------------------------------------------------
def patches_from_single_image(image, patch_dimensions, flatten_patches):
  """Non-overlapping tiling of one (h, w, c) image into patches; ignores
  overflow pixels on the bottom/right.  Returns (patches, positions)."""
  image = np.asarray(image)
  assert image.ndim == 3
  ph, pw = patch_dimensions
  nv, nh = image.shape[0] // ph, image.shape[1] // pw
  if image.shape[0] % ph or image.shape[1] % pw:
    print("Warning: image not evenly divisible by patch size; ignoring "
          "overflow pixels on the right/bottom")
  patches = np.zeros((nv * nh, ph, pw, image.shape[2]), image.dtype)
  positions = []
  for iv in range(nv):
    for ih in range(nh):
      y, x = iv * ph, ih * pw
      patches[iv * nh + ih] = image[y:y + ph, x:x + pw]
      positions.append((y, x))
  if flatten_patches:
    patches = patches.reshape(patches.shape[0], -1)
  return patches, positions


def assemble_image_from_patches(patches, patch_dimensions,
                                patch_positions):
  """Inverse of patches_from_single_image."""
  patches = np.asarray(patches)
  ph, pw = patch_dimensions
  height = max(p[0] for p in patch_positions) + ph
  width = max(p[1] for p in patch_positions) + pw
  if patches.ndim == 2:
    channels = patches.shape[1] // (ph * pw)
    assert channels * ph * pw == patches.shape[1]
  else:
    channels = patches.shape[-1]
  image = np.zeros((height, width, channels), patches.dtype)
  for idx, (y, x) in enumerate(patch_positions):
    tile = patches[idx].reshape(ph, pw, channels)
    image[y:y + ph, x:x + pw] = tile
  return image
