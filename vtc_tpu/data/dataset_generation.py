"""Patch-dataset construction with an ordered preprocessing-op pipeline.

API parity with reference utils/dataset_generation.py:22-337:
``create_patch_training_set(num_samples, patch_dimensions, edge_buffer,
dataset, order_of_preproc_ops, extra_params)`` supporting the ops
{'standardize_data_range', 'patch', 'whiten_center_surround',
'whiten_ZCA', 'local_contrast_normalization',
'local_luminance_subtraction', 'center_each_component',
'normalize_component_variance', 'center_each_patch', 'pad'} with the
same ordering constraints, and returning the patches plus every
inverse-transform parameter.

Extensions over the reference:
  * dataset='synthetic' generates seeded 1/f ("pink") noise images so
    tests and benchmarks are hermetic (no private datasets on disk),
  * an explicit ``seed`` in extra_params makes patch draws reproducible,
  * ``BatchIterator`` replaces the reference's torch
    OneOutputDset+DataLoader combination: a lightweight shuffling batch
    iterator over a NumPy array, re-iterable across epochs.
"""
import pickle

import numpy as np

from vtc_tpu.data import image_processing as ip
from vtc_tpu.utils import defaults

PRE_PATCH_OPS = ("whiten_center_surround", "local_contrast_normalization",
                 "local_luminance_subtraction")
POST_PATCH_OPS = ("whiten_ZCA", "center_each_component",
                  "normalize_component_variance", "center_each_patch",
                  "pad")


class BatchIterator:
  """Re-iterable shuffling batch iterator over a stacked sample array.

  Yields (b, ...) batches; reshuffles each epoch when shuffle=True.
  Replaces the reference's OneOutputDset + torch DataLoader
  (utils/dataset_generation.py:13-20).
  """

  def __init__(self, samples, batch_size, shuffle=True, drop_last=True,
               seed=0):
    self.samples = np.asarray(samples)
    self.batch_size = int(batch_size)
    self.shuffle = shuffle
    self.drop_last = drop_last
    self._rng = np.random.default_rng(seed)

  def __iter__(self):
    order = np.arange(self.samples.shape[0])
    if self.shuffle:
      self._rng.shuffle(order)
    stop = (self.samples.shape[0] // self.batch_size * self.batch_size
            if self.drop_last else self.samples.shape[0])
    for start in range(0, stop, self.batch_size):
      yield self.samples[order[start:start + self.batch_size]]

  def __len__(self):
    if self.drop_last:
      return self.samples.shape[0] // self.batch_size
    return -(-self.samples.shape[0] // self.batch_size)


def generate_synthetic_images(num_images=20, image_dim=512, seed=0,
                              spectral_slope=1.0, kind="pink"):
  """Seeded synthetic grayscale images, (h, w, 1) float32 in [0, 1].

  kind='pink': 1/f-amplitude noise -- natural images famously have ~1/f
  spectra, which is what the whitening pipeline is designed around, so
  this is a faithful hermetic stand-in for the curated datasets'
  second-order statistics.

  kind='dead_leaves': occluding random disks (the classic dead-leaves
  model).  Unlike Gaussian 1/f noise these have real edges and
  higher-order structure, so sparse coding on them learns oriented
  edge/arc atoms -- useful for qualitative demos.
  """
  rng = np.random.default_rng(seed)
  images = []
  if kind == "pink":
    fv = np.fft.fftfreq(image_dim)
    fh = np.fft.fftfreq(image_dim)
    mag = np.sqrt(fv[:, None]**2 + fh[None, :]**2)
    mag[0, 0] = 1.0
    amplitude = 1.0 / mag**spectral_slope
    amplitude[0, 0] = 0.0
    for _ in range(num_images):
      phase = rng.uniform(-np.pi, np.pi, (image_dim, image_dim))
      spec = amplitude * np.exp(1j * phase)
      img = np.real(np.fft.ifft2(spec)).astype("float32")
      img = (img - img.min()) / (img.max() - img.min())
      images.append(img[:, :, None])
    return images
  if kind == "dead_leaves":
    yy, xx = np.meshgrid(np.arange(image_dim), np.arange(image_dim),
                         indexing="ij")
    num_disks = 4 * image_dim  # enough to cover the canvas
    for _ in range(num_images):
      img = np.full((image_dim, image_dim), 0.5, np.float32)
      # power-law radii give scale invariance like natural occlusions
      radii = 4.0 / np.sqrt(rng.uniform(4.0 / image_dim**2, 0.25,
                                        num_disks))
      cy = rng.uniform(0, image_dim, num_disks)
      cx = rng.uniform(0, image_dim, num_disks)
      shades = rng.uniform(0, 1, num_disks).astype(np.float32)
      for d in range(num_disks):
        r = radii[d]
        y0, y1 = int(max(cy[d] - r, 0)), int(min(cy[d] + r + 1,
                                                 image_dim))
        x0, x1 = int(max(cx[d] - r, 0)), int(min(cx[d] + r + 1,
                                                 image_dim))
        if y0 >= y1 or x0 >= x1:
          continue
        patch_mask = ((yy[y0:y1, x0:x1] - cy[d])**2
                      + (xx[y0:y1, x0:x1] - cx[d])**2) <= r * r
        img[y0:y1, x0:x1][patch_mask] = shades[d]
      images.append(img[:, :, None])
    return images
  raise KeyError("unknown synthetic image kind: " + kind)


def _load_raw_images(dataset, filepath, extra_params):
  """Load a dataset as a list of (h, w, c) float32 images."""
  if dataset == "synthetic":
    return generate_synthetic_images(
        num_images=extra_params.get("num_images", 20),
        image_dim=extra_params.get("image_dim", 512),
        seed=extra_params.get("seed", 0))
  if dataset == "Field_NW":
    import scipy.io
    stack = scipy.io.loadmat(filepath)["IMAGESr"].astype("float32")
    stack = np.transpose(stack, (2, 0, 1))
    return [stack[i][:, :, None] for i in range(stack.shape[0])]
  if dataset == "vanHateren":
    import h5py
    with h5py.File(filepath, "r") as f:
      stack = np.array(f["van_hateren_good"], dtype="float32")
    return [stack[i][:, :, None] for i in range(stack.shape[0])]
  if dataset == "Kodak_BW":
    with open(filepath, "rb") as f:
      images = pickle.load(f)
    return [np.asarray(im).astype("float32")[:, :, None] for im in images]
  raise KeyError("Unrecognized dataset " + str(dataset))


def create_patch_training_set(num_samples, patch_dimensions, edge_buffer,
                              dataset, order_of_preproc_ops,
                              extra_params=None):
  """Draw a preprocessed random-patch training set.

  Args:
    num_samples: total number of patches to draw.
    patch_dimensions: (ph, pw).
    edge_buffer: pixels at each image border excluded from patch draws.
    dataset: 'Field_NW' | 'vanHateren' | 'Kodak_BW' | 'synthetic'.
    order_of_preproc_ops: ordered list of op names (see module
      docstring).  'patch' is mandatory; 'standardize_data_range' must
      come first if present; whitening/LCN/LLS are pre-patch; ZCA /
      centering / variance / pad are post-patch.
    extra_params: optional dict -- 'filepath', 'exclude',
      'padding' (for 'pad'), 'lcn_filter_sigma', 'lls_filter_sigma',
      'flatten_patches' (default True), 'whitening_cutoff_low'/'high',
      'seed', plus synthetic-dataset knobs ('num_images', 'image_dim').

  Returns:
    dict with 'patches' ((d, n) flattened or (d, c, ph, pw) NCHW) and the
    inverse-transform parameters that apply:
    'original_component_means', 'original_component_variances',
    'ZCA_parameters', 'local_contrasts', 'local_luminances'.
  """
  extra_params = dict(extra_params or {})
  assert "patch" in order_of_preproc_ops
  if "pad" in order_of_preproc_ops:
    assert "padding" in extra_params
  if "local_contrast_normalization" in order_of_preproc_ops:
    assert "lcn_filter_sigma" in extra_params
  if "local_luminance_subtraction" in order_of_preproc_ops:
    assert "lls_filter_sigma" in extra_params
  if "standardize_data_range" in order_of_preproc_ops:
    assert order_of_preproc_ops.index("standardize_data_range") == 0
    assert order_of_preproc_ops.count("standardize_data_range") == 1

  filepath = extra_params.get(
      "filepath", defaults.raw_data_filepaths.get(dataset))
  flatten = bool(extra_params.get("flatten_patches", True))
  wcl = extra_params.get("whitening_cutoff_low", 1e-3)
  wch = extra_params.get("whitening_cutoff_high", 0.9)
  rng = np.random.default_rng(extra_params.get("seed"))

  images = _load_raw_images(dataset, filepath, extra_params)
  if "exclude" in extra_params:
    excluded = set(extra_params["exclude"])
    images = [im for i, im in enumerate(images) if i not in excluded]

  track_contrast = "local_contrast_normalization" in order_of_preproc_ops
  track_luminance = "local_luminance_subtraction" in order_of_preproc_ops
  contrasts = [np.zeros_like(im) for im in images] if track_contrast else None
  luminances = [np.zeros_like(im) for im in images] if track_luminance else None

  patches = contrast_patches = luminance_patches = None
  return_dict = {}
  patched = False
  ph, pw = patch_dimensions

  for op in order_of_preproc_ops:
    if op == "standardize_data_range":
      lo = min(float(np.min(im)) for im in images)
      hi = max(float(np.max(im)) for im in images)
      assert hi > lo
      images = [(im - lo) / (hi - lo) for im in images]

    elif op == "patch":
      num_images = len(images)
      channels = images[0].shape[2]
      patches = np.zeros((num_samples, ph, pw, channels), "float32")
      if track_contrast:
        contrast_patches = np.zeros_like(patches)
      if track_luminance:
        luminance_patches = np.zeros_like(patches)
      img_choices = rng.integers(0, num_images, num_samples)
      for p_idx in range(num_samples):
        i = img_choices[p_idx]
        im = images[i]
        y = rng.integers(edge_buffer, im.shape[0] - ph - edge_buffer)
        x = rng.integers(edge_buffer, im.shape[1] - pw - edge_buffer)
        patches[p_idx] = im[y:y + ph, x:x + pw]
        if track_contrast:
          contrast_patches[p_idx] = contrasts[i][y:y + ph, x:x + pw]
        if track_luminance:
          luminance_patches[p_idx] = luminances[i][y:y + ph, x:x + pw]
      patched = True

    elif op == "whiten_center_surround":
      if patched:
        raise KeyError("center-surround whitening is a pre-patch op")
      images = [ip.whiten_center_surround(
          im, cutoffs={"low": wcl, "high": wch},
          norm_and_threshold=False) for im in images]

    elif op == "whiten_ZCA":
      if not patched:
        raise KeyError("ZCA whitening is a post-patch op")
      flat, zca_params = ip.whiten_ZCA(
          patches.reshape(num_samples, -1))
      patches = flat.reshape(patches.shape)
      return_dict["ZCA_parameters"] = zca_params

    elif op == "local_contrast_normalization":
      if patched:
        raise KeyError("LCN is a pre-patch op")
      for i in range(len(images)):
        images[i], contrasts[i] = ip.local_contrast_normalization(
            images[i], filter_sigma=extra_params["lcn_filter_sigma"],
            return_normalizer=True)

    elif op == "local_luminance_subtraction":
      if patched:
        raise KeyError("LLS is a pre-patch op")
      for i in range(len(images)):
        images[i], luminances[i] = ip.local_luminance_subtraction(
            images[i], filter_sigma=extra_params["lls_filter_sigma"],
            return_subtractor=True)

    elif op == "center_each_component":
      if not patched:
        raise KeyError("component centering is a post-patch op")
      flat, means = ip.center_each_component(
          patches.reshape(num_samples, -1))
      patches = flat.reshape(patches.shape)
      return_dict["original_component_means"] = means

    elif op == "normalize_component_variance":
      if not patched:
        raise KeyError("variance normalization is a post-patch op")
      flat, variances = ip.normalize_component_variance(
          patches.reshape(num_samples, -1))
      patches = flat.reshape(patches.shape)
      return_dict["original_component_variances"] = variances

    elif op == "center_each_patch":
      if not patched:
        raise KeyError("patch centering is a post-patch op")
      flat, _ = ip.center_each_sample(patches.reshape(num_samples, -1))
      patches = flat.reshape(patches.shape)

    elif op == "pad":
      if not patched:
        raise KeyError("padding applies to patches")
      if flatten:
        raise KeyError("flattened patches should not be padded")
      pad_spec = ((0, 0),) + tuple(
          tuple(p) for p in extra_params["padding"]) + ((0, 0),)
      patches = np.pad(patches, pad_spec, mode="constant")
      if track_contrast:
        contrast_patches = np.pad(contrast_patches, pad_spec,
                                  mode="constant")
      if track_luminance:
        luminance_patches = np.pad(luminance_patches, pad_spec,
                                   mode="constant")
    else:
      raise KeyError("Unrecognized preprocessing op " + op)

  if flatten:
    return_dict["patches"] = patches.reshape(num_samples, -1)
    if track_contrast:
      return_dict["local_contrasts"] = contrast_patches.reshape(
          num_samples, -1)
    if track_luminance:
      return_dict["local_luminances"] = luminance_patches.reshape(
          num_samples, -1)
  else:
    # NCHW for the convolutional pipeline
    return_dict["patches"] = np.moveaxis(patches, 3, 1)
    if track_contrast:
      return_dict["local_contrasts"] = np.moveaxis(contrast_patches, 3, 1)
    if track_luminance:
      return_dict["local_luminances"] = np.moveaxis(
          luminance_patches, 3, 1)
  return return_dict
