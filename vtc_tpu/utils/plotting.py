"""Metrics and visualization for transform codes.

Functional parity with the reference's utils/plotting.py (compute_pSNR:17,
compute_ssim:42, standardize_for_imshow:67, display_dictionary:126,
display_codes:486, display_code_marginal_densities:643,
display_2d_code_densities:801), re-written around a single vectorized
tiling engine instead of per-element Python loops.  All functions are
host-side NumPy/matplotlib; device arrays are converted on entry.

matplotlib uses the Agg backend unless one is already selected, so these
work in headless training jobs (TensorBoard image logging).
"""
import math

import numpy as np

import matplotlib
if matplotlib.get_backend().lower() not in ("agg",):  # headless-safe
  try:
    matplotlib.use("Agg")
  except Exception:  # pragma: no cover - backend already in use
    pass
from matplotlib import pyplot as plt


def compute_pSNR(target, reconstruction, manual_sig_mag=None):
  """Peak signal-to-noise ratio, 10*log10(range^2 / MSE).

  ``manual_sig_mag`` optionally fixes the signal range (max - min) used as
  the peak reference; otherwise it is estimated from ``target``.
  Returns np.inf for an exact reconstruction.
  """
  target = np.asarray(target)
  reconstruction = np.asarray(reconstruction)
  if manual_sig_mag is None:
    signal_magnitude = np.max(target) - np.min(target)
  else:
    signal_magnitude = manual_sig_mag
  mse = np.mean(np.square(target - reconstruction))
  if mse == 0:
    return np.inf
  return 10.0 * np.log10(signal_magnitude**2 / mse)


def compute_ssim(target, reconstruction, manual_sig_mag=None):
  """Mean structural similarity with the Wang-2004 settings: gaussian
  windows (sigma 1.5, truncated at 3.5 sigma), K1=0.01, K2=0.03,
  population (not sample) covariance.  Self-contained NumPy
  implementation (no scikit-image dependency); matches
  skimage.metrics.structural_similarity with gaussian_weights=True,
  use_sample_covariance=False on 2-d inputs.
  """
  from scipy.ndimage import gaussian_filter
  target = np.asarray(target, np.float64)
  reconstruction = np.asarray(reconstruction, np.float64)
  if manual_sig_mag is None:
    data_range = np.max(target) - np.min(target)
  else:
    data_range = manual_sig_mag
  sigma, truncate = 1.5, 3.5
  c1 = (0.01 * data_range) ** 2
  c2 = (0.03 * data_range) ** 2

  def smooth(x):
    return gaussian_filter(x, sigma, truncate=truncate, mode="reflect")

  mu_x = smooth(target)
  mu_y = smooth(reconstruction)
  var_x = smooth(target * target) - mu_x * mu_x
  var_y = smooth(reconstruction * reconstruction) - mu_y * mu_y
  cov_xy = smooth(target * reconstruction) - mu_x * mu_y
  ssim_map = (((2 * mu_x * mu_y + c1) * (2 * cov_xy + c2)) /
              ((mu_x**2 + mu_y**2 + c1) * (var_x + var_y + c2)))
  # crop the filter-radius border like skimage does
  pad = int(truncate * sigma + 0.5)
  if all(dim > 2 * pad for dim in ssim_map.shape):
    inner = ssim_map[tuple(slice(pad, dim - pad)
                           for dim in ssim_map.shape)]
  else:
    inner = ssim_map
  return float(np.mean(inner))


def standardize_for_imshow(image):
  """Map an arbitrary-range image into [0, 1] with a transparent rule.

  Nonnegative images are scaled so max -> 1; nonpositive so min -> 0 (after
  shifting); sign-straddling images map 0 -> 0.5 symmetrically around the
  largest absolute value.  Returns (standardized_image, raw_val_mapping)
  where raw_val_mapping gives the raw values displayed as [black, mid,
  white].
  """
  image = np.asarray(image)
  max_val = float(np.max(image))
  min_val = float(np.min(image))
  if max_val == min_val:
    std_img = np.full(image.shape, 0.5)
    if max_val > 0:
      mapping = [0.0, max_val, 2 * max_val]
    elif max_val < 0:
      mapping = [2 * max_val, max_val, 0.0]
    else:
      mapping = [-1.0, 0.0, 1.0]
    return std_img, mapping
  if min_val >= 0:
    return image / max_val, [0.0, 0.5 * max_val, max_val]
  if max_val <= 0:
    return image / (-min_val) + 1.0, [min_val, 0.5 * min_val, 0.0]
  bound = max(abs(min_val), abs(max_val))
  std_img = image / (2 * bound) + 0.5
  if abs(max_val) >= abs(min_val):
    mapping = [-max_val, 0.0, max_val]
  else:
    mapping = [min_val, 0.0, -min_val]
  return std_img, mapping


def _elements_as_patches(dictionary, reshaping=None):
  """(s, ph, pw[, c]) array of displayable patches from either dictionary
  format ((s, n) fully-connected or (s, c, kh, kw) convolutional)."""
  dictionary = np.asarray(dictionary)
  if dictionary.ndim == 2:
    s, n = dictionary.shape
    if reshaping is None:
      side = int(math.sqrt(n))
      if side * side == n:
        reshaping = (side, side)
      else:
        reshaping = (1, n)  # 1-d data: show as a row
    return dictionary.reshape((s,) + tuple(reshaping))
  # convolutional (s, c, kh, kw) -> (s, kh, kw) or (s, kh, kw, c)
  s, c, kh, kw = dictionary.shape
  if c == 1:
    return dictionary[:, 0]
  return np.moveaxis(dictionary, 1, 3)


def _tile_grid(patches, grid_hw, border=1, fill=0.35):
  """Compose (k, ph, pw[,c]) patches into one bordered mosaic image."""
  k = patches.shape[0]
  gh, gw = grid_hw
  ph, pw = patches.shape[1], patches.shape[2]
  color = patches.ndim == 4
  shape = (gh * (ph + border) + border, gw * (pw + border) + border) + (
      (patches.shape[3],) if color else ())
  canvas = np.full(shape, fill, dtype=np.float32)
  for idx in range(min(k, gh * gw)):
    r, c = divmod(idx, gw)
    y = border + r * (ph + border)
    x = border + c * (pw + border)
    canvas[y:y + ph, x:x + pw] = patches[idx]
  return canvas


_MAX_TILES_PER_FIG = 400


def get_dictionary_tile_imgs(dictionary, indv_renorm=False,
                             reshape_to_these_dims=None, highlights=None,
                             max_tiles_per_fig=_MAX_TILES_PER_FIG,
                             one_d_tile=False):
  """Tile dictionary elements into mosaic images (multiple if s is large).

  ``one_d_tile`` lays the elements out in a single horizontal strip
  (at most 80 per image) instead of a square grid — the reference's
  flat-subtile layout (plotting.py:217,272-291).

  Returns (tile_images, raw_val_mapping, label_coords) where label_coords
  gives, per figure, (index_label, y_pixel, x_pixel) tuples for optional
  index annotation.
  """
  if one_d_tile:
    max_tiles_per_fig = min(max_tiles_per_fig, 80)
  patches = _elements_as_patches(dictionary, reshape_to_these_dims)
  order = np.arange(patches.shape[0])
  weights = None
  if highlights is not None:
    weights = np.asarray(highlights["weights"])
    if highlights.get("reorder", False):
      order = np.argsort(weights)[::-1]
      patches = patches[order]
      weights = weights[order]

  if indv_renorm:
    shown = np.stack([standardize_for_imshow(p)[0] for p in patches])
    mapping = [0.0, 0.5, 1.0]
  else:
    shown, mapping = standardize_for_imshow(patches)

  if weights is not None:
    shown = _colorize_by_weight(shown, weights,
                                highlights.get("color_range", (-1.0, 1.0)))

  imgs, labels = [], []
  for start in range(0, shown.shape[0], max_tiles_per_fig):
    chunk = shown[start:start + max_tiles_per_fig]
    if one_d_tile:
      gw, gh = chunk.shape[0], 1
    else:
      gw = int(math.ceil(math.sqrt(chunk.shape[0])))
      gh = int(math.ceil(chunk.shape[0] / gw))
    imgs.append(_tile_grid(chunk, (gh, gw)))
    ph, pw = chunk.shape[1], chunk.shape[2]
    labels.append([
        (str(order[start + i]),
         1 + (i // gw) * (ph + 1), 1 + (i % gw) * (pw + 1))
        for i in range(chunk.shape[0])])
  return imgs, mapping, labels


def _colorize_by_weight(gray_tiles, weights, color_range):
  """Tint grayscale tiles blue-to-red by per-element scalar weights."""
  lo, hi = color_range
  t = np.clip((weights - lo) / max(hi - lo, 1e-12), 0.0, 1.0)
  cmap = plt.get_cmap("RdBu_r")
  if gray_tiles.ndim == 3:
    gray_tiles = np.repeat(gray_tiles[..., None], 3, axis=3)
  tinted = gray_tiles.copy()
  for idx in range(gray_tiles.shape[0]):
    tint = np.asarray(cmap(t[idx]))[:3]
    tinted[idx] = 0.7 * gray_tiles[idx] + 0.3 * tint[None, None, :]
  return tinted


def get_dictionary_tile_imgs_arr_by_group(dictionary, groups,
                                          indv_renorm=False,
                                          reshape_to_these_dims=None,
                                          highlights=None):
  """Group-aware tiling: each group occupies one row (groups are small)."""
  patches = _elements_as_patches(dictionary, reshape_to_these_dims)
  if indv_renorm:
    shown = np.stack([standardize_for_imshow(p)[0] for p in patches])
  else:
    shown, _ = standardize_for_imshow(patches)
  max_gs = max(len(g) for g in groups)
  rows = []
  for members in groups:
    sel = shown[np.asarray(list(members), dtype=int)]
    if sel.shape[0] < max_gs:  # pad the row
      pad = np.full((max_gs - sel.shape[0],) + sel.shape[1:], 0.35,
                    sel.dtype)
      sel = np.concatenate([sel, pad], axis=0)
    rows.append(_tile_grid(sel, (1, max_gs)))
  # stack group-rows vertically into figures of at most 50 rows
  imgs = []
  for start in range(0, len(rows), 50):
    imgs.append(np.concatenate(rows[start:start + 50], axis=0))
  return imgs


def display_dictionary(dictionary, renormalize=False, reshaping=None,
                       groupings=None, label_inds=False, highlighting=None,
                       plot_title=""):
  """Render the dictionary as one or more matplotlib figures.

  Mirrors the reference API (utils/plotting.py:126-212): renormalize for
  per-element color scales, reshaping for fully-connected elements,
  groupings for one-group-per-row layout, label_inds for index overlays,
  highlighting={'weights', 'color_range', 'reorder'} for scalar tinting.
  Returns a list of figures.
  """
  if groupings is None:
    tiles, mapping, labels = get_dictionary_tile_imgs(
        dictionary, indv_renorm=renormalize,
        reshape_to_these_dims=reshaping, highlights=highlighting)
  else:
    tiles = get_dictionary_tile_imgs_arr_by_group(
        dictionary, groupings, indv_renorm=renormalize,
        reshape_to_these_dims=reshaping, highlights=highlighting)
    mapping, labels = [0.0, 0.5, 1.0], None

  figs = []
  for fig_idx, tile_img in enumerate(tiles):
    fig = plt.figure(figsize=(10, 10))
    ax = plt.axes((0.075, 0.075, 0.85, 0.85))
    fig.suptitle("{}, fig {} of {}".format(plot_title, fig_idx + 1,
                                           len(tiles)), fontsize=16)
    ax.imshow(tile_img, cmap="gray", vmin=0.0, vmax=1.0,
              interpolation="none")
    if label_inds and labels is not None:
      for text, y, x in labels[fig_idx]:
        ax.text(x, y, text, fontsize=6, va="top", ha="left", color="w")
    ax.axis("off")
    if not renormalize and groupings is None:
      cbar_ax = plt.axes((0.945, 0.4, 0.01, 0.2))
      cbar_ax.imshow(np.linspace(1.0, 0.0, 256)[:, None], cmap="gray",
                     aspect="auto")
      cbar_ax.yaxis.tick_right()
      cbar_ax.xaxis.set_ticks([])
      cbar_ax.yaxis.set_ticks([0, 128, 255])
      cbar_ax.yaxis.set_ticklabels(
          ["{:.2f}".format(v) for v in mapping[::-1]], fontsize=8)
    figs.append(fig)
  return figs


def display_codes(codes, indv_stem_plots=True, input_and_recon=None,
                  data_pt_per_fig=None, plot_title=""):
  """Visualize transform codes (reference plotting.py:486-641).

  Args:
    codes: (b, s) array of codes.
    indv_stem_plots: one stem plot per sample; when False, pack the
      codes into a grayscale image (raw and per-sample-normalized
      panels) — the reference's alternative display.
    input_and_recon: optional dict with 'input' and 'recon' (b, ...)
      image arrays and 'vrange' (lo, hi); shown beside each stem plot
      with the reconstruction pSNR annotated.
    data_pt_per_fig: samples per figure (default: 16 for stem plots,
      1000 for the packed-image display).
  """
  codes = np.asarray(codes)
  num = codes.shape[0]
  per_fig = int(data_pt_per_fig or (16 if indv_stem_plots else 1000))
  figs = []
  for start in range(0, num, per_fig):
    chunk = codes[start:start + per_fig]
    if not indv_stem_plots:
      norm = chunk / np.maximum(
          np.abs(chunk).max(axis=1, keepdims=True), 1e-12)
      fig, (ax0, ax1) = plt.subplots(1, 2, figsize=(12, 6))
      fig.suptitle(plot_title)
      for ax, img, lbl in ((ax0, chunk, "codes"),
                           (ax1, norm, "per-sample normalized")):
        ax.imshow(img, cmap="gray", interpolation="none")
        ax.set_aspect("auto")
        ax.set_title(lbl, fontsize=8)
      figs.append(fig)
      continue
    rows = chunk.shape[0]
    ncols = 3 if input_and_recon is not None else 1
    fig, axes = plt.subplots(
        rows, ncols, figsize=(12, max(2, 1.2 * rows)), squeeze=False,
        gridspec_kw=({"width_ratios": [20, 2, 2]} if ncols == 3 else {}))
    fig.suptitle(plot_title)
    for i in range(rows):
      ax = axes[i][0]
      ax.stem(np.arange(codes.shape[1]), chunk[i], markerfmt=" ")
      ax.set_ylabel("sample {}".format(start + i), fontsize=6)
      ax.tick_params(labelsize=5)
      if input_and_recon is not None:
        vlo, vhi = input_and_recon["vrange"]
        inp = np.asarray(input_and_recon["input"][start + i])
        rec = np.asarray(input_and_recon["recon"][start + i])
        side = int(round(math.sqrt(inp.size)))
        if inp.ndim == 1 and side * side == inp.size:
          inp, rec = inp.reshape(side, side), rec.reshape(side, side)
        for ax, img, lbl in ((axes[i][1], inp, "In"),
                             (axes[i][2], rec, "Rec")):
          ax.imshow(img, cmap="gray", vmin=vlo, vmax=vhi)
          ax.axis("off")
          if i == 0:
            ax.set_title(lbl, fontsize=8)
        axes[i][2].text(
            1.0, 0.1,
            "{:.1f}dB".format(compute_pSNR(inp, rec,
                                           manual_sig_mag=vhi - vlo)),
            color="w", fontsize=5, transform=axes[i][2].transAxes,
            horizontalalignment="right")
    figs.append(fig)
  return figs


def display_code_marginal_densities(codes, num_hist_bins, log_prob=False,
                                    ignore_vals=(), lines=True,
                                    ignore_zeros=False, overlaid=False,
                                    plot_title=""):
  """Histograms of each code component's marginal distribution
  (reference plotting.py:643).

  ``ignore_vals`` drops exact code values from the estimate (the
  reference's zero-exclusion hook; ``ignore_zeros=True`` is this
  package's shorthand for ``ignore_vals=[0.0]``).  ``lines`` plots the
  binned counts as a line instead of bars.  Returns a list with one
  figure."""
  codes = np.asarray(codes)
  drop = list(ignore_vals) + ([0.0] if ignore_zeros else [])

  def filtered(vals):
    for v in drop:
      vals = vals[vals != v]
    return vals

  def binned(vals):
    counts, edges = np.histogram(vals, num_hist_bins, density=True)
    if log_prob:
      with np.errstate(divide="ignore"):
        counts = np.log10(counts)
    return counts, 0.5 * (edges[:-1] + edges[1:])

  s = codes.shape[1]
  fig = plt.figure(figsize=(12, 8))
  fig.suptitle(plot_title)
  if overlaid:
    ax = plt.subplot(111)
    for comp in range(min(s, 64)):
      vals = filtered(codes[:, comp])
      if vals.size == 0:
        continue
      counts, centers = binned(vals)
      ax.plot(centers, counts, alpha=0.4)
    ax.set_xlabel("code value")
    ax.set_ylabel("log10 density" if log_prob else "density")
  else:
    show = min(s, 25)
    grid = int(math.ceil(math.sqrt(show)))
    for comp in range(show):
      ax = plt.subplot(grid, grid, comp + 1)
      vals = filtered(codes[:, comp])
      if vals.size:
        if lines:
          counts, centers = binned(vals)
          ax.plot(centers, counts)
        else:
          ax.hist(vals, num_hist_bins, density=True, log=log_prob)
      ax.set_title(str(comp), fontsize=6)
      ax.tick_params(labelsize=5)
  return [fig]


def display_2d_code_densities(two_codes, num_hist_bins, log_prob=False,
                              with_contours=True, ignore_vals=(),
                              plot_title=""):
  """Joint histogram (optionally + contours) of two code components
  (reference plotting.py:801).  ``ignore_vals`` drops samples where
  EITHER component takes one of the listed exact values."""
  two_codes = np.asarray(two_codes)
  assert two_codes.shape[1] == 2
  for v in ignore_vals:
    keep = np.logical_and(two_codes[:, 0] != v, two_codes[:, 1] != v)
    two_codes = two_codes[keep]
  counts, xedges, yedges = np.histogram2d(
      two_codes[:, 0], two_codes[:, 1], bins=num_hist_bins, density=True)
  if log_prob:
    with np.errstate(divide="ignore"):
      counts = np.log10(counts + 1e-12)
  fig, axes = plt.subplots(1, 2 if with_contours else 1,
                           figsize=(12 if with_contours else 6, 5),
                           squeeze=False)
  fig.suptitle(plot_title)
  ax0 = axes[0][0]
  ax0.imshow(counts.T, origin="lower", aspect="auto",
             extent=(xedges[0], xedges[-1], yedges[0], yedges[-1]))
  ax0.set_title("joint histogram")
  if with_contours:
    xc = 0.5 * (xedges[:-1] + xedges[1:])
    yc = 0.5 * (yedges[:-1] + yedges[1:])
    axes[0][1].contour(xc, yc, counts.T)
    axes[0][1].set_title("density contours")
  return [fig]
