"""Tour of the image-processing pipeline, with figures saved to disk.

Headless equivalent of the reference's examples/basic_image_processing.py
(1105-line interactive matplotlib demo), covering the same sections with
the same panel inventory, on synthetic images instead of the Kodak
pickle (reference :16-23 hardcodes a local dataset path):

  1. low-pass filtering          (ref visualize_lp_filtering :146-291 --
     3x4 grid incl. THREE rotational averages: original, filtered, filter)
  2. center-surround whitening   (ref visualize_AR_whitening :294-497 --
     grid + adjacent-pixel joint densities)
  3. ZCA whitening of a FULL image via patch tiling (ref main :58-84 +
     visualize_ZCA_whitening :500-685 -- estimate on a patch dataset,
     whiten the tiled image, reassemble; PCA axis-variance panel)
  4. local contrast normalization (ref visualize_lcn :688-883 -- the
     divided-out normalizer is an in-grid panel WITH its own DFT)
  5. local luminance subtraction  (ref visualize_lls :886-1094 -- ditto
     for the subtractor, plus the gaussian transfer-function overlay)
  6. deterministic tiling round trip
  7. recommended compression preprocessing (ref main :111-141 -- tuned
     whitening passband + luminance subtraction on an IMAGE, partial
     unwhitening via low_cutoff, rendered with the LLS and AR grids)

Writes PNGs under the logging directory.

  python examples/basic_image_processing.py
"""
import _path_setup  # noqa: F401
import argparse

import matplotlib
matplotlib.use("Agg")
import numpy as np
from matplotlib import pyplot as plt

from vtc_tpu.data import dataset_generation as dg
from vtc_tpu.data import image_processing as ip
from vtc_tpu.utils import defaults
from vtc_tpu.utils.misc import rotational_average
from vtc_tpu.utils.plotting import standardize_for_imshow

parser = argparse.ArgumentParser()
parser.add_argument("--image-dim", type=int, default=256)
args = parser.parse_args()

outdir = defaults.logging_directory / "basic_image_processing"
outdir.mkdir(parents=True, exist_ok=True)


def show(ax, img, title, cmap="gray"):
  arr = img[:, :, 0] if img.ndim == 3 else img
  shown, _ = standardize_for_imshow(arr)
  ax.imshow(shown, cmap=cmap)
  ax.set_title(title, fontsize=8)
  ax.axis("off")


def log_dft(arr):
  return np.log10(np.abs(np.fft.fftshift(np.fft.fft2(arr))) + 1e-9)


def rot_avg_panel(ax, arr2d, label, nbins=24, overlay=None):
  h, w = arr2d.shape
  v, hh = np.meshgrid(np.arange(h) - h // 2, np.arange(w) - w // 2,
                      indexing="ij")
  means, edges = rotational_average(arr2d, nbins=nbins,
                                    elem_cartesian_coords=(v, hh))
  ax.plot(edges, means)
  if overlay is not None:
    twin = ax.twinx()
    twin.plot(edges, overlay(edges), color="tab:red", linestyle="--",
              linewidth=1)
    twin.tick_params(labelsize=6)
  ax.set_title(f"Rotational avg log|DFT|\n({label})", fontsize=8)
  ax.tick_params(labelsize=6)


def joint_density(ax, arr, title, nbins=60):
  """Joint histogram of horizontally adjacent pixel pairs (the
  reference's decorrelation-evidence panel)."""
  a = arr[:, :-1].ravel()
  b = arr[:, 1:].ravel()
  lim = max(1e-9, np.percentile(np.abs(np.stack([a, b])), 99))
  hist, xe, ye = np.histogram2d(a, b, bins=nbins,
                                range=[[-lim, lim], [-lim, lim]])
  ax.imshow(np.log10(hist.T + 1), origin="lower", cmap="viridis",
            extent=[xe[0], xe[-1], ye[0], ye[-1]], aspect="auto")
  ax.set_title(title, fontsize=8)
  ax.set_xlabel("pixel i", fontsize=7)
  ax.set_ylabel("pixel i+1", fontsize=7)
  ax.tick_params(labelsize=6)


def filter_panels(axes_pair, filter_DFT):
  """[DFT magnitude, image-space center crop] of a frequency-domain
  filter (reference lp grid [1,2]-[1,3])."""
  show(axes_pair[0], np.log10(np.abs(np.fft.fftshift(filter_DFT)) + 1e-9),
       "(log) |2D DFT| filter", cmap="viridis")
  img_space = np.real(np.fft.fftshift(np.fft.ifft2(filter_DFT)))
  c = img_space.shape[0] // 2
  zoom = img_space[max(0, c - 16):c + 16, max(0, c - 16):c + 16]
  show(axes_pair[1], zoom, "Filter in image space (center)")


def filtering_figure(fname, title, orig, proc, recovered, filter_DFT,
                     proc_label, filter_rotavg):
  """The reference's per-transform 3x4 panel grid for frequency-domain
  transforms.  filter_rotavg=True renders the filter's own rotational
  average at [2,2] (ref lp grid :278-291); False renders the AR-grid's
  adjacent-pixel joint densities there (ref :412-497)."""
  o = orig[:, :, 0] if orig.ndim == 3 else orig
  p = proc[:, :, 0] if proc.ndim == 3 else proc
  r = recovered[:, :, 0] if recovered.ndim == 3 else recovered
  fig, axes = plt.subplots(3, 4, figsize=(15, 10))
  fig.suptitle(title, fontsize=12)
  show(axes[0][0], o, "Original image")
  show(axes[0][1], p, proc_label)
  show(axes[0][2], r, "Recovered (inverted) image")
  err = np.abs(r - o).max()
  show(axes[0][3], r - o, f"Difference (max {err:.1e})")
  show(axes[1][0], log_dft(o), "(log) |2D DFT| original", cmap="viridis")
  show(axes[1][1], log_dft(p), f"(log) |2D DFT| {proc_label.lower()}",
       cmap="viridis")
  filter_panels((axes[1][2], axes[1][3]), filter_DFT)
  rot_avg_panel(axes[2][0], log_dft(o), "original")
  rot_avg_panel(axes[2][1], log_dft(p), proc_label.lower())
  if filter_rotavg:
    rot_avg_panel(axes[2][2],
                  np.log10(np.abs(np.fft.fftshift(filter_DFT)) + 1e-9),
                  "filter")
    joint_density(axes[2][3], p, f"Adjacent-pixel density\n({proc_label})")
  else:
    joint_density(axes[2][2], o, "Adjacent-pixel density\n(original)")
    joint_density(axes[2][3], p, f"Adjacent-pixel density\n({proc_label})")
  fig.savefig(outdir / fname, dpi=100, bbox_inches="tight")
  plt.close(fig)


def local_stat_figure(fname, title, orig, proc, aux, recovered,
                      proc_label, aux_label, gaussian_sigma_fd=None):
  """The reference's LCN/LLS 3x4 grid: the divided-out normalizer /
  subtracted-out luminance is an in-grid panel with its own DFT and
  rotational average (ref visualize_lcn :688-883 / visualize_lls
  :886-1094).  gaussian_sigma_fd overlays the gaussian transfer
  function on the aux rotational average (ref :306-318)."""
  o = orig[:, :, 0] if orig.ndim == 3 else orig
  p = proc[:, :, 0] if proc.ndim == 3 else proc
  a = aux[:, :, 0] if aux.ndim == 3 else aux
  r = recovered[:, :, 0] if recovered.ndim == 3 else recovered
  fig, axes = plt.subplots(3, 4, figsize=(15, 10))
  fig.suptitle(title, fontsize=12)
  show(axes[0][0], o, "Original image")
  show(axes[0][1], p, proc_label)
  show(axes[0][2], a, aux_label)
  err = np.abs(r - o).max()
  show(axes[0][3], r, f"Recovered original (max err {err:.1e})")
  show(axes[1][0], log_dft(o), "(log) |2D DFT| original", cmap="viridis")
  show(axes[1][1], log_dft(p), f"(log) |2D DFT| {proc_label.lower()}",
       cmap="viridis")
  show(axes[1][2], log_dft(a), f"(log) |2D DFT| {aux_label.lower()}",
       cmap="viridis")
  joint_density(axes[1][3], o, "Adjacent-pixel density\n(original)")
  rot_avg_panel(axes[2][0], log_dft(o), "original")
  rot_avg_panel(axes[2][1], log_dft(p), proc_label.lower())
  overlay = None
  if gaussian_sigma_fd is not None:
    # gaussian transfer function at the rotational-average frequencies
    # (edges are in pixels of the shifted DFT; normalize to cycles/px)
    n = o.shape[0]
    overlay = lambda edges: np.exp(
        -0.5 * (edges / n / gaussian_sigma_fd) ** 2)
  rot_avg_panel(axes[2][2], log_dft(a), aux_label.lower(), overlay=overlay)
  joint_density(axes[2][3], p, f"Adjacent-pixel density\n({proc_label})")
  fig.savefig(outdir / fname, dpi=100, bbox_inches="tight")
  plt.close(fig)


image = dg.generate_synthetic_images(1, args.image_dim, seed=0)[0]
im2d = image[:, :, 0]

# --- 1. low-pass filtering (exponential transfer function) ---------------
lpf = ip.get_low_pass_filter(im2d.shape,
                             {"shape": "exponential", "cutoff": 0.3,
                              "order": 2.0})
low = ip.filter_fd(image, lpf)
recovered_lp = ip.filter_fd(low, 1.0 / lpf)
filtering_figure("01_low_pass_filtering.png", "Low-pass filtering",
                 image, low, recovered_lp, lpf, "Low-pass filtered",
                 filter_rotavg=True)

# --- 2. center-surround ('Atick and Redlich') whitening ------------------
white, filt = ip.whiten_center_surround(
    image, cutoffs={"low": 1e-3, "high": 0.9}, return_filter=True)
recovered = ip.unwhiten_center_surround(white, orig_filter_DFT=filt)
filtering_figure("02_center_surround_whitening.png",
                 "'Atick and Redlich' center-surround whitening",
                 image, white, recovered, filt, "Whitened image",
                 filter_rotavg=False)

# --- 3. ZCA whitening of a full image via patch tiling --------------------
# reference main :58-84: estimate the transform on a big patch dataset,
# then whiten the deterministic tiling of ONE image and reassemble
zca_pdims = (8, 8)
train_patches = dg.create_patch_training_set(
    20000, zca_pdims, edge_buffer=5, dataset="synthetic",
    order_of_preproc_ops=["standardize_data_range", "patch"],
    extra_params={"seed": 1, "num_images": 3,
                  "image_dim": args.image_dim})["patches"]
_, zca = ip.whiten_ZCA(train_patches)
img_patches, patch_pos = ip.patches_from_single_image(
    image, zca_pdims, flatten_patches=True)
white_patches = ip.whiten_ZCA(img_patches, precomputed_ZCA_parameters=zca)
white_img = ip.assemble_image_from_patches(
    white_patches, zca_pdims, patch_pos)
rec_patches = ip.unwhiten_ZCA(white_patches, zca)
rec_img = ip.assemble_image_from_patches(rec_patches, zca_pdims, patch_pos)
o = image[:rec_img.shape[0], :rec_img.shape[1], 0]
w2d, r2d = white_img[:, :, 0], rec_img[:, :, 0]
fig, axes = plt.subplots(3, 4, figsize=(15, 10))
fig.suptitle("ZCA whitening (patch-tiled full image)", fontsize=12)
show(axes[0][0], o, "Original image")
show(axes[0][1], w2d, "ZCA-whitened image")
show(axes[0][2], r2d, "Recovered (unwhitened) image")
err = np.abs(r2d - o).max()
show(axes[0][3], r2d - o, f"Difference (max {err:.1e})")
show(axes[1][0], log_dft(o), "(log) |2D DFT| original", cmap="viridis")
show(axes[1][1], log_dft(w2d), "(log) |2D DFT| whitened", cmap="viridis")
# the ZCA transform's center row, reshaped to the patch: the effective
# whitening kernel in image space (analogue of the filter panel)
center = (zca_pdims[0] // 2) * zca_pdims[1] + zca_pdims[1] // 2
zca_mat = (zca["PCA_basis"]
           / (np.sqrt(zca["PCA_axis_variances"]) + 1e-4)[None, :]
           ) @ zca["PCA_basis"].T
show(axes[1][2], zca_mat[center].reshape(zca_pdims),
     "ZCA kernel (center row)\nin patch space")
axes[1][3].plot(np.arange(len(zca["PCA_axis_variances"])),
                zca["PCA_axis_variances"])
axes[1][3].set_yscale("log")
axes[1][3].set_title("Variance in each PCA dimension\n(from dataset)",
                     fontsize=8)
axes[1][3].tick_params(labelsize=6)
rot_avg_panel(axes[2][0], log_dft(o), "original")
rot_avg_panel(axes[2][1], log_dft(w2d), "whitened")
joint_density(axes[2][2], o, "Adjacent-pixel density\n(original)")
joint_density(axes[2][3], w2d, "Adjacent-pixel density\n(whitened)")
fig.savefig(outdir / "03_zca_whitening.png", dpi=100, bbox_inches="tight")
plt.close(fig)
# patch-strip view (whiten/recover round trip on individual patches)
fig, axes = plt.subplots(4, 8, figsize=(16, 8))
fig.suptitle("ZCA whitening: patch round trip", fontsize=12)
for i in range(8):
  show(axes[0][i], img_patches[i].reshape(zca_pdims),
       "patch" if i == 0 else "")
  show(axes[1][i], white_patches[i].reshape(zca_pdims),
       "ZCA whitened" if i == 0 else "")
  show(axes[2][i], rec_patches[i].reshape(zca_pdims),
       "recovered" if i == 0 else "")
  show(axes[3][i], (rec_patches[i] - img_patches[i]).reshape(zca_pdims),
       "difference" if i == 0 else "")
fig.savefig(outdir / "03b_zca_patches.png", dpi=100, bbox_inches="tight")
plt.close(fig)

# --- 4. local contrast normalization -------------------------------------
lcn, normalizer = ip.local_contrast_normalization(
    image, filter_sigma=6, return_normalizer=True)
recovered_lcn = lcn * normalizer
local_stat_figure("04_local_contrast_normalization.png",
                  "Local Contrast Normalization",
                  image, lcn, normalizer, recovered_lcn,
                  "Contrast normalized", "Divided-out local contrast")

# --- 5. local luminance subtraction --------------------------------------
g_sigma_sd = 6
lls, subtractor = ip.local_luminance_subtraction(
    image, filter_sigma=g_sigma_sd, return_subtractor=True)
recovered_lls = lls + subtractor
local_stat_figure("05_local_luminance_subtraction.png",
                  "Local Luminance Subtraction",
                  image, lls, subtractor, recovered_lls,
                  "Luminance subtracted", "Subtracted-out luminance",
                  gaussian_sigma_fd=1.0 / (2 * np.pi * g_sigma_sd))

# --- 6. deterministic tiling round trip ----------------------------------
tiles, positions = ip.patches_from_single_image(image, (32, 32), False)
reassembled = ip.assemble_image_from_patches(tiles, (32, 32), positions)
assert np.array_equal(reassembled, image[:reassembled.shape[0],
                                         :reassembled.shape[1]])

# --- 7. recommended compression preprocessing ----------------------------
# reference main :111-141: pass low frequencies THROUGH the whitening
# filter (tune its low cutoff so a gaussian luminance subtractor with
# sigma gfilt_sigma_sd absorbs them), then DON'T unwhiten them
gfilt_sigma_sd = 8
attenuation = 100.0
gfilt_sigma_fd = 1.0 / (2 * np.pi * gfilt_sigma_sd)
wf_cutoff_low = (np.sqrt(2 * np.log(np.sqrt(attenuation)))
                 * gfilt_sigma_fd)
white_img, white_filt = ip.whiten_center_surround(
    image, cutoffs={"low": wf_cutoff_low, "high": 0.9},
    norm_and_threshold=False, return_filter=True)
white_centered, wc_subtractor = ip.local_luminance_subtraction(
    white_img, gfilt_sigma_sd, return_subtractor=True)
white_recovered = white_centered + wc_subtractor
# partial unwhitening: low frequencies stay attenuated (sparse-coding
# noise there should not be amplified)
orig_recovered = ip.unwhiten_center_surround(
    white_recovered, low_cutoff=wf_cutoff_low)
local_stat_figure("06_compression_preproc_lls.png",
                  "Compression preprocessing: luminance stage",
                  white_img, white_centered, wc_subtractor,
                  white_recovered, "Luminance subtracted",
                  "Subtracted-out luminance",
                  gaussian_sigma_fd=gfilt_sigma_fd)
filtering_figure("06b_compression_preproc_whitening.png",
                 "Compression preprocessing: tuned whitening"
                 " + partial unwhitening",
                 image, white_img, orig_recovered, white_filt,
                 "Whitened image", filter_rotavg=False)
# patch view of the full recommended pipeline (dataset-level ops)
comp = dg.create_patch_training_set(
    2000, (16, 16), edge_buffer=4, dataset="synthetic",
    order_of_preproc_ops=["standardize_data_range",
                          "whiten_center_surround", "patch",
                          "center_each_patch"],
    extra_params={"seed": 2, "num_images": 3,
                  "image_dim": args.image_dim})
fig, axes = plt.subplots(1, 8, figsize=(16, 2.2))
for i in range(8):
  show(axes[i], comp["patches"][i].reshape(16, 16),
       "compression-preproc patch" if i == 0 else "")
fig.savefig(outdir / "06c_compression_preproc_patches.png", dpi=100,
            bbox_inches="tight")
plt.close(fig)

print("wrote figures 01-06 to", outdir)
