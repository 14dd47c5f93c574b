"""Tour of the image-processing pipeline, with figures saved to disk.

Headless equivalent of the reference's examples/basic_image_processing.py
(1105-line interactive matplotlib demo), covering the same five
sections with the same panel breadth — each transform gets the
reference's 3x4 grid (original / processed / recovered / difference;
log-magnitude 2D DFTs of image, processed image, and filter; the filter
in image space; rotational averages; joint densities of adjacent
pixels) — plus the patch tiling round trip and the recommended
compression preprocessing.  Writes PNGs under the logging directory.

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


def rot_avg(arr2d, nbins=24):
  h, w = arr2d.shape
  v, hh = np.meshgrid(np.arange(h) - h // 2, np.arange(w) - w // 2,
                      indexing="ij")
  return rotational_average(arr2d, nbins=nbins,
                            elem_cartesian_coords=(v, hh))


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


def section_figure(fname, title, orig, proc, recovered, filter_DFT,
                   proc_label):
  """The reference's per-transform 3x4 panel grid."""
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
  if filter_DFT is not None:
    show(axes[1][2], np.log10(np.abs(np.fft.fftshift(filter_DFT)) + 1e-9),
         "(log) |2D DFT| filter", cmap="viridis")
    img_space = np.real(np.fft.fftshift(np.fft.ifft2(filter_DFT)))
    c = img_space.shape[0] // 2
    zoom = img_space[max(0, c - 16):c + 16, max(0, c - 16):c + 16]
    show(axes[1][3], zoom, "Filter in image space (center)")
  else:
    axes[1][2].axis("off")
    axes[1][3].axis("off")
  for ax, arr, lbl in ((axes[2][0], log_dft(o), "orig"),
                       (axes[2][1], log_dft(p), "processed")):
    means, edges = rot_avg(arr)
    ax.plot(edges, means)
    ax.set_title(f"Rotational avg log|DFT| ({lbl})", fontsize=8)
    ax.tick_params(labelsize=6)
  joint_density(axes[2][2], o, "Adjacent-pixel density (orig)")
  joint_density(axes[2][3], p, f"Adjacent-pixel density ({proc_label})")
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
section_figure("01_low_pass_filtering.png", "Low-pass filtering",
               image, low, recovered_lp, lpf, "Low-pass filtered")

# --- 2. center-surround ('Atick and Redlich') whitening ------------------
white, filt = ip.whiten_center_surround(
    image, cutoffs={"low": 1e-3, "high": 0.9}, return_filter=True)
recovered = ip.unwhiten_center_surround(white, orig_filter_DFT=filt)
section_figure("02_center_surround_whitening.png",
               "'Atick and Redlich' center-surround whitening",
               image, white, recovered, filt, "Whitened image")

# --- 3. ZCA whitening of patches -----------------------------------------
patches = dg.create_patch_training_set(
    2000, (12, 12), edge_buffer=4, dataset="synthetic",
    order_of_preproc_ops=["standardize_data_range", "patch"],
    extra_params={"seed": 1, "num_images": 3,
                  "image_dim": args.image_dim})["patches"]
white_patches, zca = ip.whiten_ZCA(patches)
recovered_patches = ip.unwhiten_ZCA(white_patches, zca)
fig, axes = plt.subplots(4, 8, figsize=(16, 8))
fig.suptitle("ZCA whitening", fontsize=12)
for i in range(8):
  show(axes[0][i], patches[i].reshape(12, 12), "patch" if i == 0 else "")
  show(axes[1][i], white_patches[i].reshape(12, 12),
       "ZCA whitened" if i == 0 else "")
  show(axes[2][i], recovered_patches[i].reshape(12, 12),
       "recovered" if i == 0 else "")
  show(axes[3][i], (recovered_patches[i] - patches[i]).reshape(12, 12),
       "difference" if i == 0 else "")
err = np.abs(recovered_patches - patches).max()
axes[3][7].set_title(f"max err {err:.1e}", fontsize=8)
fig.savefig(outdir / "03_zca_patches.png", dpi=100, bbox_inches="tight")
plt.close(fig)
# adjacent-component joint densities before/after (decorrelation panel)
fig, axes = plt.subplots(1, 2, figsize=(9, 4))
joint_density(axes[0], patches.reshape(-1, 12), "Adjacent pixels (raw)")
joint_density(axes[1], white_patches.reshape(-1, 12),
              "Adjacent pixels (ZCA)")
fig.savefig(outdir / "03b_zca_joint_densities.png", dpi=100,
            bbox_inches="tight")
plt.close(fig)

# --- 4. local contrast normalization -------------------------------------
lcn, normalizer = ip.local_contrast_normalization(
    image, filter_sigma=6, return_normalizer=True)
recovered_lcn = lcn * normalizer
section_figure("04_local_contrast_normalization.png",
               "Local Contrast Normalization",
               image, lcn, recovered_lcn, None,
               "Contrast normalized")
fig, ax = plt.subplots(figsize=(4, 4))
show(ax, normalizer, "normalizer (sqrt local variance)")
fig.savefig(outdir / "04b_lcn_normalizer.png", dpi=100,
            bbox_inches="tight")
plt.close(fig)

# --- 5. local luminance subtraction --------------------------------------
lls, subtractor = ip.local_luminance_subtraction(
    image, filter_sigma=6, return_subtractor=True)
recovered_lls = lls + subtractor
section_figure("05_local_luminance_subtraction.png",
               "Local Luminance Subtraction",
               image, lls, recovered_lls, None,
               "Luminance subtracted")
fig, ax = plt.subplots(figsize=(4, 4))
show(ax, subtractor, "subtractor (local mean)")
fig.savefig(outdir / "05b_lls_subtractor.png", dpi=100,
            bbox_inches="tight")
plt.close(fig)

# --- 6. deterministic tiling round trip ----------------------------------
tiles, positions = ip.patches_from_single_image(image, (32, 32), False)
reassembled = ip.assemble_image_from_patches(tiles, (32, 32), positions)
assert np.array_equal(reassembled, image[:reassembled.shape[0],
                                         :reassembled.shape[1]])

# --- 7. recommended compression preprocessing ----------------------------
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
fig.savefig(outdir / "06_compression_preproc.png", dpi=100,
            bbox_inches="tight")
plt.close(fig)

print("wrote figures 01-06 to", outdir)
