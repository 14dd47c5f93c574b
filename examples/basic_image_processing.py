"""Tour of the image-processing pipeline, with figures saved to disk.

Compact equivalent of the reference's examples/basic_image_processing.py
(1105-line interactive matplotlib demo): center-surround whitening and
its inverse, ZCA whitening of patches, local contrast normalization and
luminance subtraction, patch tiling round trips, and the recommended
compression preprocessing (standardize range -> whiten -> patch ->
center each patch).  Headless: writes PNGs under the logging directory.

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


def show(ax, img, title):
  shown, _ = standardize_for_imshow(img[:, :, 0])
  ax.imshow(shown, cmap="gray")
  ax.set_title(title, fontsize=9)
  ax.axis("off")


image = dg.generate_synthetic_images(1, args.image_dim, seed=0)[0]

# --- center-surround whitening and exact inversion -----------------------
white, filt = ip.whiten_center_surround(
    image, cutoffs={"low": 1e-3, "high": 0.9}, return_filter=True)
recovered = ip.unwhiten_center_surround(white, orig_filter_DFT=filt)
fig, axes = plt.subplots(1, 4, figsize=(16, 4))
show(axes[0], image, "original (1/f synthetic)")
show(axes[1], white, "center-surround whitened")
show(axes[2], recovered, "unwhitened (exact filter)")
err = np.abs(recovered - image).max()
axes[3].imshow(np.fft.fftshift(np.abs(filt)), cmap="viridis")
axes[3].set_title(f"filter |DFT|  (roundtrip err {err:.1e})", fontsize=9)
axes[3].axis("off")
fig.savefig(outdir / "01_center_surround_whitening.png", dpi=110,
            bbox_inches="tight")
plt.close(fig)

# --- amplitude spectra before/after whitening ----------------------------
fig, ax = plt.subplots(figsize=(6, 4))
for img, label in ((image, "original"), (white, "whitened")):
  spec = np.abs(np.fft.fftshift(np.fft.fft2(img[:, :, 0])))
  h = spec.shape[0]
  v, hh = np.meshgrid(np.arange(h) - h // 2, np.arange(h) - h // 2,
                      indexing="ij")
  means, edges = rotational_average(np.log10(spec + 1e-9), nbins=24,
                                    elem_cartesian_coords=(v, hh))
  ax.plot(edges, means, label=label)
ax.set_xlabel("spatial frequency (radial bin)")
ax.set_ylabel("log10 amplitude")
ax.legend()
ax.set_title("whitening flattens the 1/f spectrum")
fig.savefig(outdir / "02_amplitude_spectra.png", dpi=110,
            bbox_inches="tight")
plt.close(fig)

# --- LCN and LLS ----------------------------------------------------------
lcn, normalizer = ip.local_contrast_normalization(
    image, filter_sigma=6, return_normalizer=True)
lls, subtractor = ip.local_luminance_subtraction(
    image, filter_sigma=6, return_subtractor=True)
fig, axes = plt.subplots(1, 5, figsize=(20, 4))
show(axes[0], image, "original")
show(axes[1], lcn, "local contrast normalized")
show(axes[2], normalizer, "normalizer (sqrt local var)")
show(axes[3], lls, "local luminance subtracted")
show(axes[4], subtractor, "subtractor (local mean)")
fig.savefig(outdir / "03_lcn_lls.png", dpi=110, bbox_inches="tight")
plt.close(fig)

# --- ZCA whitening of patches ---------------------------------------------
patches = dg.create_patch_training_set(
    2000, (12, 12), edge_buffer=4, dataset="synthetic",
    order_of_preproc_ops=["standardize_data_range", "patch"],
    extra_params={"seed": 1, "num_images": 3,
                  "image_dim": args.image_dim})["patches"]
white_patches, zca = ip.whiten_ZCA(patches)
fig, axes = plt.subplots(2, 8, figsize=(16, 4))
for i in range(8):
  show(axes[0][i], patches[i].reshape(12, 12, 1), "patch" if i == 0 else "")
  show(axes[1][i], white_patches[i].reshape(12, 12, 1),
       "ZCA whitened" if i == 0 else "")
fig.savefig(outdir / "04_zca_patches.png", dpi=110, bbox_inches="tight")
plt.close(fig)

# --- deterministic tiling round trip --------------------------------------
tiles, positions = ip.patches_from_single_image(image, (32, 32), False)
reassembled = ip.assemble_image_from_patches(tiles, (32, 32), positions)
assert np.array_equal(reassembled, image[:reassembled.shape[0],
                                         :reassembled.shape[1]])

# --- recommended compression preprocessing --------------------------------
comp = dg.create_patch_training_set(
    2000, (16, 16), edge_buffer=4, dataset="synthetic",
    order_of_preproc_ops=["standardize_data_range",
                          "whiten_center_surround", "patch",
                          "center_each_patch"],
    extra_params={"seed": 2, "num_images": 3,
                  "image_dim": args.image_dim})
fig, axes = plt.subplots(1, 8, figsize=(16, 2.2))
for i in range(8):
  show(axes[i], comp["patches"][i].reshape(16, 16, 1),
       "compression-preproc patch" if i == 0 else "")
fig.savefig(outdir / "05_compression_preproc.png", dpi=110,
            bbox_inches="tight")
plt.close(fig)

print("wrote figures 01-05 to", outdir)
