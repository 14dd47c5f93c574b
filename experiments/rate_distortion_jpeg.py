"""Rate-distortion curve of the JPEG/DCT baseline over quality factors.

Self-contained version of the reference's experiments/
rate_distortion_jpeg.py (which imports a module absent upstream).

  python experiments/rate_distortion_jpeg.py --quick
"""
import _path_setup  # noqa: F401
import argparse

import numpy as np

from vtc_tpu.analysis_transforms.fully_connected import invertible_linear
from vtc_tpu.data.dataset_generation import create_patch_training_set
from vtc_tpu.utils import defaults, jpeg, matrix_zigzag

from rate_distortion_common import (external_jpeg_rd_curve, rd_point,
                                    save_rd_curve)

parser = argparse.ArgumentParser()
parser.add_argument("--dataset", default="synthetic")
parser.add_argument("--train-size", type=int, default=4000)
parser.add_argument("--test-size", type=int, default=400)
parser.add_argument("--quick", action="store_true")
args = parser.parse_args()
if args.quick:
  args.train_size, args.test_size = 1000, 100

PATCH = 8
N = PATCH * PATCH

data = create_patch_training_set(
    args.train_size + args.test_size, (PATCH, PATCH), edge_buffer=4,
    dataset=args.dataset,
    order_of_preproc_ops=["standardize_data_range", "patch"],
    extra_params={"seed": 0})["patches"] * 255.0
train_imgs, test_imgs = data[:args.train_size], data[args.train_size:]
signal_range = 255.0

from vtc_tpu.utils.dct import dct_dictionary_zigzag
dct = dct_dictionary_zigzag(PATCH)

train_codes = np.asarray(invertible_linear.run(
    train_imgs, dct, orthonormal=True))
test_codes = np.asarray(invertible_linear.run(
    test_imgs, dct, orthonormal=True))

base_bw = jpeg.get_jpeg_quant_hifi_binwidths().astype(np.float64)
points = []
for quality_div in (0.25, 0.5, 1.0, 2.0, 4.0):
  p = rd_point(train_codes, test_codes, lambda c: c @ dct, test_imgs,
               base_bw / quality_div, signal_range)
  points.append(p)
  print(f"  quality x{quality_div}: {p['rate_bits_per_pixel']:.3f} bpp "
        f"/ {p['psnr_db']:.2f} dB")

# external anchor: a real libjpeg encode of the same test patches (the
# ffmpeg comparison the reference intended, experiments/
# rate_distortion_jpeg.py:225-229 -- its module is absent upstream)
ext_points = external_jpeg_rd_curve(test_imgs, (PATCH, PATCH),
                                    signal_range)
for p in ext_points:
  print(f"  libjpeg: {p['rate_bits_per_pixel']:.3f} bpp "
        f"/ {p['psnr_db']:.2f} dB")

outdir = defaults.logging_directory / "rate_distortion"
outdir.mkdir(parents=True, exist_ok=True)
save_rd_curve([points, ext_points],
              ["JPEG (DCT + std binwidths)", "libjpeg (PIL, external)"],
              outdir / "rd_jpeg.csv", outdir / "rd_jpeg.png",
              "JPEG baseline rate-distortion")
print("wrote", outdir / "rd_jpeg.csv", "and .png")
