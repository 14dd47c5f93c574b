"""Rate-distortion of learned sparse codes vs the JPEG/DCT baseline.

Self-contained version of the reference's experiments/
rate_distortion_sparse_coding.py (which depends on an external project
and cannot run upstream): learn an fc sparse-coding dictionary, infer
FISTA codes on held-out patches, sweep the quantization binwidth, and
entropy-code with the JPEG-style Huffman run-length coder.  Also traces
the DCT baseline on the same data for comparison.

  python experiments/rate_distortion_sparse_coding.py --quick
"""
import _path_setup  # noqa: F401
import argparse

import numpy as np

from vtc_tpu.analysis_transforms.fully_connected import (
    invertible_linear, ista_fista)
from vtc_tpu.data.dataset_generation import (BatchIterator,
                                             create_patch_training_set)
from vtc_tpu.training.sparse_coding import train_dictionary
from vtc_tpu.utils import defaults, matrix_zigzag

from rate_distortion_common import rd_point, save_rd_curve

parser = argparse.ArgumentParser()
parser.add_argument("--dataset", default="synthetic")
parser.add_argument("--train-size", type=int, default=40_000)
parser.add_argument("--test-size", type=int, default=400)
parser.add_argument("--patch", type=int, default=8)
parser.add_argument("--epochs", type=int, default=3)
parser.add_argument("--sparsity", type=float, default=0.02)
parser.add_argument("--quick", action="store_true",
                    help="small sizes for a fast smoke run")
args = parser.parse_args()
if args.quick:
  args.train_size, args.test_size, args.epochs = 5000, 100, 1

PATCH = args.patch
N = PATCH * PATCH

print("Building patch sets...")
data = create_patch_training_set(
    args.train_size + args.test_size, (PATCH, PATCH), edge_buffer=4,
    dataset=args.dataset,
    order_of_preproc_ops=["standardize_data_range", "patch",
                          "center_each_patch"],
    extra_params={"seed": 0})["patches"] * 255.0
train_imgs = data[:args.train_size]
test_imgs = data[args.train_size:]
signal_range = float(np.max(data) - np.min(data))

print("Learning the sparse-coding dictionary...")
rng = np.random.RandomState(0)
d0 = rng.randn(N, N).astype(np.float32)
d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
batch = 250
iters_per_epoch = args.train_size // batch
sc_dict = np.asarray(train_dictionary(
    BatchIterator(train_imgs, batch, seed=0),
    BatchIterator(test_imgs, args.test_size, shuffle=False,
                  drop_last=False),
    d0, {
        "mode": "fully-connected",
        "num_epochs": args.epochs,
        "code_inference_algorithm": "fista",
        "inference_param_schedule": {
            0: {"sparsity_weight": args.sparsity * 255, "num_iters": 50}},
        "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
        "dict_update_param_schedule": {
            0: {"stepsize": 0.1, "num_iters": 1}},
        "stdout_print_interval": 10_000,
    }))

print("Inferring codes...")
sc_train_codes = np.asarray(ista_fista.run(
    train_imgs[:4000], sc_dict, args.sparsity * 255, 100))
sc_test_codes = np.asarray(ista_fista.run(
    test_imgs, sc_dict, args.sparsity * 255, 100))

# DCT baseline codes
from vtc_tpu.utils.dct import dct_dictionary_zigzag
dct = dct_dictionary_zigzag(PATCH)
dct_train_codes = np.asarray(invertible_linear.run(
    train_imgs[:4000], dct, orthonormal=True))
dct_test_codes = np.asarray(invertible_linear.run(
    test_imgs, dct, orthonormal=True))

print("Sweeping quantization binwidths...")
binwidth_sweep = [4.0, 8.0, 16.0, 32.0, 64.0]
sc_points, dct_points = [], []
for bw in binwidth_sweep:
  sc_points.append(rd_point(
      sc_train_codes, sc_test_codes, lambda c: c @ sc_dict, test_imgs,
      bw, signal_range))
  dct_points.append(rd_point(
      dct_train_codes, dct_test_codes, lambda c: c @ dct, test_imgs,
      bw, signal_range))
  print(f"  binwidth {bw:6.1f}: SC {sc_points[-1]['rate_bits_per_pixel']:.3f} bpp"
        f" / {sc_points[-1]['psnr_db']:.2f} dB | DCT "
        f"{dct_points[-1]['rate_bits_per_pixel']:.3f} bpp / "
        f"{dct_points[-1]['psnr_db']:.2f} dB")

outdir = defaults.logging_directory / "rate_distortion"
outdir.mkdir(parents=True, exist_ok=True)
save_rd_curve(
    [sc_points, dct_points], ["sparse coding", "DCT (JPEG)"],
    outdir / "rd_sparse_coding.csv", outdir / "rd_sparse_coding.png",
    f"Rate-distortion, {PATCH}x{PATCH} patches ({args.dataset})")
print("wrote", outdir / "rd_sparse_coding.csv", "and .png")
