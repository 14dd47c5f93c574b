"""Train a convolutional sparse-coding dictionary on full images.

The reference recipe (examples/train_convolutional_sparse_coding.py):
256x256 images, 64 kernels of 16x16 at stride 8, ISTA inference, cheap
quadratic updates, with images pre-padded so the masked border absorbs
convolution boundary effects.  Synthetic 1/f images by default.

  python examples/train_convolutional_sparse_coding.py --epochs 1
"""
import _path_setup  # noqa: F401  (repo-checkout import bootstrap)
import argparse
import math
from pathlib import Path

import numpy as np

from vtc_tpu.data.dataset_generation import (BatchIterator,
                                             create_patch_training_set)
from vtc_tpu.ops.conv_shapes import get_padding_amt
from vtc_tpu.training.compiled_epoch import train_dictionary_scanned
from vtc_tpu.training.sparse_coding import train_dictionary
from vtc_tpu.utils import defaults

parser = argparse.ArgumentParser()
parser.add_argument("--dataset", default="synthetic")
parser.add_argument("--train-size", type=int, default=2000)
parser.add_argument("--val-size", type=int, default=100)
parser.add_argument("--batch-size", type=int, default=5)
parser.add_argument("--epochs", type=int, default=10)
parser.add_argument("--image-size", type=int, default=256)
parser.add_argument("--kernel-size", type=int, default=16)
parser.add_argument("--stride", type=int, default=8)
parser.add_argument("--num-kernels", type=int, default=64)
parser.add_argument("--run-id", default="conv_sparse_coding_example")
parser.add_argument("--scanned", action="store_true",
                    help="compiled-segment fast path (whole segments "
                         "as one lax.scan; no validation metrics)")
args = parser.parse_args()

K, STRIDE, IMG = args.kernel_size, args.stride, args.image_size
padding = (get_padding_amt(IMG, K, STRIDE), get_padding_amt(IMG, K, STRIDE))
iters_per_epoch = int(math.ceil(args.train_size / args.batch_size))
logdir = defaults.logging_directory / args.run_id

print("Creating padded full-image training set...")
preproc = ["standardize_data_range", "whiten_center_surround", "patch",
           "center_each_patch", "pad"]
extra = {"seed": 0, "padding": padding, "flatten_patches": False,
         "image_dim": IMG * 2}
train = create_patch_training_set(
    args.train_size, (IMG, IMG), edge_buffer=2, dataset=args.dataset,
    order_of_preproc_ops=preproc, extra_params=extra)
val = create_patch_training_set(
    args.val_size, (IMG, IMG), edge_buffer=2, dataset=args.dataset,
    order_of_preproc_ops=preproc, extra_params=dict(extra, seed=1))

params = {
    "mode": "convolutional",
    "num_epochs": args.epochs,
    "code_inference_algorithm": "ista",
    "inference_param_schedule": {
        0: {"sparsity_weight": 0.05, "num_iters": 25},
        3 * iters_per_epoch: {"sparsity_weight": 0.05, "num_iters": 50},
        5 * iters_per_epoch: {"sparsity_weight": 0.05, "num_iters": 100}},
    "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
    "dict_update_param_schedule": {
        0: {"stepsize": 0.001, "num_iters": 1},
        4 * iters_per_epoch: {"stepsize": 0.0005, "num_iters": 1}},
    "strides": (STRIDE, STRIDE),
    "padding": padding,
    "checkpoint_schedule": {args.epochs * iters_per_epoch - 1},
    "training_visualization_schedule": {0, 100, 500} | {
        iters_per_epoch * e for e in range(1, args.epochs)},
    "logging_folder_fullpath": Path(logdir),
    "stdout_print_interval": max(iters_per_epoch // 2, 1),
}

rng = np.random.RandomState(0)
d0 = rng.randn(args.num_kernels, 1, K, K).astype(np.float32)
d0 /= np.sqrt(np.sum(d0**2, axis=(1, 2, 3), keepdims=True))

print("Here we go!")
if args.scanned:
  k = train["patches"].shape[0] // args.batch_size
  stacked = train["patches"][:k * args.batch_size].reshape(
      (k, args.batch_size) + train["patches"].shape[1:])
  vb = max(min(args.batch_size, args.val_size), 1)
  vk = max(val["patches"].shape[0] // vb, 1)
  val_stacked = val["patches"][:vk * vb].reshape(
      (vk, vb) + val["patches"].shape[1:])
  final = train_dictionary_scanned(stacked, val_stacked, d0, params)
else:
  final = train_dictionary(
      BatchIterator(train["patches"], args.batch_size, seed=0),
      BatchIterator(val["patches"], min(args.batch_size * 4,
                                        args.val_size),
                    shuffle=False, drop_last=False),
      d0, params)
print("Done; final dictionary", np.asarray(final).shape,
      "- logs in", logdir)
