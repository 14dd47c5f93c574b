"""Train an ICA dictionary (natural-gradient, orthonormal QR init).

Reference recipe: examples/train_ica.py -- 16x16 ZCA-whitened patches,
square dictionary.  Synthetic images by default.
"""
import _path_setup  # noqa: F401  (repo-checkout import bootstrap)
import argparse
import math
from pathlib import Path

import numpy as np

from vtc_tpu.data.dataset_generation import (BatchIterator,
                                             create_patch_training_set)
from vtc_tpu.training.ica import (train_dictionary,
                                  train_dictionary_scanned)
from vtc_tpu.utils import defaults

parser = argparse.ArgumentParser()
parser.add_argument("--dataset", default="synthetic")
parser.add_argument("--train-size", type=int, default=200_000)
parser.add_argument("--batch-size", type=int, default=250)
parser.add_argument("--epochs", type=int, default=10)
parser.add_argument("--patch", type=int, default=16)
parser.add_argument("--run-id", default="ica_example")
parser.add_argument("--scanned", action="store_true",
                    help="compiled-segment fast path: whole training "
                         "segments as one lax.scan with warm "
                         "Newton-Schulz inverse tracking (~5x the "
                         "per-batch path on TPU)")
args = parser.parse_args()

PATCH = args.patch
N = PATCH * PATCH
iters_per_epoch = int(math.ceil(args.train_size / args.batch_size))
logdir = defaults.logging_directory / args.run_id

print("Creating ZCA-whitened patch set...")
train = create_patch_training_set(
    args.train_size, (PATCH, PATCH), edge_buffer=5,
    dataset=args.dataset,
    order_of_preproc_ops=["standardize_data_range", "patch",
                          "whiten_ZCA"],
    extra_params={"seed": 0})

params = {
    "num_epochs": args.epochs,
    "dictionary_update_algorithm": "ica_natural_gradient",
    "dict_update_param_schedule": {
        0: {"stepsize": 0.01, "num_iters": 1},
        5 * iters_per_epoch: {"stepsize": 0.005, "num_iters": 1}},
    "checkpoint_schedule": {args.epochs * iters_per_epoch - 1},
    "training_visualization_schedule": {0, 1000} | {
        iters_per_epoch * e for e in range(1, args.epochs)},
    "logging_folder_fullpath": Path(logdir),
    "reshaped_kernel_size": (PATCH, PATCH),
    "stdout_print_interval": max(iters_per_epoch // 2, 1),
}

# orthonormal init via QR (reference examples/train_ica.py:78-80)
rng = np.random.RandomState(0)
d0 = np.linalg.qr(rng.standard_normal((N, N)))[0].astype(np.float32)

print("Here we go!")
if args.scanned:
  k = train["patches"].shape[0] // args.batch_size
  stacked = train["patches"][:k * args.batch_size].reshape(
      k, args.batch_size, N).astype(np.float32)
  final = train_dictionary_scanned(stacked, d0, params)
else:
  final = train_dictionary(
      BatchIterator(train["patches"], args.batch_size, seed=0), d0,
      params)
print("Done; final dictionary", np.asarray(final).shape,
      "- logs in", logdir)
