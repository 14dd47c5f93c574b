"""Train a fully-connected sparse-coding dictionary.

The flagship recipe (reference examples/train_sparse_coding.py): 16x16
whitened patches, critically-sampled 256-atom dictionary, FISTA inference
with an iteration schedule, cheap-quadratic dictionary updates.  Runs on
hermetic synthetic 1/f images by default; point --dataset at Field_NW
with VTC_DATASET_DIR set to use the original data.

  python examples/train_sparse_coding.py --epochs 2 --train-size 100000
"""
import _path_setup  # noqa: F401  (repo-checkout import bootstrap)
import argparse
import math
from pathlib import Path

import numpy as np

from vtc_tpu.data.dataset_generation import (BatchIterator,
                                             create_patch_training_set)
from vtc_tpu.training.sparse_coding import train_dictionary
from vtc_tpu.utils import defaults

parser = argparse.ArgumentParser()
parser.add_argument("--dataset", default="synthetic")
parser.add_argument("--train-size", type=int, default=250_000)
parser.add_argument("--val-size", type=int, default=10_000)
parser.add_argument("--batch-size", type=int, default=250)
parser.add_argument("--epochs", type=int, default=10)
parser.add_argument("--patch", type=int, default=16)
parser.add_argument("--run-id", default="sparse_coding_example")
parser.add_argument("--formulation", default="gram",
                    choices=["gram", "direct", "pallas"])
args = parser.parse_args()

PATCH = args.patch
CODE_SIZE = PATCH * PATCH  # critically sampled
iters_per_epoch = int(math.ceil(args.train_size / args.batch_size))
logdir = defaults.logging_directory / args.run_id

print("Creating training and validation patch sets...")
preproc = ["standardize_data_range", "whiten_center_surround", "patch"]
train = create_patch_training_set(
    args.train_size, (PATCH, PATCH), edge_buffer=5, dataset=args.dataset,
    order_of_preproc_ops=preproc, extra_params={"seed": 0})
val = create_patch_training_set(
    args.val_size, (PATCH, PATCH), edge_buffer=5, dataset=args.dataset,
    order_of_preproc_ops=preproc, extra_params={"seed": 1})

params = {
    "mode": "fully-connected",
    "num_epochs": args.epochs,
    "code_inference_algorithm": "fista",
    "inference_param_schedule": {
        0: {"sparsity_weight": 0.008, "num_iters": 25},
        2 * iters_per_epoch: {"sparsity_weight": 0.008, "num_iters": 50},
        5 * iters_per_epoch: {"sparsity_weight": 0.008, "num_iters": 100}},
    "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
    "dict_update_param_schedule": {
        0: {"stepsize": 0.1, "num_iters": 1},
        5 * iters_per_epoch: {"stepsize": 0.05, "num_iters": 1}},
    "checkpoint_schedule": {iters_per_epoch,
                            args.epochs * iters_per_epoch - 1},
    "training_visualization_schedule": {0, 500, 1000, 2000} | {
        iters_per_epoch * e for e in range(1, args.epochs)},
    "logging_folder_fullpath": Path(logdir),
    "reshaped_kernel_size": (PATCH, PATCH),
    "fc_formulation": args.formulation,
    "stdout_print_interval": max(iters_per_epoch // 2, 1),
    "str_entire_calling_script": open(__file__).read(),
}

rng = np.random.RandomState(0)
d0 = rng.randn(CODE_SIZE, PATCH * PATCH).astype(np.float32)
d0 /= np.linalg.norm(d0, axis=1, keepdims=True)

print("Here we go!")
final = train_dictionary(
    BatchIterator(train["patches"], args.batch_size, seed=0),
    BatchIterator(val["patches"], min(args.batch_size * 10,
                                      args.val_size),
                  shuffle=False, drop_last=False),
    d0, params)
print("Done; final dictionary", np.asarray(final).shape,
      "- logs in", logdir)
