"""Train a sparse-coding dictionary data-parallel over a TPU mesh.

The multi-chip recipe: shard the patch batch over the mesh's 'data'
axis, replicate the dictionary, and run whole training segments as a
``lax.scan`` of the psum-reduced step inside ONE ``shard_map`` — each
chip keeps its batch shard resident for the entire segment, and only
the per-step dictionary-gradient / Hessian-statistic reductions cross
the interconnect (vtc_tpu/parallel/data_parallel.py).  The result is
bit-comparable to single-chip training at the same global batch
(tests/test_parallel.py).

On a machine with one chip (or on CPU) this still runs: ask for a
virtual mesh with --virtual-devices, e.g.

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  JAX_PLATFORMS=cpu python examples/train_sparse_coding_multichip.py \
      --virtual-devices 8 --epochs 1 --train-size 20000

On a real multi-chip slice just run it bare: the mesh spans
``jax.devices()``.  Multi-slice pods: pass --dcn-slices N (gradient
psums then decompose into in-slice ICI + cross-slice DCN all-reduces).

Reference scale context: examples/train_sparse_coding.py:20-27 (the
single-GPU flagship recipe this distributes).
"""
import _path_setup  # noqa: F401
import argparse
import math

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--dataset", default="synthetic")
parser.add_argument("--train-size", type=int, default=250_000)
parser.add_argument("--batch-size", type=int, default=1024,
                    help="GLOBAL batch (split across the data axis)")
parser.add_argument("--epochs", type=int, default=3)
parser.add_argument("--patch", type=int, default=16)
parser.add_argument("--virtual-devices", type=int, default=0,
                    help="force N virtual CPU devices (demo mode)")
parser.add_argument("--dcn-slices", type=int, default=1)
parser.add_argument("--run-id", default="sparse_coding_multichip")
args = parser.parse_args()

if args.virtual_devices:
  import os
  os.environ["XLA_FLAGS"] = (
      os.environ.get("XLA_FLAGS", "")
      + f" --xla_force_host_platform_device_count={args.virtual_devices}")
  os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (after the device-count env setup)

if args.virtual_devices:
  jax.config.update("jax_platforms", "cpu")

from vtc_tpu.data.dataset_generation import create_patch_training_set
from vtc_tpu.parallel import make_mesh
from vtc_tpu.training.compiled_epoch import train_dictionary_scanned

PATCH = args.patch
CODE_SIZE = PATCH * PATCH
n_dev = len(jax.devices())
print(f"devices: {n_dev} ({jax.default_backend()})")
mesh = make_mesh(dcn=args.dcn_slices)
print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))

assert args.batch_size % (n_dev // args.dcn_slices * args.dcn_slices) == 0, (
    "global batch must divide evenly across the data axis")

preproc = ["standardize_data_range", "whiten_center_surround", "patch"]
train = create_patch_training_set(
    args.train_size, (PATCH, PATCH), edge_buffer=5, dataset=args.dataset,
    order_of_preproc_ops=preproc, extra_params={"seed": 0})["patches"]
k = train.shape[0] // args.batch_size
batches = train[:k * args.batch_size].reshape(
    k, args.batch_size, CODE_SIZE).astype(np.float32)

rng = np.random.RandomState(0)
d0 = rng.randn(CODE_SIZE, CODE_SIZE).astype(np.float32)
d0 /= np.linalg.norm(d0, axis=1, keepdims=True)

iters_per_epoch = k
params = {
    "mode": "fully-connected",
    "num_epochs": args.epochs,
    "code_inference_algorithm": "fista",
    "inference_param_schedule": {
        0: {"sparsity_weight": 0.008, "num_iters": 25},
        2 * iters_per_epoch: {"sparsity_weight": 0.008, "num_iters": 50}},
    "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
    "dict_update_param_schedule": {
        0: {"stepsize": 0.1, "num_iters": 1}},
    "data_parallel": mesh,
    "shuffle_each_epoch": True,
}
final = np.asarray(train_dictionary_scanned(batches, None, d0, params))
norms = np.linalg.norm(final, axis=1)
print(f"final dictionary {final.shape}, unit-norm: "
      f"{bool(np.allclose(norms, 1.0, atol=1e-4))}")
