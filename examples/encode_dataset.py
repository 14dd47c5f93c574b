"""Encode a large patch dataset with a trained dictionary (serving).

The production inference flow: load (or quickly train) a dictionary,
then push the whole dataset through `vtc_tpu.encode.encode_dataset` --
one compiled scan of the fused Pallas solve kernel per chunk of
batches, double-buffered host<->device transfers, optional multi-chip
sharding.  The reference performs this as one giant single-device
solver call (experiments/rate_distortion_sparse_coding.py:742-751).

  python examples/encode_dataset.py --num-patches 200000
  python examples/encode_dataset.py --checkpoint <dir>/checkpoint_dictionary_iter_N
"""
import _path_setup  # noqa: F401  (repo-checkout import bootstrap)
import argparse
import time

import numpy as np

from vtc_tpu.data.dataset_generation import create_patch_training_set
from vtc_tpu.encode import encode_dataset

parser = argparse.ArgumentParser()
parser.add_argument("--dataset", default="synthetic")
parser.add_argument("--checkpoint", default=None,
                    help="path to a saved dictionary checkpoint; "
                         "trains a quick one when omitted")
parser.add_argument("--num-patches", type=int, default=200_000)
parser.add_argument("--patch", type=int, default=16)
parser.add_argument("--num-atoms", type=int, default=256)
parser.add_argument("--sparsity-weight", type=float, default=0.008)
parser.add_argument("--num-iters", type=int, default=100)
parser.add_argument("--batch-size", type=int, default=2048)
parser.add_argument("--chunk-batches", type=int, default=16)
parser.add_argument("--data-parallel", action="store_true",
                    help="shard each batch over the default device mesh")
parser.add_argument("--out", default=None,
                    help="optional .npy path for the codes")
args = parser.parse_args()

patch_dims = (args.patch, args.patch)
print(f"generating {args.num_patches} whitened {args.patch}x"
      f"{args.patch} patches from '{args.dataset}'...")
train = create_patch_training_set(
    args.num_patches, patch_dims, edge_buffer=5, dataset=args.dataset,
    order_of_preproc_ops=[
        "standardize_data_range", "whiten_center_surround", "patch"],
    extra_params={"seed": 0})
patches = np.asarray(train["patches"]).reshape(
    -1, args.patch * args.patch).astype(np.float32)

if args.checkpoint is not None:
  from vtc_tpu.utils.checkpoint import load_dictionary_checkpoint
  dictionary = load_dictionary_checkpoint(args.checkpoint)
  print(f"loaded dictionary {dictionary.shape} from {args.checkpoint}")
else:
  print("no checkpoint given; training a quick dictionary (2 epochs)...")
  from vtc_tpu.training.compiled_epoch import train_dictionary_scanned
  rng = np.random.RandomState(0)
  d0 = rng.randn(args.num_atoms, patches.shape[1]).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  k = min(400, patches.shape[0] // 250)
  dictionary = np.asarray(train_dictionary_scanned(
      patches[:k * 250].reshape(k, 250, -1), patches[None, :250],
      d0, {
          "mode": "fully-connected", "num_epochs": 2,
          "code_inference_algorithm": "fista",
          "inference_param_schedule": {
              0: {"sparsity_weight": args.sparsity_weight,
                  "num_iters": 25}},
          "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
          "dict_update_param_schedule": {
              0: {"stepsize": 0.1, "num_iters": 1}}}))

mesh = None
if args.data_parallel:
  from vtc_tpu import parallel
  mesh = parallel.make_mesh()
  print(f"sharding batches over mesh {dict(mesh.shape)}")

print(f"encoding {patches.shape[0]} patches "
      f"(batch {args.batch_size}, chunks of {args.chunk_batches})...")
t0 = time.time()
codes = encode_dataset(
    patches, dictionary, args.sparsity_weight, args.num_iters,
    batch_size=args.batch_size, chunk_batches=args.chunk_batches,
    data_parallel=mesh)
dt = time.time() - t0
density = float((np.abs(codes) > 0).mean())
recon = codes @ np.asarray(dictionary)
mse = float(np.mean((recon - patches) ** 2))
print(f"encoded in {dt:.2f}s -> {patches.shape[0] / dt:,.0f} patches/s "
      f"(code density {100 * density:.2f}%, recon MSE {mse:.5f})")
if args.out:
  np.save(args.out, codes)
  print("codes saved to", args.out)
