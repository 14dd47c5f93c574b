"""Production recipe: fully on-device training pipeline.

Raw images go to HBM once; whitening, random patch extraction, and every
training step run on-device -- the only host work is schedule
orchestration.  Composes data.jax_pipeline.DevicePatchPipeline (whiten +
vmapped patch gather) with training.compiled_epoch (lax.scan segments,
fused Pallas FISTA steps).

  python examples/train_sparse_coding_ondevice.py --steps 2000
"""
import _path_setup  # noqa: F401
import argparse
import time

import numpy as np

import jax

from vtc_tpu.data import dataset_generation as dg
from vtc_tpu.data.jax_pipeline import DevicePatchPipeline
from vtc_tpu.training.compiled_epoch import train_dictionary_scanned

parser = argparse.ArgumentParser()
parser.add_argument("--steps", type=int, default=2000)
parser.add_argument("--batch-size", type=int, default=1024)
parser.add_argument("--patch", type=int, default=16)
parser.add_argument("--num-atoms", type=int, default=256)
parser.add_argument("--num-images", type=int, default=16)
parser.add_argument("--image-dim", type=int, default=512)
parser.add_argument("--precision", default="highest",
                    choices=["highest", "bf16x3", "bf16"],
                    help="training-speed tier: 'bf16x3' (recommended, "
                         "1.40x, tracks f32 quality) or 'bf16' "
                         "(screening, 2x; BENCH_NOTES UPDATE 20)")
args = parser.parse_args()

print("Generating + whitening images on device...")
images = np.stack(dg.generate_synthetic_images(
    args.num_images, args.image_dim, seed=0))
pipe = DevicePatchPipeline(images, (args.patch, args.patch),
                           edge_buffer=5, whiten=True,
                           center_patches=True)

print("Sampling the training epoch on device (no host copies)...")
t0 = time.time()
epoch = pipe.sample_epoch(jax.random.PRNGKey(0),
                          num_batches=args.steps,
                          batch_size=args.batch_size)
val = pipe.sample_epoch(jax.random.PRNGKey(1), num_batches=1,
                        batch_size=args.batch_size)
print(f"  epoch tensor {tuple(epoch.shape)} ready in "
      f"{time.time() - t0:.1f}s")

rng = np.random.RandomState(0)
n = args.patch * args.patch
d0 = rng.randn(args.num_atoms, n).astype(np.float32)
d0 /= np.linalg.norm(d0, axis=1, keepdims=True)

params = {
    "mode": "fully-connected",
    "num_epochs": 1,
    "code_inference_algorithm": "fista",
    "inference_param_schedule": {
        0: {"sparsity_weight": 0.05, "num_iters": 25},
        args.steps // 2: {"sparsity_weight": 0.05, "num_iters": 50}},
    "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
    "dict_update_param_schedule": {
        0: {"stepsize": 0.1, "num_iters": 1}},
    "train_precision": args.precision,
}
t0 = time.time()
final = np.asarray(train_dictionary_scanned(epoch, val, d0, params))
dt = time.time() - t0
patches = args.steps * args.batch_size
print(f"trained on {patches:,} patches in {dt:.1f}s "
      f"({patches / dt:,.0f} patches/s incl. compile)")
print("final dictionary:", final.shape,
      "unit-norm:", bool(np.allclose(
          np.linalg.norm(final, axis=1), 1.0, atol=1e-4)))
