"""Compute a PCA dictionary on 8x8 patches (one-shot SVD).

Reference recipe: examples/train_pca.py (note the reference script calls
a stale pre-refactor dataset API -- SURVEY.md section 2.4 item 2; this
one runs).
"""
import _path_setup  # noqa: F401  (repo-checkout import bootstrap)
import argparse
import pickle

import numpy as np

from vtc_tpu.data.dataset_generation import create_patch_training_set
from vtc_tpu.training.pca import train_dictionary
from vtc_tpu.utils import defaults

parser = argparse.ArgumentParser()
parser.add_argument("--dataset", default="synthetic")
parser.add_argument("--num-samples", type=int, default=50_000)
parser.add_argument("--patch", type=int, default=8)
parser.add_argument("--run-id", default="pca_example")
args = parser.parse_args()

train = create_patch_training_set(
    args.num_samples, (args.patch, args.patch), edge_buffer=5,
    dataset=args.dataset,
    order_of_preproc_ops=["standardize_data_range", "patch",
                          "center_each_component"],
    extra_params={"seed": 0})

pca_dictionary = np.asarray(train_dictionary(train["patches"]))
print("PCA dictionary:", pca_dictionary.shape)

logdir = defaults.logging_directory / args.run_id
logdir.mkdir(parents=True, exist_ok=True)
out = logdir / "pca_dictionary.p"
with open(out, "wb") as f:
  pickle.dump(pca_dictionary, f)
print("saved to", out)
