"""Loaders for the three curated dataset formats, exercised against
synthetic fixture files in the reference's exact on-disk layouts."""
import pickle

import numpy as np
import pytest

from vtc_tpu.data import dataset_generation as dg


def test_field_nw_mat_loader(rng, tmp_path):
  scipy_io = pytest.importorskip("scipy.io")
  # Field_NW layout: .mat with key 'IMAGESr', shape (h, w, num_images)
  images = rng.randn(64, 64, 3).astype(np.float64)
  path = tmp_path / "unwhitened.mat"
  scipy_io.savemat(path, {"IMAGESr": images})
  out = dg.create_patch_training_set(
      50, (8, 8), edge_buffer=2, dataset="Field_NW",
      order_of_preproc_ops=["standardize_data_range", "patch"],
      extra_params={"filepath": str(path), "seed": 0})
  assert out["patches"].shape == (50, 64)
  assert out["patches"].min() >= 0.0 and out["patches"].max() <= 1.0


def test_van_hateren_h5_loader(rng, tmp_path):
  h5py = pytest.importorskip("h5py")
  # vanHateren layout: .h5 with key 'van_hateren_good', (k, h, w)
  images = rng.rand(2, 48, 48).astype(np.float32)
  path = tmp_path / "curated.h5"
  with h5py.File(path, "w") as f:
    f.create_dataset("van_hateren_good", data=images)
  out = dg.create_patch_training_set(
      30, (8, 8), edge_buffer=2, dataset="vanHateren",
      order_of_preproc_ops=["patch"],
      extra_params={"filepath": str(path), "seed": 0})
  assert out["patches"].shape == (30, 64)


def test_kodak_pickle_loader_and_exclude(rng, tmp_path):
  # Kodak_BW layout: pickled list of uint8 (h, w) arrays
  images = [
      (rng.rand(40, 56) * 255).astype(np.uint8) for _ in range(4)]
  path = tmp_path / "kodak.p"
  with open(path, "wb") as f:
    pickle.dump(images, f)
  out = dg.create_patch_training_set(
      20, (8, 8), edge_buffer=1, dataset="Kodak_BW",
      order_of_preproc_ops=["patch"],
      extra_params={"filepath": str(path), "seed": 0,
                    "exclude": [1, 3]})
  assert out["patches"].shape == (20, 64)
  assert out["patches"].dtype == np.float32


def test_unknown_dataset_raises():
  with pytest.raises(KeyError):
    dg.create_patch_training_set(
        10, (8, 8), 1, "NotADataset", ["patch"], {"filepath": "x"})
