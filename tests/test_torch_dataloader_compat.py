"""Migration compatibility: the trainer consumes torch DataLoaders
exactly as reference users pass them (reference
examples/train_sparse_coding.py:83-90)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vtc_tpu.training import sparse_coding as sc


class OneOutputDset(torch.utils.data.Dataset):
  """The reference's no-tuple TensorDataset
  (utils/dataset_generation.py:13-20) as a user would write it."""

  def __init__(self, tensor):
    self.tensor = tensor

  def __getitem__(self, index):
    return self.tensor[index]

  def __len__(self):
    return self.tensor.size(0)


def test_trainer_accepts_torch_dataloader(rng):
  data = rng.randn(96, 32).astype(np.float32)
  loader = torch.utils.data.DataLoader(
      OneOutputDset(torch.from_numpy(data)), batch_size=16,
      shuffle=True, drop_last=True)
  val_loader = torch.utils.data.DataLoader(
      OneOutputDset(torch.from_numpy(data[:32])), batch_size=32)
  d0 = rng.randn(32, 32).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  final = np.asarray(sc.train_dictionary(loader, val_loader, d0, {
      "mode": "fully-connected",
      "num_epochs": 2,
      "code_inference_algorithm": "fista",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 8}},
      "dictionary_update_algorithm": "sc_steepest_descent",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.01, "num_iters": 1}},
  }))
  assert final.shape == (32, 32)
  assert not np.allclose(final, d0)
  np.testing.assert_allclose(np.linalg.norm(final, axis=1), 1.0,
                             atol=1e-4)
