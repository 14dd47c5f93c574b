"""The package must import and solve WITHOUT torch: production TPU
serving environments don't ship it.  torch is an optional test/compat
dependency only (reference-parity tests, torch-DataLoader compat)."""
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

_SCRIPT = """
import sys

class TorchBlocker:
  def find_module(self, name, path=None):
    if name == "torch" or name.startswith("torch."):
      return self
  def load_module(self, name):
    raise ImportError("torch blocked: " + name)

sys.meta_path.insert(0, TorchBlocker())
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from vtc_tpu.analysis_transforms.fully_connected import ista_fista
from vtc_tpu.dict_update_rules.fully_connected import sc_steepest_descent
from vtc_tpu.training import sparse_coding, ica, pca
from vtc_tpu.data import dataset_generation, image_processing
from vtc_tpu.utils import plotting, jpeg, checkpoint, quantization
from vtc_tpu import encode, api
rng = np.random.RandomState(0)
d = rng.randn(16, 16).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
codes = ista_fista.run(rng.randn(8, 16).astype(np.float32), d, 0.01, 5)
assert np.asarray(codes).shape == (8, 16)
print("TORCH_FREE_OK")
"""


def test_package_runs_without_torch():
  out = subprocess.run(
      [sys.executable, "-c", _SCRIPT], capture_output=True, text=True,
      timeout=600, cwd=str(REPO), check=True)
  assert "TORCH_FREE_OK" in out.stdout, out.stdout + out.stderr
