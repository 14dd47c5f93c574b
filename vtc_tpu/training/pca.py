"""PCA dictionary computed in one shot.

API parity with reference training/pca.py:8-39: asserts component means
are ~0, computes the principal directions via SVD -- directly on the data
matrix when the dimensionality exceeds the sample count, otherwise on the
(smaller) covariance matrix -- and returns the transposed basis so each
ROW is a principal direction.  Runs on-device via jnp.linalg.svd.
"""
import jax.numpy as jnp
import numpy as np

from vtc_tpu.ops.precision import matmul_precision


def train_dictionary(image_dataset):
  """Compute the PCA dictionary.

  Args:
    image_dataset: (D, n) float32 array, each column approximately mean
      zero.

  Returns:
    (n, n) array whose rows are the principal directions (sign-invariant;
    the PCA transform is unique only up to per-axis sign flips).
  """
  from vtc_tpu.training.sparse_coding import as_device_array
  data = as_device_array(image_dataset, jnp.float32)
  assert np.all(np.abs(np.asarray(jnp.mean(data, axis=0))) < 1e-4), (
      "components must be (approximately) mean-zero")
  with matmul_precision():
    if data.shape[1] > data.shape[0]:
      # high-dimensional: SVD of the data matrix itself avoids forming a
      # huge covariance
      u, _, _ = jnp.linalg.svd(data.T, full_matrices=False)
    else:
      covar = data.T @ data / data.shape[0]
      u, _, _ = jnp.linalg.svd(covar)
  return u.T
