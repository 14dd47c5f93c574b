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


def train_dictionary(image_dataset, data_parallel=None):
  """Compute the PCA dictionary.

  Args:
    image_dataset: (D, n) float32 array, each column approximately mean
      zero.
    data_parallel: optional jax.sharding.Mesh; the dataset's sample axis
      is sharded over the mesh's data axes, the (n, n) covariance is one
      psum of per-shard X^T X, and the SVD runs replicated.  (The
      high-dimensional n > D branch stays single-device -- its direct
      data-matrix SVD has no batch-sharded form.)

  Returns:
    (n, n) array whose rows are the principal directions (sign-invariant;
    the PCA transform is unique only up to per-axis sign flips).
  """
  from vtc_tpu.training.sparse_coding import as_device_array

  if data_parallel is not None:
    data_np = np.asarray(image_dataset, np.float32)
    assert np.all(np.abs(data_np.mean(axis=0)) < 1e-4), (
        "components must be (approximately) mean-zero")
    if data_np.shape[1] <= data_np.shape[0]:
      import jax
      from jax.sharding import NamedSharding, PartitionSpec as P

      from vtc_tpu.parallel.mesh import dp_axes
      axes = dp_axes(data_parallel)
      size = 1
      for a in axes:
        size *= data_parallel.shape[a]
      assert data_np.shape[0] % size == 0, (
          f"sample count {data_np.shape[0]} must divide by the DP "
          f"size {size} (trim or pad with mean-zero rows)")

      def shard_cov(shard):
        with matmul_precision():
          return jax.lax.psum(shard.T @ shard, axes)

      cov_fn = jax.jit(jax.shard_map(
          shard_cov, mesh=data_parallel, in_specs=P(axes, None),
          out_specs=P(), check_vma=False))
      data = jax.device_put(
          data_np, NamedSharding(data_parallel, P(axes, None)))
      covar = cov_fn(data) / data_np.shape[0]
      with matmul_precision():
        u, _, _ = jnp.linalg.svd(covar)
      return u.T
    # n > D: fall through to the single-device data-matrix SVD

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
