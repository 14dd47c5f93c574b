"""Proximal / thresholding operators used by the shrinkage solvers.

Semantics match the reference implementation's four thresholding branches
(reference: vision_transform_codes/analysis_transforms/fully_connected/
ista_fista.py:107-121) but are written as pure, branch-free jnp expressions
so XLA can fuse them into the surrounding matmul epilogue:

  soft                 prox of lambda*||.||_1              sign(x)*max(|x|-t,0)
  soft + nonnegative   shifted ReLU                        max(x-t, 0)
  hard                 identity outside the zeroed region  x * 1{|x| >= t}
  hard + nonnegative   x * 1{x >= t}   (negatives are always below threshold)

``t`` is sparsity_weight * stepsize.  All four are elementwise (VPU) ops.
"""
import jax.numpy as jnp


def soft_threshold(x, t):
  """Soft threshold: sign(x) * max(|x| - t, 0)."""
  return jnp.sign(x) * jnp.maximum(jnp.abs(x) - t, 0.0)


def soft_threshold_nonneg(x, t):
  """Shifted rectified-linear: max(x - t, 0)."""
  return jnp.maximum(x - t, 0.0)


def hard_threshold(x, t):
  """Zero where |x| < t, identity elsewhere."""
  return jnp.where(jnp.abs(x) < t, 0.0, x)


def hard_threshold_nonneg(x, t):
  """Zero where x < t, identity elsewhere (kills all negatives)."""
  return jnp.where(x < t, 0.0, x)


def group_shrink(grouped_codes, group_norms, t):
  """Block (group) soft threshold used by the subspace solvers.

  Scales every coefficient of a group by max(1 - t/||g||_2, 0), the proximal
  operator of the group-LASSO penalty (reference: subspace_ista_fista.py:
  149-156, including the ``norm==0 -> 1.0`` divide-by-zero guard).

  Args:
    grouped_codes: (b, num_groups, max_group_size) packed group tensor.
    group_norms:   (b, num_groups, 1) l2 norms over the last axis.
    t: scalar threshold = sparsity_weight * stepsize.
  """
  safe_norms = jnp.where(group_norms == 0.0, 1.0, group_norms)
  scale = jnp.maximum(1.0 - t / safe_norms, 0.0)
  return grouped_codes * scale


def select(nonnegative_only: bool, hard: bool):
  """Return the thresholding callable for a (nonneg, hard) flag pair."""
  if hard:
    return hard_threshold_nonneg if nonnegative_only else hard_threshold
  return soft_threshold_nonneg if nonnegative_only else soft_threshold
