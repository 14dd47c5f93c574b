"""Tiling constants and helpers shared by the Pallas TPU kernels
(ops/pallas_fista.py, ops/pallas_group_fista.py,
ops/pallas_train_step.py): float32 VMEM tiles are 8 sublanes x 128
lanes, so lane-dim sizes pad to 128 and sublane dims to 8."""

LANES = 128
SUBLANES = 8


def round_up(x, m):
  return -(-x // m) * m


def make_threshold(nonneg, hard):
  """Shrinkage/threshold used by every fused LASSO kernel (reference
  thresholds: analysis_transforms/fully_connected/ista_fista.py:120-133).
  Returns f(x, lam_eta); the soft branch is written as x - clip(x)
  (one min/max pair fewer VPU passes than sign(x)*max(|x|-t, 0))."""
  import jax.numpy as jnp

  def threshold(x, lam_eta):
    if hard:
      if nonneg:
        return jnp.where(x < lam_eta, 0.0, x)
      return jnp.where(jnp.abs(x) < lam_eta, 0.0, x)
    if nonneg:
      return jnp.maximum(x - lam_eta, 0.0)
    return x - jnp.clip(x, -lam_eta, lam_eta)

  return threshold


def pick_divisor_batch_tile(b, fits, max_tile=32):
  """Largest batch tile whose working set fits, preferring divisors of
  ``b`` (no padded samples) unless the best divisor is less than half
  the best non-divisor.  ``fits(tile) -> bool`` encodes the caller's
  VMEM model.  Returns None when even tile=1 does not fit."""
  best_div = best_any = None
  for t in range(1, min(b, max_tile) + 1):
    if fits(t):
      best_any = t
      if b % t == 0:
        best_div = t
  if best_div is not None and best_div >= max(1, (best_any or 1) // 2):
    return best_div
  return best_any
