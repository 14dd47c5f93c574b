"""Shared machinery for the subspace (grouped) dictionary update rules:
the within-group anti-alignment regularization gradient.

The penalty is the sum of unsigned pairwise cosine similarities of
dictionary elements within each group; its gradient w.r.t. element i of a
group is

  sum_j sign(cos_ij) * (phi_j / (||phi_i|| ||phi_j||)
                        - cos_ij * phi_i / ||phi_i||^2)

which reduces, for unit-norm dictionaries, to
``sum_j sign(cos_ij) * (phi_j - cos_ij phi_i)`` (reference:
dict_update_rules/fully_connected/subspace_sc_cheap_quadratic_descent.py:
91-127).  Elements in several groups accumulate a contribution from each
group (reference lines 66-70).

TPU-native formulation: groups are packed into static (G, M) gather /
mask index arrays (see analysis_transforms.fully_connected.
subspace_ista_fista.pack_group_indices); the per-group pairwise math runs
batched under ``vmap`` and the accumulation back to (s, n) is a masked
deterministic segment-sum -- no Python loop over groups in the hot path.
Zero-padded slots have zero rows, hence zero cosines, hence sign()==0 and
they contribute nothing (padding norms are guarded to 1 to avoid 0/0).
"""
import jax
import jax.numpy as jnp
from vtc_tpu.ops.precision import matmul_precision


def alignment_regularization_gradients(dictionary, gather_inds, valid_mask,
                                       dict_is_normalized: bool):
  """Accumulated anti-alignment gradients, shape (s, n).

  Args:
    dictionary: (s, n).
    gather_inds: (G, M) int32 group membership indices (0 where padded).
    valid_mask: (G, M) float32 1/0 validity mask.
    dict_is_normalized: use the simplified unit-norm expression.
  """
  code_size = dictionary.shape[0]
  with matmul_precision():
    # (G, M, n) packed group members, zeroed padding rows
    packed = dictionary[gather_inds] * valid_mask[:, :, None]

    def per_group(dg, mask_g):
      # dg: (M, n), mask_g: (M,)
      inner = dg @ dg.T  # (M, M)
      if dict_is_normalized:
        cos = inner
        axis0 = cos[:, :, None] * dg[:, None, :]          # cos_ij * phi_i
        axis1 = jnp.broadcast_to(dg[None, :, :], axis0.shape)  # phi_j
      else:
        norms = jnp.linalg.norm(dg, axis=1, keepdims=True)
        norms = jnp.where(mask_g[:, None] > 0, norms, 1.0)
        norm_outer = norms @ norms.T
        cos = inner / norm_outer
        axis0 = (cos / (norms**2))[:, :, None] * dg[:, None, :]
        axis1 = dg[None, :, :] / norm_outer[:, :, None]
      grads = jnp.sign(cos)[:, :, None] * (axis1 - axis0)
      return jnp.sum(grads, axis=1)  # (M, n)

    group_grads = jax.vmap(per_group)(packed, valid_mask)  # (G, M, n)
    group_grads = group_grads * valid_mask[:, :, None]
    flat = group_grads.reshape(-1, dictionary.shape[1])
    return jax.ops.segment_sum(
        flat, gather_inds.reshape(-1), num_segments=code_size)
