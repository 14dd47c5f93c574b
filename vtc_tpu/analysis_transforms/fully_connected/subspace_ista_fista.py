"""Subspace (group) ISTA / FISTA sparse inference, TPU-native.

Group-LASSO solver ("Group LCA") with capability parity to
vision_transform_codes/analysis_transforms/fully_connected/
subspace_ista_fista.py:23-192: ragged groups with multi-membership are
packed into a zero-padded (b, num_groups, max_group_size) tensor, a
duplicated "grouped dictionary" (num_groups*max_group_size, n) drives the
gradient, the group-norm shrinkage is applied per group, and duplicated
code values are summed back into a (b, s) tensor at the end.

TPU-native design:
* group packing/unpacking becomes static gather / masked segment-sum index
  arrays computed once per group structure (no Python loops over groups in
  the hot path, deterministic scatter-add),
* the iteration uses the same precomputed-Gram one-matmul formulation as
  the vanilla solver (see ista_fista.py in this package),
* the reference's NotImplementedError paths (hard_threshold=True and
  ret_summed_gduplicates=False, reference lines 152-153 and 191-192) are
  implemented for real here: hard group thresholding zeroes whole groups
  whose norm falls below the threshold, and ret_summed_gduplicates=False
  returns the flattened grouped codes together with the grouped dictionary.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vtc_tpu.ops import lipschitz as lipschitz_ops
from vtc_tpu.ops import thresholds
from vtc_tpu.ops.precision import matmul_precision
from vtc_tpu.ops.solver import proximal_gradient_loop


def pack_group_indices(group_assignments, code_size: int):
  """Static index arrays describing a ragged group structure.

  Returns:
    gather_inds: (G, M) int32, index into the s axis (0 where padded).
    valid_mask:  (G, M) float32, 1.0 for real members, 0.0 for padding.
  with G = len(group_assignments), M = max group size.
  """
  num_groups = len(group_assignments)
  max_gs = max(len(g) for g in group_assignments)
  gather = np.zeros((num_groups, max_gs), dtype=np.int32)
  mask = np.zeros((num_groups, max_gs), dtype=np.float32)
  for g_idx, members in enumerate(group_assignments):
    members = list(members)
    assert all(0 <= m < code_size for m in members)
    gather[g_idx, :len(members)] = members
    mask[g_idx, :len(members)] = 1.0
  return jnp.asarray(gather), jnp.asarray(mask)


def build_grouped_dictionary(dictionary, gather_inds, valid_mask):
  """(G*M, n) dictionary with rows duplicated per group membership and
  zero rows for group padding (reference: subspace_ista_fista.py:106-111)."""
  grouped = dictionary[gather_inds] * valid_mask[:, :, None]
  g, m = gather_inds.shape
  return grouped.reshape(g * m, dictionary.shape[1])


def pack_codes(codes, gather_inds, valid_mask):
  """(b, s) -> (b, G, M) zero-padded group tensor."""
  return codes[:, gather_inds] * valid_mask[None, :, :]


def unpack_codes_summed(grouped_codes, gather_inds, valid_mask, code_size):
  """(b, G, M) -> (b, s), summing duplicated memberships
  (reference: subspace_ista_fista.py:184-190)."""
  b = grouped_codes.shape[0]
  flat_vals = (grouped_codes * valid_mask[None]).reshape(b, -1)
  flat_inds = gather_inds.reshape(-1)
  # Deterministic masked scatter-add: pad-slots all point at index 0 but
  # carry zero values, so they contribute nothing.
  return jax.ops.segment_sum(
      flat_vals.T, flat_inds, num_segments=code_size).T


@functools.partial(
    jax.jit,
    static_argnames=("variant", "hard_threshold", "early_stopping_epsilon",
                     "formulation", "code_size", "ret_summed",
                     "psum_axes"))
def _solve(images, grouped_dictionary, gather_inds, valid_mask,
           sparsity_weight, num_iters, stepsize, init_grouped, variant,
           hard_threshold, early_stopping_epsilon, formulation, code_size,
           ret_summed, psum_axes=None):
  b = images.shape[0]
  g, m = gather_inds.shape

  with matmul_precision():
    grad_fn = prestep_fn = None
    if formulation == "gram":
      gram = grouped_dictionary @ grouped_dictionary.T
      corr = images @ grouped_dictionary.T
      # fold the stepsize into the iteration operator once per solve
      # (same fusion and accumulation-order note as the fc gram path,
      # ista_fista.py): z - eta*(z G - c) == z + z @ (-eta G) + eta c.
      neg_eta_gram = -stepsize * gram
      corr_eta = stepsize * corr

      def prestep_fn(z):
        z2 = z.reshape(b, g * m)
        return (z2 + z2 @ neg_eta_gram + corr_eta).reshape(b, g, m)
    else:

      def grad_fn(z):
        resid = z.reshape(b, g * m) @ grouped_dictionary - images
        return (resid @ grouped_dictionary.T).reshape(b, g, m)

    def prox_fn(x, ss):
      norms = jnp.linalg.norm(x, axis=2, keepdims=True)
      t = sparsity_weight * ss
      if hard_threshold:
        # zero whole groups whose norm is below threshold; identity above
        return jnp.where(norms < t, 0.0, x)
      return thresholds.group_shrink(x, norms, t)

    grouped_codes = proximal_gradient_loop(
        grad_fn, prox_fn, init_grouped, stepsize, num_iters,
        variant=variant, early_stopping_epsilon=early_stopping_epsilon,
        prestep_fn=prestep_fn, psum_axes=psum_axes)
  if ret_summed:
    return unpack_codes_summed(grouped_codes, gather_inds, valid_mask,
                               code_size)
  return grouped_codes.reshape(b, g * m)


def run(images, dictionary, group_assignments, sparsity_weight, num_iters,
        variant="fista", ret_summed_gduplicates=True, initial_codes=None,
        early_stopping_epsilon=None, hard_threshold=False, *,
        stepsize: Optional[jnp.ndarray] = None,
        lipschitz_method: str = "eigvalsh", formulation: str = "gram",
        mxu_precision: str = "highest"):
  """Infer group-sparse codes for a batch of images.

  Args:
    images: (b, n) float32 batch of flattened patches.
    dictionary: (s, n) float32 dictionary.
    group_assignments: list of index lists; groups may overlap and have
      different sizes (see reference docstring, lines 41-49).
    sparsity_weight: scalar lambda on the sum of group norms.
    num_iters: max number of iterations.
    variant: 'ista' or 'fista'.
    ret_summed_gduplicates: if True (default) return (b, s) codes with
      multi-membership duplicates summed.  If False, return a tuple
      (flat_grouped_codes (b, G*M), grouped_dictionary (G*M, n)).
    initial_codes: optional (b, s) warm start (not mutated).
    early_stopping_epsilon / hard_threshold: as in ista_fista.run.
    stepsize / lipschitz_method / formulation / mxu_precision: TPU
      extensions, as in ista_fista.run (mxu_precision applies to the
      'pallas' formulation only).

  Returns:
    (b, s) codes, or the tuple described above.
  """
  assert variant in ("ista", "fista")
  assert formulation in ("gram", "direct", "pallas")
  if mxu_precision == "bf16":  # accept the training-tier spelling too
    mxu_precision = "default"
  assert mxu_precision in ("highest", "bf16x5", "bf16x3", "default")
  images = jnp.asarray(images, jnp.float32)
  dictionary = jnp.asarray(dictionary, jnp.float32)
  code_size = dictionary.shape[0]
  gather_inds, valid_mask = pack_group_indices(group_assignments, code_size)
  grouped_dict = build_grouped_dictionary(dictionary, gather_inds, valid_mask)
  if stepsize is None:
    # Reference takes the top eigenvalue of the *grouped* Gram
    # (subspace_ista_fista.py:115-123).
    stepsize = lipschitz_ops.fista_stepsize(grouped_dict, lipschitz_method)
  if formulation == "pallas":
    from vtc_tpu.ops.pallas_group_fista import (
        group_early_stop_tile_fits, group_fista_solve_pallas,
        membership_matrix)
    g_, m_ = int(gather_inds.shape[0]), int(gather_inds.shape[1])
    if (early_stopping_epsilon is None
        or group_early_stop_tile_fits(images.shape[0], g_ * m_, g_)):
      # build the 0/1 membership operand from the PYTHON group
      # structure: valid_mask is a device constant and run() must stay
      # traceable inside an outer jit (encode.encode_dataset scans it)
      mask_np = np.zeros((g_, m_), np.float32)
      for g_idx, members in enumerate(group_assignments):
        mask_np[g_idx, :len(list(members))] = 1.0
      expand = membership_matrix(g_, m_, mask_np)
      init_flat = None
      if initial_codes is not None:
        init_flat = pack_codes(
            jnp.asarray(initial_codes, jnp.float32), gather_inds,
            valid_mask).reshape(images.shape[0], g_ * m_)
      from vtc_tpu.ops.pallas_train_step import roll_prox_window
      flat_grouped = group_fista_solve_pallas(
          images, grouped_dict, expand, sparsity_weight, num_iters,
          stepsize, initial_grouped=init_flat, variant=variant,
          hard=bool(hard_threshold),
          interpret=jax.default_backend() != "tpu",
          mxu_precision=mxu_precision,
          early_stopping_epsilon=(
              None if early_stopping_epsilon is None
              else float(early_stopping_epsilon)),
          roll_window=roll_prox_window(group_assignments))
      if not ret_summed_gduplicates:
        return flat_grouped, grouped_dict
      grouped = flat_grouped.reshape(
          (images.shape[0],) + gather_inds.shape)
      return unpack_codes_summed(grouped, gather_inds, valid_mask,
                                 code_size)
    # batch exceeds the single-tile early-stop budget: XLA gram path
    formulation = "gram"
  if initial_codes is None:
    init_grouped = jnp.zeros(
        (images.shape[0],) + gather_inds.shape, images.dtype)
  else:
    init_grouped = pack_codes(
        jnp.asarray(initial_codes, jnp.float32), gather_inds, valid_mask)
  out = _solve(
      images, grouped_dict, gather_inds, valid_mask,
      jnp.asarray(sparsity_weight, jnp.float32),
      jnp.asarray(num_iters, jnp.int32), jnp.asarray(stepsize, jnp.float32),
      init_grouped, variant, bool(hard_threshold),
      None if early_stopping_epsilon is None else float(
          early_stopping_epsilon),
      formulation, code_size, bool(ret_summed_gduplicates))
  if ret_summed_gduplicates:
    return out
  return out, grouped_dict
