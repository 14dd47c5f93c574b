"""Convolutional ISTA / FISTA sparse inference, TPU-native.

Capability parity with vision_transform_codes/analysis_transforms/
convolutional/ista_fista.py:18-197: strided convolutional synthesis with a
padding mask that ignores reconstruction error in the padded border,
stepsize from the Gram of the flattened kernels, the same threshold
variants, FISTA momentum, warm starts, and early stopping.

The iteration runs inside one jitted ``lax.while_loop``; synthesis /
analysis lower to XLA conv ops on the MXU (see vtc_tpu.ops.convolutions).
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from vtc_tpu.ops import conv_shapes
from vtc_tpu.ops import convolutions as conv_ops
from vtc_tpu.ops import lipschitz as lipschitz_ops
from vtc_tpu.ops import thresholds
from vtc_tpu.ops.precision import matmul_precision
from vtc_tpu.ops.solver import proximal_gradient_loop


def code_spatial_dims(padded_shape, kernel_shape, kernel_stride):
  """(sh, sw) implied by padded image dims, kernel dims, and strides."""
  sh = conv_shapes.code_dim_from_padded_img_dim(
      padded_shape[2], kernel_shape[2], kernel_stride[0])
  sw = conv_shapes.code_dim_from_padded_img_dim(
      padded_shape[3], kernel_shape[3], kernel_stride[1])
  return sh, sw


@functools.partial(
    jax.jit,
    static_argnames=("kernel_stride", "variant", "nonnegative_only",
                     "hard_threshold", "early_stopping_epsilon",
                     "formulation", "padding", "psum_axes"))
def _solve(images_padded, dictionary, mask, sparsity_weight, num_iters,
           stepsize, initial_codes, kernel_stride, variant,
           nonnegative_only, hard_threshold, early_stopping_epsilon,
           formulation="direct", padding=None, psum_axes=None):
  # NOTE: 'direct' default on purpose -- 'gram' requires the STATIC
  # padding dims that produced ``mask`` (run() and the trainers pass
  # them); a gram build with padding=None against a bordered mask would
  # be silently wrong.
  threshold_fn = thresholds.select(nonnegative_only, hard_threshold)

  if formulation == "gram":
    # code-space Gram operator: grad = L(z) - A(mask*X); no image-space
    # fold/unfold inside the iteration (ops/conv_gram.py) -- exact
    from vtc_tpu.ops import conv_gram
    with matmul_precision():
      op = conv_gram.build_gram_operator(
          dictionary, kernel_stride, padding,
          images_padded.shape[2:], initial_codes.shape[2:])
      corr = conv_ops.analyze(mask * images_padded, dictionary,
                              kernel_stride)

    def grad_fn(z):
      return conv_gram.apply_gram(z, op) - corr
  else:

    def grad_fn(z):
      return conv_ops.inference_gradient(
          images_padded, z, dictionary, kernel_stride, mask)

  def prox_fn(x, ss):
    return threshold_fn(x, sparsity_weight * ss)

  with matmul_precision():
    return proximal_gradient_loop(
        grad_fn, prox_fn, initial_codes, stepsize, num_iters,
        variant=variant, early_stopping_epsilon=early_stopping_epsilon,
        psum_axes=psum_axes)


def run(images_padded, dictionary, kernel_stride, padding_dims,
        sparsity_weight, num_iters, variant="fista", initial_codes=None,
        early_stopping_epsilon=None, nonnegative_only=False,
        hard_threshold=False, *,
        stepsize: Optional[jnp.ndarray] = None,
        lipschitz_method: str = "eigvalsh", formulation: str = "gram",
        mxu_precision: str = "highest"):
  """Infer convolutional sparse codes for a batch of padded images.

  Args:
    images_padded: (b, c, h, w) float32, already padded (see
      vtc_tpu.ops.conv_shapes.get_padding_amt).
    dictionary: (s, c, kh, kw) float32 kernels.
    kernel_stride: (stride_v, stride_h).
    padding_dims: ((lead_v, trail_v), (lead_h, trail_h)) or None; the
      reconstruction error inside this border is masked out.
    sparsity_weight, num_iters, variant, initial_codes,
    early_stopping_epsilon, nonnegative_only, hard_threshold: as in the
      fully-connected solver.
    stepsize / lipschitz_method: TPU extensions (precomputed 1/L; exact vs
      power-iteration eigenvalue).
    formulation: 'gram' (default -- exact code-space Gram operator, no
      image-space fold/unfold in the hot loop; ops/conv_gram.py),
      'direct' (the reference's literal synthesize/mask/analyze
      iteration), or 'pallas' (fused VMEM-resident kernel,
      ops/pallas_conv_direct.py / pallas_conv_fista.py -- fastest;
      early stopping runs in-kernel when the batch fits one VMEM
      tile, else falls back to 'gram').
    mxu_precision: MXU tier for the 'pallas' direct kernel's deep-
      contraction matmuls: 'highest' (parity default) | 'bf16x5'
      (5-pass exact-split, near-parity; BENCH_NOTES UPDATE 29) |
      'bf16x3' (3-pass, ~1e-4) | 'default'/'bf16' (single pass,
      screening grade).  The XLA formulations and the gram-kernel fallback
      always run the parity precision (a non-default tier asserts the
      direct kernel supports the geometry rather than silently
      solving slow).

  Returns:
    (b, s, sh, sw) float32 codes.
  """
  assert variant in ("ista", "fista")
  assert formulation in ("gram", "direct", "pallas")
  if mxu_precision == "default":  # accept the inference-tier spelling
    mxu_precision = "bf16"
  assert mxu_precision in ("highest", "bf16x5", "bf16x3", "bf16")
  assert mxu_precision == "highest" or formulation == "pallas", (
      "mxu_precision tiers apply to the 'pallas' formulation only; "
      f"got {mxu_precision!r} with formulation={formulation!r}")
  images_padded = jnp.asarray(images_padded, jnp.float32)
  dictionary = jnp.asarray(dictionary, jnp.float32)
  kernel_stride = tuple(int(x) for x in kernel_stride)
  if stepsize is None:
    flat_kernels = dictionary.reshape(dictionary.shape[0], -1)
    stepsize = lipschitz_ops.fista_stepsize(flat_kernels, lipschitz_method)
  if formulation == "pallas":
    padding_static = (None if padding_dims is None else
                      tuple(tuple(int(x) for x in p)
                            for p in padding_dims))
    from vtc_tpu.ops import pallas_conv_direct
    if pallas_conv_direct.supported(images_padded.shape,
                                    dictionary.shape, kernel_stride) and (
        early_stopping_epsilon is None
        or pallas_conv_direct.early_stop_supported(
            images_padded.shape, dictionary.shape, kernel_stride)):
      # block-matmul direct kernel: deep-contraction matmuls, no
      # border corrections (fastest; non-stride-multiple kernels run
      # zero-extended, see pallas_conv_direct._geometry).  Early
      # stopping runs as an in-kernel while_loop on the batch-global
      # mean |delta|/eta when the batch fits one tile.
      return pallas_conv_direct.conv_direct_solve_pallas(
          images_padded, dictionary, sparsity_weight, num_iters,
          stepsize, kernel_stride=kernel_stride,
          padding=padding_static, initial_codes=initial_codes,
          variant=variant, nonneg=bool(nonnegative_only),
          hard=bool(hard_threshold),
          early_stopping_epsilon=(
              None if early_stopping_epsilon is None
              else float(early_stopping_epsilon)),
          interpret=jax.default_backend() != "tpu",
          mxu_precision=mxu_precision)
    assert mxu_precision == "highest", (
        "mxu_precision tiers need the direct conv kernel; this "
        "geometry/early-stop combination falls back to the gram paths "
        f"(got {mxu_precision!r})")
    if early_stopping_epsilon is None:
      from vtc_tpu.ops.pallas_conv_fista import conv_fista_solve_pallas
      return conv_fista_solve_pallas(
          images_padded, dictionary, sparsity_weight, num_iters, stepsize,
          kernel_stride=kernel_stride, padding=padding_static,
          initial_codes=initial_codes, variant=variant,
          nonneg=bool(nonnegative_only), hard=bool(hard_threshold),
          interpret=jax.default_backend() != "tpu")
    # early stopping across batch tiles needs the cross-tile mean
    # test: XLA gram path
    formulation = "gram"
  sh, sw = code_spatial_dims(
      images_padded.shape, dictionary.shape, kernel_stride)
  if initial_codes is None:
    initial_codes = jnp.zeros(
        (images_padded.shape[0], dictionary.shape[0], sh, sw),
        images_padded.dtype)
  else:
    initial_codes = jnp.asarray(initial_codes, jnp.float32)
    assert initial_codes.shape == (
        images_padded.shape[0], dictionary.shape[0], sh, sw)
  mask = conv_shapes.create_mask(
      images_padded.shape, padding_dims, images_padded.dtype)
  padding_static = (None if padding_dims is None else
                    tuple(tuple(int(x) for x in p) for p in padding_dims))
  return _solve(images_padded, dictionary, mask,
                jnp.asarray(sparsity_weight, jnp.float32),
                jnp.asarray(num_iters, jnp.int32),
                jnp.asarray(stepsize, jnp.float32), initial_codes,
                kernel_stride, variant, bool(nonnegative_only),
                bool(hard_threshold),
                None if early_stopping_epsilon is None
                else float(early_stopping_epsilon),
                formulation=formulation, padding=padding_static)
