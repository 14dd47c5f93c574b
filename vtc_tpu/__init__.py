"""vtc_tpu: a TPU-native (JAX/XLA/Pallas) framework for vision transform codes.

A ground-up rebuild of the capabilities of spencerkent/vision-transform-codes
(sparse coding, ICA, PCA, JPEG/DCT baselines on image patches) designed for
TPU hardware:

* code-inference solvers (ISTA / FISTA / subspace group variants) are
  ``lax.while_loop`` iterative programs whose inner step runs as one fused
  Pallas kernel resident in VMEM,
* dictionary-update rules are pure jitted functions (no in-place mutation)
  built on MXU matmuls / ``lax.conv_general_dilated``,
* training steps are single compiled programs; data parallelism is a
  ``shard_map`` over a device mesh with ``psum``-reduced dictionary
  gradients and Hessian-diagonal statistics,
* the image-preprocessing pipeline has both a NumPy oracle (bit-parity with
  the original library's semantics) and an on-device XLA path.

Layout:
  ops/                 core numerical engines + Pallas kernels
  analysis_transforms/ code inference (public API mirrors the reference)
  dict_update_rules/   dictionary updates (pure: return the new dictionary)
  training/            trainer orchestration loops
  parallel/            meshes, sharded train steps, collectives
  data/                dataset generation + image processing
  utils/               metrics, plotting, JPEG entropy coding, checkpoints
"""

__version__ = "0.1.0"
