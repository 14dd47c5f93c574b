"""Data pipeline: image preprocessing and patch-dataset generation.

Two paths with identical semantics:
  * image_processing / dataset_generation -- host-side NumPy, mirroring
    the reference's preprocessing ops (and serving as the golden oracle),
  * jax_pipeline -- the same ops on-device (jnp.fft whitening, vmapped
    dynamic-slice patch extraction) so patch batches stream host->HBM
    with no Python in the training loop.
"""
