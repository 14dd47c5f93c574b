"""High-level convenience API: fit / encode / decode in three lines.

The reference exposes only module-level ``run`` functions composed by
trainer scripts; these thin wrappers bundle the common flows for users
who want an estimator-style interface.  Everything delegates to the same
public building blocks (trainers, solvers, update rules) -- no separate
code path.

  coder = SparseCoder(num_atoms=256, sparsity_weight=0.008)
  coder.fit(patches, num_epochs=5)
  codes = coder.encode(patches)          # FISTA
  recon = coder.decode(codes)
"""
import math

import numpy as np

import jax.numpy as jnp


class SparseCoder:
  """Fully-connected sparse coding: dictionary learning + inference."""

  def __init__(self, num_atoms, sparsity_weight=0.01,
               inference_algorithm="fista", inference_iters=50,
               update_algorithm="sc_cheap_quadratic_descent",
               update_stepsize=0.1, formulation="gram", seed=0):
    self.num_atoms = int(num_atoms)
    self.sparsity_weight = float(sparsity_weight)
    self.inference_algorithm = inference_algorithm
    self.inference_iters = int(inference_iters)
    self.update_algorithm = update_algorithm
    self.update_stepsize = float(update_stepsize)
    self.formulation = formulation
    self.seed = seed
    self.dictionary = None

  def fit(self, patches, num_epochs=5, batch_size=250, **extra_params):
    """Learn the dictionary from (D, n) flattened patches."""
    from vtc_tpu.data.dataset_generation import BatchIterator
    from vtc_tpu.training.sparse_coding import train_dictionary

    patches = np.asarray(patches, np.float32)
    rng = np.random.RandomState(self.seed)
    if self.dictionary is None:
      d0 = rng.randn(self.num_atoms, patches.shape[1]).astype(
          np.float32)
      d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
    else:
      d0 = np.asarray(self.dictionary)
    params = {
        "mode": "fully-connected",
        "num_epochs": int(num_epochs),
        "code_inference_algorithm": self.inference_algorithm,
        "inference_param_schedule": {
            0: {"sparsity_weight": self.sparsity_weight,
                "num_iters": self.inference_iters}},
        "dictionary_update_algorithm": self.update_algorithm,
        "dict_update_param_schedule": {
            0: {"stepsize": self.update_stepsize, "num_iters": 1}},
        "fc_formulation": self.formulation,
        "stdout_print_interval": 10**9,
    }
    params.update(extra_params)
    val = patches[:min(len(patches), 4 * batch_size)]
    self.dictionary = train_dictionary(
        BatchIterator(patches, batch_size, seed=self.seed),
        BatchIterator(val, min(len(val), 4 * batch_size),
                      shuffle=False, drop_last=False),
        d0, params)
    return self

  def encode(self, patches, num_iters=None, batch_size=None, **kwargs):
    """(D, n) patches -> (D, s) sparse codes.

    With ``batch_size`` set, encoding runs through the batched /
    streamed / compiled serving path (vtc_tpu.encode.encode_dataset):
    one compiled scan per chunk, double-buffered host<->device
    transfers, optional ``data_parallel`` mesh kwarg -- use this for
    datasets larger than device memory."""
    from vtc_tpu.analysis_transforms.fully_connected import ista_fista
    assert self.dictionary is not None, "call fit() first"
    variant = ("fista" if self.inference_algorithm == "fista"
               else "ista")
    iters = self.inference_iters if num_iters is None else num_iters
    if batch_size is not None:
      from vtc_tpu.encode import encode_dataset
      return encode_dataset(
          np.asarray(patches, np.float32), self.dictionary,
          self.sparsity_weight, iters, batch_size=int(batch_size),
          variant=variant, formulation=self.formulation, **kwargs)
    return ista_fista.run(
        np.asarray(patches, np.float32), self.dictionary,
        self.sparsity_weight, iters, variant=variant,
        formulation=self.formulation, **kwargs)

  def decode(self, codes):
    """(D, s) codes -> (D, n) reconstructions."""
    assert self.dictionary is not None, "call fit() first"
    return jnp.asarray(codes) @ self.dictionary


class ICACoder:
  """Square ICA dictionary: fit via natural gradient, exact codes."""

  def __init__(self, stepsize=0.01, seed=0):
    self.stepsize = float(stepsize)
    self.seed = seed
    self.dictionary = None

  def fit(self, patches, num_epochs=5, batch_size=250, **extra_params):
    from vtc_tpu.data.dataset_generation import BatchIterator
    from vtc_tpu.training.ica import train_dictionary

    patches = np.asarray(patches, np.float32)
    n = patches.shape[1]
    rng = np.random.RandomState(self.seed)
    d0 = (np.linalg.qr(rng.standard_normal((n, n)))[0]
          .astype(np.float32)) if self.dictionary is None else (
              np.asarray(self.dictionary))
    params = {
        "num_epochs": int(num_epochs),
        "dictionary_update_algorithm": "ica_natural_gradient",
        "dict_update_param_schedule": {
            0: {"stepsize": self.stepsize, "num_iters": 1}},
        "stdout_print_interval": 10**9,
    }
    params.update(extra_params)
    self.dictionary = train_dictionary(
        BatchIterator(patches, batch_size, seed=self.seed), d0, params)
    return self

  def encode(self, patches):
    from vtc_tpu.analysis_transforms.fully_connected import (
        invertible_linear)
    return invertible_linear.run(
        np.asarray(patches, np.float32), self.dictionary)

  def decode(self, codes):
    return jnp.asarray(codes) @ self.dictionary


class PCACoder:
  """PCA dictionary with optional dimensionality truncation."""

  def __init__(self, num_components=None):
    self.num_components = num_components
    self.dictionary = None
    self.component_means = None

  def fit(self, patches):
    from vtc_tpu.training.pca import train_dictionary

    patches = np.asarray(patches, np.float32)
    self.component_means = patches.mean(axis=0)
    full = np.asarray(train_dictionary(patches - self.component_means))
    k = self.num_components or full.shape[0]
    self.dictionary = full[:k]
    return self

  def encode(self, patches):
    centered = np.asarray(patches, np.float32) - self.component_means
    return centered @ np.asarray(self.dictionary).T

  def decode(self, codes):
    return (np.asarray(codes) @ np.asarray(self.dictionary)
            + self.component_means)
