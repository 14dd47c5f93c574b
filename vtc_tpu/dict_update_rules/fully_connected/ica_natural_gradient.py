"""ICA natural-gradient dictionary update.

Parity with vision_transform_codes/dict_update_rules/fully_connected/
ica_natural_gradient.py:6-35:

  D <- D + eta * ((codes^T sign(codes) / b) - I) D     (gradient ASCENT)

No images are needed.  Pure: returns the new dictionary.
"""
import functools

import jax
import jax.numpy as jnp
from vtc_tpu.ops.precision import matmul_precision


def _update_from_stat(dictionary, stat, stepsize, num_iters):
  """Ascent iterations from the precomputed batch-mean statistic
  ``stat = codes^T sign(codes) / b`` (constant across iterations -- the
  reference recomputes it from the same codes every iteration, same
  value).  Data parallelism enters here: psum the per-shard SUMS and
  divide by the global batch size, then iterate replicated."""
  eye = jnp.eye(stat.shape[0], dtype=dictionary.dtype)

  def body(_, d):
    return d + stepsize * ((stat - eye) @ d)

  with matmul_precision():
    return jax.lax.fori_loop(0, num_iters, body, dictionary)


@functools.partial(jax.jit, static_argnames=("num_iters",))
def _update(dictionary, codes, stepsize, num_iters):
  with matmul_precision():
    stat = codes.T @ jnp.sign(codes) / codes.shape[0]
  return _update_from_stat(dictionary, stat, stepsize, num_iters)


def run(dictionary, codes, stepsize=0.001, num_iters=1):
  """Natural-gradient ascent steps on a square ICA dictionary.

  Args:
    dictionary: (s, n) (square for ICA).
    codes: (b, s).

  Returns:
    (s, n) updated dictionary.
  """
  return _update(jnp.asarray(dictionary, jnp.float32),
                 jnp.asarray(codes, jnp.float32),
                 jnp.asarray(stepsize, jnp.float32), int(num_iters))
