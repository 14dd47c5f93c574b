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


@functools.partial(jax.jit, static_argnames=("num_iters",))
def _update(dictionary, codes, stepsize, num_iters):
  batch = codes.shape[0]
  eye = jnp.eye(codes.shape[1], dtype=dictionary.dtype)

  def body(_, d):
    natural = (codes.T @ jnp.sign(codes) / batch - eye) @ d
    return d + stepsize * natural

  with matmul_precision():
    return jax.lax.fori_loop(0, num_iters, body, dictionary)


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
