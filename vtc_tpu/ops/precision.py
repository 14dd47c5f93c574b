"""Matmul-precision policy for the numerical core.

On TPU, XLA's default matmul precision feeds bfloat16 operands to the MXU,
which is fine for neural-net training but breaks this library's 1e-4
code-parity contract with the float32 reference (observed ~2e-2 absolute
code error on a v5e with default precision).  All parity-critical matmuls
and convolutions therefore run under an explicit precision policy:

  * default: 'highest' (full float32 via multi-pass bf16 on the MXU)
  * override globally with the VTC_MATMUL_PRECISION env var
    ('highest' | 'float32' | 'tensorfloat32' | 'bfloat16') or per-call
    where ops expose a ``precision`` argument.

Benchmark/throughput paths may deliberately drop to lower precision; the
golden-value tests always pin 'highest'.
"""
import os

import jax

_DEFAULT = os.environ.get("VTC_MATMUL_PRECISION", "highest")


def default_matmul_precision():
  """The library-wide default precision string."""
  return _DEFAULT


def matmul_precision(precision=None):
  """Context manager pinning jax's default matmul precision.

  Use around traced code so every ``@`` / conv inside inherits it.
  """
  return jax.default_matmul_precision(
      _DEFAULT if precision is None else precision)
