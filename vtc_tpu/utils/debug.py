"""Numeric health checks (the TPU-era replacement for the reference's
symeig try/except-with-norm-printout, fully_connected/ista_fista.py:72-79).

On TPU there is no exception to catch when a dictionary overflows -- the
eigensolve just returns inf/nan and training silently corrupts.  The
trainers call ``assert_dictionary_healthy`` at host-boundary events
(checkpoints / visualization), which costs one device sync there and
nothing in the hot loop.  For deeper debugging set the standard
``JAX_DEBUG_NANS=1`` (or jax.config.update('jax_debug_nans', True)).
"""
import numpy as np


def assert_dictionary_healthy(dictionary, where=""):
  """Raise FloatingPointError (with per-element norms, like the
  reference's diagnostic) if the dictionary has nonfinite values."""
  arr = np.asarray(dictionary)
  if np.isfinite(arr).all():
    return
  flat = arr.reshape(arr.shape[0], -1)
  norms = np.linalg.norm(flat, axis=1)
  raise FloatingPointError(
      "dictionary contains nonfinite values{}; per-element norms:\n{}"
      .format(" at " + where if where else "", norms))
