"""Orthonormal 2-D DCT-II dictionaries in zigzag row order.

The reference ships this as a pickled 64x64 matrix
(utils/dct_matrix_8x8_zigzag_ordering.p); here it is synthesized
analytically for any patch size, so there is no binary data dependency.
Rows are (u, v) frequency pairs ordered by the JPEG zigzag scan --
row 0 is DC, exactly the layout JPEG quantization tables expect.
"""
import numpy as np

from vtc_tpu.utils import matrix_zigzag


def dct_dictionary_zigzag(patch_size: int = 8) -> np.ndarray:
  """(p*p, p*p) float32 orthonormal DCT-II synthesis dictionary.

  ``codes @ D`` reconstructs flattened patches; ``X @ D.T`` analyzes
  (D is orthonormal, so the transpose is the exact inverse).
  """
  p = patch_size
  k = np.arange(p)
  basis_1d = np.cos(np.pi * (k[:, None] + 0.5) * k[None, :] / p)
  basis_1d[:, 0] *= 1.0 / np.sqrt(2.0)
  basis_1d *= np.sqrt(2.0 / p)
  # row = (u, v) frequency pair, column = (i, j) pixel
  full = np.einsum("iu,jv->uvij", basis_1d, basis_1d).reshape(
      p * p, p * p)
  order = matrix_zigzag.zigzag(np.arange(p * p).reshape(p, p))
  return full[order].astype(np.float32)
