"""Scalar quantization for transform codes.

The reference's JPEG example and rate-distortion experiments import a
``utils.quantization`` module that does NOT exist in its repo (it lived
in the author's external EE290T project -- SURVEY.md section 2.4 items
3-4).  This module provides the missing piece self-contained:

  * uniform scalar quantization with per-dimension binwidths (the JPEG
    case: binwidths from the hi-fi table, scaled to the data range),
  * codebook form: assignment indices + the index of the zero codeword
    per dimension, exactly what the JPEG entropy coder consumes,
  * dequantization (codeword lookup).
"""
import numpy as np


def uniform_quantization(data, binwidths, return_codebook=True):
  """Quantize each column of (D, s) data with its own uniform binwidth.

  Bins are centered on multiples of the binwidth (midtread), so 0.0 is
  always exactly representable -- required by JPEG-style run-length
  coding of zero runs.

  Returns:
    assignment_inds: (D, s) int32 indices into each dimension's codebook
      (nonnegative; 0 is the most negative codeword).
    codebooks: list of s 1-d arrays of codeword values.
    inds_of_zero_codeword: (s,) int32 index of the exactly-zero codeword
      in each dimension.
  """
  data = np.asarray(data)
  binwidths = np.broadcast_to(np.asarray(binwidths, np.float64),
                              (data.shape[1],))
  signed_assignments = np.round(data / binwidths[None, :]).astype(np.int64)
  min_inds = signed_assignments.min(axis=0)
  min_inds = np.minimum(min_inds, 0)  # ensure zero is inside the range
  max_inds = np.maximum(signed_assignments.max(axis=0), 0)
  assignment_inds = (signed_assignments - min_inds[None, :]).astype(
      np.int32)
  if not return_codebook:
    return assignment_inds
  codebooks = [
      (np.arange(min_inds[i], max_inds[i] + 1) * binwidths[i]).astype(
          np.float32)
      for i in range(data.shape[1])]
  inds_of_zero = (-min_inds).astype(np.int32)
  return assignment_inds, codebooks, inds_of_zero


def dequantize(assignment_inds, codebooks):
  """Invert uniform_quantization: look up codeword values."""
  assignment_inds = np.asarray(assignment_inds)
  out = np.zeros(assignment_inds.shape, np.float32)
  for dim, codebook in enumerate(codebooks):
    out[:, dim] = codebook[assignment_inds[:, dim]]
  return out
