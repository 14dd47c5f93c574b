"""ctypes bindings for the native (C++) entropy-coding core.

Builds ``native/vtc_entropy.cpp`` with g++ on first use (cached next to
the source; rebuilt when the source is newer) and exposes:

  count_symbols(recentered) -> (ac_counts dict, dc_counts dict)
  encode_blocks(recentered, huff_ac, huff_dc)
      -> (packed bytes, per-block bit lengths, total bits)

Both are bit-identical to the pure-Python implementations in
vtc_tpu.utils.jpeg (verified in tests/test_native_entropy.py); callers
should fall back to those when ``available()`` is False (no compiler).
"""
import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent.parent.parent / (
    "native/vtc_entropy.cpp")
_LIB_PATH = _SRC.parent / "libvtc_entropy.so"
_lib = None
_load_error = None


def _build():
  cmd = ["g++", "-O3", "-fPIC", "-shared", str(_SRC), "-o",
         str(_LIB_PATH)]
  subprocess.run(cmd, check=True, capture_output=True)


def _load():
  global _lib, _load_error
  if _lib is not None or _load_error is not None:
    return _lib
  try:
    if (not _LIB_PATH.exists()
        or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
      _build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.vtc_count_symbols.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64)]
    lib.vtc_count_symbols.restype = None
    lib.vtc_encode_blocks.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.vtc_encode_blocks.restype = ctypes.c_int64
    _lib = lib
  except Exception as e:  # no compiler / load failure -> fallback path
    _load_error = e
  return _lib


def available() -> bool:
  return _load() is not None


def _as_int32_c(recentered):
  arr = np.ascontiguousarray(recentered, dtype=np.int32)
  assert arr.ndim == 2
  return arr


def count_symbols(recentered):
  """Symbol statistics over (n_blocks, s) recentered indices.

  Returns (ac_counts, dc_counts) as the same hex-string-keyed dicts the
  Python table builder consumes ('-' for the zero-DC symbol).
  """
  lib = _load()
  arr = _as_int32_c(recentered)
  ac = np.zeros(256, np.uint64)
  dc = np.zeros(16, np.uint64)
  lib.vtc_count_symbols(
      arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
      arr.shape[0], arr.shape[1],
      ac.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
      dc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
  ac_counts = {format(i // 16, "x") + format(i % 16, "x"): int(ac[i])
               for i in range(256) if ac[i] > 0}
  dc_counts = {("-" if i == 0 else format(i, "x")): int(dc[i])
               for i in range(16) if dc[i] > 0}
  return ac_counts, dc_counts


def _tables_to_arrays(huff_ac, huff_dc):
  ac_bits = np.zeros(256, np.uint64)
  ac_lens = np.zeros(256, np.uint8)
  for sym, code in huff_ac.items():
    idx = int(sym, 16)
    assert len(code) <= 57, "Huffman codeword too long for the native path"
    ac_bits[idx] = int(code, 2) if code else 0
    ac_lens[idx] = len(code)
  dc_bits = np.zeros(16, np.uint64)
  dc_lens = np.zeros(16, np.uint8)
  for sym, code in huff_dc.items():
    idx = 0 if sym == "-" else int(sym, 16)
    dc_bits[idx] = int(code, 2) if code else 0
    dc_lens[idx] = len(code)
  return ac_bits, ac_lens, dc_bits, dc_lens


def encode_blocks(recentered, huff_ac, huff_dc):
  """Encode (n_blocks, s) recentered indices into one packed bitstream.

  Returns (packed uint8 array, per-block bit lengths int64 array,
  total_bits).  The concatenated bits equal the per-block strings from
  jpeg.generate_jpg_binary_stream joined in order.
  """
  lib = _load()
  arr = _as_int32_c(recentered)
  ac_bits, ac_lens, dc_bits, dc_lens = _tables_to_arrays(huff_ac, huff_dc)
  # worst case per coefficient: longest AC code + 10 value bits
  worst_per_block = (int(ac_lens.max()) + 10) * (arr.shape[1] + 2) + 64
  capacity = (worst_per_block * arr.shape[0]) // 8 + 16
  out = np.zeros(capacity, np.uint8)
  block_bits = np.zeros(arr.shape[0], np.int64)
  total = lib.vtc_encode_blocks(
      arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
      arr.shape[0], arr.shape[1],
      ac_bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
      ac_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      dc_bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
      dc_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      capacity,
      block_bits.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
  assert total >= 0, "native encode buffer overflow"
  return out[:(total + 7) // 8], block_bits, int(total)


def packed_bits_to_string(packed, total_bits):
  """Debug/parity helper: expand the packed stream to a '0'/'1' string."""
  bits = np.unpackbits(packed)[:total_bits]
  return "".join("1" if b else "0" for b in bits)
