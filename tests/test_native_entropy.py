"""Native (C++) entropy coder vs the pure-Python reference: bit-exact."""
import numpy as np
import pytest

from vtc_tpu.utils import jpeg, native_entropy, quantization

pytestmark = pytest.mark.skipif(
    not native_entropy.available(),
    reason="no C++ toolchain available to build the native coder")


def _blocks(rng, n=200, s=64):
  data = rng.randn(n, s) * 20
  data[:, 16:] *= 0.05
  binwidths = jpeg.get_jpeg_quant_hifi_binwidths() / 2.0
  inds, codebooks, zero_inds = quantization.uniform_quantization(
      data, binwidths[:s])
  recentered = inds - zero_inds[None, :]
  return inds, recentered, zero_inds


def test_symbol_counts_match_python(rng):
  inds, recentered, zero_inds = _blocks(rng)
  ac_native, dc_native = native_entropy.count_symbols(recentered)
  # python counts
  from collections import defaultdict
  ac_py, dc_py = defaultdict(int), defaultdict(int)
  for row in inds:
    syms, dc_sym = jpeg.generate_jpg_binary_stream(
        row, zero_inds, only_get_huffman_symbols=True)
    for sym in syms:
      ac_py[sym] += 1
    dc_py[dc_sym] += 1
  assert ac_native == dict(ac_py)
  assert dc_native == dict(dc_py)


def test_encoded_bits_match_python(rng):
  inds, recentered, zero_inds = _blocks(rng, n=64)
  huff_ac, huff_dc = jpeg.generate_ac_dc_huffman_tables(inds, zero_inds)
  packed, block_bits, total = native_entropy.encode_blocks(
      recentered, huff_ac, huff_dc)
  native_str = native_entropy.packed_bits_to_string(packed, total)
  py_streams = [jpeg.generate_jpg_binary_stream(
      inds[i], zero_inds, only_get_huffman_symbols=False,
      huffman_table_ac=huff_ac, huffman_table_dc=huff_dc)
      for i in range(inds.shape[0])]
  assert native_str == "".join(py_streams)
  assert [len(s) for s in py_streams] == block_bits.tolist()
  # and the native stream decodes back to the original indices
  pos = 0
  for i, nbits in enumerate(block_bits):
    segment = native_str[pos:pos + nbits]
    pos += nbits
    decoded = jpeg.decode_jpg_binary_stream(
        segment, inds.shape[1], zero_inds, huff_ac, huff_dc)
    np.testing.assert_array_equal(decoded, inds[i])


def test_native_is_faster_on_big_batches(rng):
  import time
  inds, recentered, zero_inds = _blocks(rng, n=3000)
  huff_ac, huff_dc = jpeg.generate_ac_dc_huffman_tables(
      inds[:200], zero_inds)
  t0 = time.time()
  native_entropy.encode_blocks(recentered, huff_ac, huff_dc)
  native_dt = time.time() - t0
  t0 = time.time()
  for i in range(inds.shape[0]):
    jpeg.generate_jpg_binary_stream(
        inds[i], zero_inds, only_get_huffman_symbols=False,
        huffman_table_ac=huff_ac, huffman_table_dc=huff_dc)
  python_dt = time.time() - t0
  assert native_dt < python_dt  # typically 50-500x
