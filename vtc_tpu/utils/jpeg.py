"""JPEG-style entropy coding for quantized transform codes.

Capability parity with reference utils/jpeg.py:19-238 -- the standard
luminance quantization binwidths in zigzag order, Huffman table
construction from symbol statistics, the 1's-complement-style coefficient
binarization, and the JPEG run-length/EOB bitstream for one block --
PLUS a decoder (the reference ships encode only), used for roundtrip
tests and the rate-distortion experiments.

Conventions (matching JPEG and the reference):
  * ``assignment_inds`` are nonnegative codebook indices; subtracting the
    per-dimension index of the zero codeword recenters them so 0 means a
    zero coefficient.
  * AC symbols are two hex nibbles "<run><size>": run = number of
    preceding zeros (0-15), size = bit-length of the value.  'f0' encodes
    a run of 16 zeros; '00' is end-of-block.
  * The DC symbol is the hex bit-length of the DC value ('-' if zero).
    DC is coded LAST in the reference's stream layout; we keep that.
"""
import heapq
import itertools
from collections import defaultdict

import numpy as np

from vtc_tpu.utils import matrix_zigzag

# Standard JPEG luminance quantization matrix (Annex K of the standard),
# for data in [0, 255]; rescale for other ranges.
_JPEG_LUMA_QUANT = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]])


def get_jpeg_quant_hifi_binwidths():
  """The 64 recommended binwidths in zigzag order ([0,255]-range data)."""
  return matrix_zigzag.zigzag(_JPEG_LUMA_QUANT)


def compute_huffman_table(symbol_counts):
  """Prefix-free code table {symbol: bitstring} from symbol weights.

  Standard min-heap Huffman construction; ties broken deterministically
  by symbol order so tables are reproducible.
  """
  counter = itertools.count()
  heap = [(weight, next(counter), [(sym, "")])
          for sym, weight in symbol_counts.items()]
  heapq.heapify(heap)
  if len(heap) == 1:
    weight, _, leaves = heap[0]
    return {leaves[0][0]: "0"}
  while len(heap) > 1:
    w0, _, leaves0 = heapq.heappop(heap)
    w1, _, leaves1 = heapq.heappop(heap)
    merged = ([(s, "0" + code) for s, code in leaves0] +
              [(s, "1" + code) for s, code in leaves1])
    heapq.heappush(heap, (w0 + w1, next(counter), merged))
  table = dict(heap[0][2])
  return dict(sorted(table.items(), key=lambda kv: (len(kv[1]), kv)))


def coeff_to_binstr(value: int) -> str:
  """JPEG coefficient binarization: plain binary for positives, bitwise
  complement of |value| for negatives, empty string for zero."""
  if value == 0:
    return ""
  if value > 0:
    return format(value, "b")
  return "".join("1" if b == "0" else "0" for b in format(-value, "b"))


def binstr_to_coeff(bits: str) -> int:
  """Inverse of coeff_to_binstr (nonempty bit strings)."""
  if bits[0] == "1":  # positive values always start with a 1 bit
    return int(bits, 2)
  return -int("".join("1" if b == "0" else "0" for b in bits), 2)


def _runlength_symbols(recentered):
  """(ac_symbols, ac_value_bits, dc_symbol, dc_value_bits) for one block
  of recentered quantization indices (zigzag order, DC first)."""
  last_nonzero = -1
  for i in range(len(recentered) - 1, 0, -1):
    if recentered[i] != 0:
      last_nonzero = i
      break
  ac_symbols, ac_bits = [], []
  zeros = 0
  for idx in range(1, last_nonzero + 1):
    value = int(recentered[idx])
    if zeros > 15:
      ac_symbols.append("f0")  # sixteen-zero marker
      ac_bits.append("")
      zeros = 0
    if value != 0:
      bits = coeff_to_binstr(value)
      ac_symbols.append(format(zeros, "x") + format(len(bits), "x"))
      ac_bits.append(bits)
      zeros = 0
    else:
      zeros += 1
  ac_symbols.append("00")  # end of block
  dc_bits = coeff_to_binstr(int(recentered[0]))
  dc_symbol = "-" if not dc_bits else format(len(dc_bits), "x")
  return ac_symbols, ac_bits, dc_symbol, dc_bits


def generate_ac_dc_huffman_tables(all_assignment_inds,
                                  inds_of_zero_valued_cw,
                                  use_native=True):
  """Build AC and DC Huffman tables from a training set of quantization
  indices.

  Every legal run/size symbol gets at least weight 1 even if unseen in
  training (an unseen symbol at test time would otherwise be uncodable
  and corrupt the stream -- reference utils/jpeg.py:86-101).

  ``use_native`` routes the symbol-counting scan through the C++ core
  (vtc_tpu.utils.native_entropy) when it is available -- bit-identical,
  ~two orders of magnitude faster on large training sets.
  """
  recentered = (np.asarray(all_assignment_inds)
                - np.asarray(inds_of_zero_valued_cw)[None, :])
  if use_native:
    from vtc_tpu.utils import native_entropy
    use_native = native_entropy.available()
  if use_native:
    from vtc_tpu.utils import native_entropy
    ac_native, dc_native = native_entropy.count_symbols(recentered)
    ac_counts = defaultdict(int, ac_native)
    dc_counts = defaultdict(int, dc_native)
  else:
    ac_counts = defaultdict(int)
    dc_counts = defaultdict(int)
    for row in recentered:
      ac_symbols, _, dc_symbol, _ = _runlength_symbols(row)
      for sym in ac_symbols:
        ac_counts[sym] += 1
      dc_counts[dc_symbol] += 1
  for run in range(15):
    for size in range(10):  # AC values need at most 10 bits per the spec
      sym = format(run, "x") + format(size, "x")
      ac_counts.setdefault(sym, 1)
  for size in range(1, 15):  # DC magnitudes up to 255*64
    dc_counts.setdefault(format(size, "x"), 1)
  dc_counts.setdefault("-", 1)
  return compute_huffman_table(ac_counts), compute_huffman_table(dc_counts)


def generate_jpg_binary_stream(assignment_inds, inds_of_zero_valued_cw,
                               only_get_huffman_symbols=True,
                               huffman_table_ac=None,
                               huffman_table_dc=None):
  """Encode one block of quantization indices.

  With only_get_huffman_symbols=True returns (ac_symbols, dc_symbol) for
  table training; otherwise returns the full bitstring:
  [huffman(ac sym) + value bits]* + huffman(EOB) + huffman(dc sym) + dc
  value bits.
  """
  recentered = (np.asarray(assignment_inds)
                - np.asarray(inds_of_zero_valued_cw))
  ac_symbols, ac_bits, dc_symbol, dc_bits = _runlength_symbols(recentered)
  if only_get_huffman_symbols:
    return ac_symbols, dc_symbol
  assert huffman_table_ac is not None and huffman_table_dc is not None
  pieces = []
  for sym, bits in zip(ac_symbols[:-1], ac_bits):
    pieces.append(huffman_table_ac[sym])
    pieces.append(bits)
  pieces.append(huffman_table_ac["00"])
  pieces.append(huffman_table_dc[dc_symbol])
  pieces.append(dc_bits)
  return "".join(pieces)


def decode_jpg_binary_stream(stream, code_size, inds_of_zero_valued_cw,
                             huffman_table_ac, huffman_table_dc):
  """Decode one block back to assignment indices (inverse of
  generate_jpg_binary_stream; the reference ships no decoder)."""
  inv_ac = {v: k for k, v in huffman_table_ac.items()}
  inv_dc = {v: k for k, v in huffman_table_dc.items()}
  recentered = np.zeros(code_size, np.int64)

  pos = 0

  def read_symbol(table):
    nonlocal pos
    for length in range(1, 64):
      cand = stream[pos:pos + length]
      if cand in table:
        pos += length
        return table[cand]
    raise ValueError("undecodable Huffman prefix at bit " + str(pos))

  idx = 1
  while True:
    sym = read_symbol(inv_ac)
    if sym == "00":
      break
    if sym == "f0":
      idx += 16
      continue
    run, size = int(sym[0], 16), int(sym[1], 16)
    idx += run
    bits = stream[pos:pos + size]
    pos += size
    recentered[idx] = binstr_to_coeff(bits)
    idx += 1
  dc_sym = read_symbol(inv_dc)
  if dc_sym != "-":
    size = int(dc_sym, 16)
    recentered[0] = binstr_to_coeff(stream[pos:pos + size])
    pos += size
  return (recentered + np.asarray(inds_of_zero_valued_cw)).astype(
      np.int32)
