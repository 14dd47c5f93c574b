// Native JPEG-style entropy-coding core for vtc_tpu.
//
// The TPU does the numerics; the one host-side hot loop in this
// framework is run-length/Huffman entropy coding of quantized codes
// (Huffman-table training scans + per-block bitstream emission over
// datasets of 1e5..1e7 blocks).  This module implements that loop in
// C++ with a C ABI consumed from Python via ctypes
// (vtc_tpu/utils/native_entropy.py); the Python implementation in
// vtc_tpu/utils/jpeg.py remains the reference/fallback and the two are
// bit-identical (tests/test_native_entropy.py).
//
// Conventions match vtc_tpu/utils/jpeg.py: blocks are RECENTERED
// quantization indices (0 == zero codeword); AC symbols are
// run*16 + bitlen with 240 ('f0') = sixteen-zero marker and 0 ('00') =
// end of block; the DC symbol is the DC value's bitlength (0 when the
// DC value is zero); negative values are written as the bitwise
// complement of |v|'s plain binary form.
//
// Build: g++ -O3 -fPIC -shared vtc_entropy.cpp -o libvtc_entropy.so

#include <cstdint>
#include <cstring>

namespace {

inline int bit_length(int64_t magnitude) {
  int len = 0;
  while (magnitude > 0) {
    ++len;
    magnitude >>= 1;
  }
  return len;
}

// value bits in JPEG 1's-complement style; returns the bit count
inline int value_bits(int64_t v, uint64_t* bits) {
  if (v > 0) {
    int len = bit_length(v);
    *bits = static_cast<uint64_t>(v);
    return len;
  }
  if (v < 0) {
    int len = bit_length(-v);
    *bits = (~static_cast<uint64_t>(-v)) & ((1ull << len) - 1ull);
    return len;
  }
  *bits = 0;
  return 0;
}

struct BitWriter {
  uint8_t* buf;
  int64_t capacity_bits;
  int64_t pos;  // bit cursor

  bool put(uint64_t bits, int nbits) {
    if (nbits == 0) return true;
    if (pos + nbits > capacity_bits) return false;
    // MSB-first within the stream
    for (int i = nbits - 1; i >= 0; --i) {
      if ((bits >> i) & 1ull) {
        buf[pos >> 3] |= static_cast<uint8_t>(0x80u >> (pos & 7));
      }
      ++pos;
    }
    return true;
  }
};

// walk one block emitting (symbol, value) pairs through a callback
template <typename EmitAC, typename EmitDC>
inline void walk_block(const int32_t* block, int32_t s, EmitAC&& emit_ac,
                       EmitDC&& emit_dc) {
  int32_t last_nonzero = 0;
  for (int32_t i = s - 1; i >= 1; --i) {
    if (block[i] != 0) {
      last_nonzero = i;
      break;
    }
  }
  int zeros = 0;
  for (int32_t i = 1; i <= last_nonzero; ++i) {
    int64_t v = block[i];
    if (zeros > 15) {
      emit_ac(240, 0);  // 'f0': sixteen zeros
      zeros = 0;
    }
    if (v != 0) {
      uint64_t bits;
      int len = value_bits(v, &bits);
      emit_ac(zeros * 16 + len, v);
      zeros = 0;
    } else {
      ++zeros;
    }
  }
  emit_ac(0, 0);  // EOB
  emit_dc(block[0]);
}

}  // namespace

extern "C" {

// Count AC/DC symbol frequencies over n_blocks blocks of size s.
// ac_counts: 256 entries (run*16+size); dc_counts: 16 entries (bitlen,
// 0 == the '-' zero-DC symbol).
void vtc_count_symbols(const int32_t* codes, int64_t n_blocks, int32_t s,
                       uint64_t* ac_counts, uint64_t* dc_counts) {
  for (int64_t b = 0; b < n_blocks; ++b) {
    const int32_t* block = codes + b * s;
    walk_block(
        block,
        s,
        [&](int sym, int64_t) { ++ac_counts[sym]; },
        [&](int64_t dc) { ++dc_counts[bit_length(dc < 0 ? -dc : dc)]; });
  }
}

// Encode n_blocks blocks into one packed MSB-first bitstream.
// ac_code_bits/lens: 256-entry Huffman table (codeword value + length);
// dc_code_bits/lens: 16-entry table indexed by DC bitlength.
// out_buf must be zeroed; block_bits receives each block's bit count.
// Returns total bits written, or -1 on buffer overflow.
int64_t vtc_encode_blocks(const int32_t* codes, int64_t n_blocks,
                          int32_t s, const uint64_t* ac_code_bits,
                          const uint8_t* ac_code_lens,
                          const uint64_t* dc_code_bits,
                          const uint8_t* dc_code_lens, uint8_t* out_buf,
                          int64_t out_capacity_bytes,
                          int64_t* block_bits) {
  BitWriter writer{out_buf, out_capacity_bytes * 8, 0};
  bool ok = true;
  for (int64_t b = 0; b < n_blocks && ok; ++b) {
    const int64_t block_start = writer.pos;
    const int32_t* block = codes + b * s;
    walk_block(
        block,
        s,
        [&](int sym, int64_t v) {
          ok = ok && writer.put(ac_code_bits[sym], ac_code_lens[sym]);
          uint64_t bits;
          int len = value_bits(v, &bits);
          ok = ok && writer.put(bits, len);
        },
        [&](int64_t dc) {
          uint64_t bits;
          int len = value_bits(dc, &bits);
          ok = ok && writer.put(dc_code_bits[len], dc_code_lens[len]);
          ok = ok && writer.put(bits, len);
        });
    block_bits[b] = writer.pos - block_start;
  }
  return ok ? writer.pos : -1;
}

}  // extern "C"
