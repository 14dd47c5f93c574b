"""JPEG-style compression baseline: DCT analysis + uniform quantization
+ Huffman run-length coding, end to end.

Reference recipe: examples/train_jpeg.py -- which does not actually run
in the reference repo (missing sys import, stale module paths, and an
absent utils.quantization module; SURVEY.md section 2.4 item 3).  This
version is self-contained, includes the decode path, and reports rate
and distortion.
"""
import _path_setup  # noqa: F401  (repo-checkout import bootstrap)
import argparse

import numpy as np

from vtc_tpu.analysis_transforms.fully_connected import invertible_linear
from vtc_tpu.data.dataset_generation import create_patch_training_set
from vtc_tpu.utils import jpeg, matrix_zigzag, quantization
from vtc_tpu.utils.plotting import compute_pSNR

parser = argparse.ArgumentParser()
parser.add_argument("--dataset", default="synthetic")
parser.add_argument("--num-train", type=int, default=5000)
parser.add_argument("--num-test", type=int, default=500)
parser.add_argument("--quality-divisor", type=float, default=1.0,
                    help="divide the standard binwidths (higher = finer)")
args = parser.parse_args()

PATCH = 8

# zigzag-ordered DCT dictionary (the reference loads this from a
# pickled file, examples/train_jpeg.py:56-63; we synthesize it)
from vtc_tpu.utils.dct import dct_dictionary_zigzag
dct_dictionary = dct_dictionary_zigzag(PATCH)

data = create_patch_training_set(
    args.num_train + args.num_test, (PATCH, PATCH), edge_buffer=4,
    dataset=args.dataset,
    order_of_preproc_ops=["standardize_data_range", "patch"],
    extra_params={"seed": 0})["patches"] * 255.0  # [0, 255] JPEG range
train, test = data[:args.num_train], data[args.num_train:]

codes_train = np.asarray(invertible_linear.run(
    train, dct_dictionary, orthonormal=True))
codes_test = np.asarray(invertible_linear.run(
    test, dct_dictionary, orthonormal=True))

binwidths = (jpeg.get_jpeg_quant_hifi_binwidths().astype(np.float64)
             / args.quality_divisor)
# quantize train+test against one shared codebook, then split
all_inds, codebooks, zero_inds = quantization.uniform_quantization(
    np.concatenate([codes_train, codes_test]), binwidths)
inds_train, inds_test = all_inds[:args.num_train], all_inds[
    args.num_train:]

huff_ac, huff_dc = jpeg.generate_ac_dc_huffman_tables(
    inds_train, zero_inds)

total_bits = 0
decoded_codes = np.zeros_like(codes_test)
for i in range(args.num_test):
  stream = jpeg.generate_jpg_binary_stream(
      inds_test[i], zero_inds, only_get_huffman_symbols=False,
      huffman_table_ac=huff_ac, huffman_table_dc=huff_dc)
  total_bits += len(stream)
  decoded = jpeg.decode_jpg_binary_stream(
      stream, PATCH * PATCH, zero_inds, huff_ac, huff_dc)
  decoded_codes[i] = quantization.dequantize(decoded[None], codebooks)[0]

recons = decoded_codes @ dct_dictionary  # synthesis
rate_bpp = total_bits / (args.num_test * PATCH * PATCH)
psnr = np.mean([compute_pSNR(test[i], recons[i], manual_sig_mag=255.0)
                for i in range(args.num_test)])
print(f"JPEG baseline: {rate_bpp:.3f} bits/pixel, "
      f"pSNR {psnr:.2f} dB over {args.num_test} test patches")
