"""Shared rate-distortion machinery for the experiment scripts.

The reference's experiments/ scripts depend on the author's external
EE290T project and an absent utils.quantization module (SURVEY.md
section 2.4 item 4); this module makes the RD pipeline self-contained:
quantize codes -> Huffman run-length entropy coding -> decode ->
reconstruct -> (bits/pixel, pSNR) point.
"""
import numpy as np

from vtc_tpu.utils import jpeg, quantization
from vtc_tpu.utils.plotting import compute_pSNR


def rd_point(train_codes, test_codes, synthesize_fn, test_images,
             binwidths, signal_range):
  """One rate-distortion point.

  Args:
    train_codes: (Dtr, s) codes for Huffman-table training.
    test_codes: (Dte, s) codes to actually compress.
    synthesize_fn: (Dte, s) decoded codes -> (Dte, n) reconstructions.
    test_images: (Dte, n) ground truth.
    binwidths: scalar or (s,) uniform quantization binwidths.
    signal_range: peak-signal range for pSNR.

  Returns:
    dict(rate_bits_per_pixel, psnr_db, l0_fraction)
  """
  from vtc_tpu.utils import native_entropy

  stacked = np.concatenate([train_codes, test_codes], axis=0)
  inds, codebooks, zero_inds = quantization.uniform_quantization(
      stacked, binwidths)
  tr, te = inds[:len(train_codes)], inds[len(train_codes):]
  huff_ac, huff_dc = jpeg.generate_ac_dc_huffman_tables(tr, zero_inds)
  if native_entropy.available():
    # C++ fast path for the rate measurement (bit-identical streams)
    _, block_bits, total_bits = native_entropy.encode_blocks(
        te - zero_inds[None, :], huff_ac, huff_dc)
    total_bits = int(total_bits)
    decoded = te  # encode/decode are exact inverses (tested); skip the
    # per-block python decode and reconstruct from the indices directly
  else:
    total_bits = 0
    decoded = np.zeros_like(te)
    for i in range(te.shape[0]):
      stream = jpeg.generate_jpg_binary_stream(
          te[i], zero_inds, only_get_huffman_symbols=False,
          huffman_table_ac=huff_ac, huffman_table_dc=huff_dc)
      total_bits += len(stream)
      decoded[i] = jpeg.decode_jpg_binary_stream(
          stream, te.shape[1], zero_inds, huff_ac, huff_dc)
  deq = quantization.dequantize(decoded, codebooks)
  recons = np.asarray(synthesize_fn(deq))
  num_pixels = test_images.shape[0] * test_images.shape[1]
  psnr = float(np.mean([
      compute_pSNR(test_images[i], recons[i], manual_sig_mag=signal_range)
      for i in range(test_images.shape[0])]))
  return {
      "rate_bits_per_pixel": total_bits / num_pixels,
      "psnr_db": psnr,
      "l0_fraction": float(np.mean(deq != 0)),
  }


def external_jpeg_rd_curve(test_images, patch_hw, signal_range,
                           qualities=(5, 10, 20, 35, 50, 75, 90)):
  """RD points from a REAL external JPEG encoder (PIL/libjpeg) on the
  same test data -- the external anchor the reference intended via
  ffmpeg (reference experiments/rate_distortion_jpeg.py:225-229, whose
  `quantization.ffmpeg_compute_RD_curve` module is absent upstream).

  The test patches are tiled into one mosaic image per quality level
  (encoding 8x8 patches as individual JPEG files would measure header
  overhead, not coding efficiency), encoded with libjpeg, decoded, and
  scored with the same pSNR/bits-per-pixel accounting as rd_point.
  """
  import io

  from PIL import Image

  ph, pw = patch_hw
  num = test_images.shape[0]
  cols = int(np.ceil(np.sqrt(num)))
  rows = int(np.ceil(num / cols))
  mosaic = np.zeros((rows * ph, cols * pw), np.float64)
  for i in range(num):
    r, c = divmod(i, cols)
    mosaic[r * ph:(r + 1) * ph,
           c * pw:(c + 1) * pw] = test_images[i].reshape(ph, pw)
  # map to the 8-bit domain libjpeg codes in
  lo, hi = mosaic.min(), mosaic.max()
  scale = 255.0 / max(hi - lo, 1e-9)
  img8 = np.clip(np.round((mosaic - lo) * scale), 0, 255).astype(np.uint8)
  points = []
  for q in qualities:
    buf = io.BytesIO()
    Image.fromarray(img8, mode="L").save(buf, format="JPEG", quality=q)
    nbytes = buf.tell()
    buf.seek(0)
    dec = np.asarray(Image.open(buf), np.float64) / scale + lo
    psnrs = []
    for i in range(num):
      r, c = divmod(i, cols)
      rec = dec[r * ph:(r + 1) * ph, c * pw:(c + 1) * pw]
      p = compute_pSNR(test_images[i].reshape(ph, pw), rec,
                       manual_sig_mag=signal_range)
      if p != np.inf:
        psnrs.append(p)
    points.append({
        "rate_bits_per_pixel": 8.0 * nbytes / (num * ph * pw),
        "psnr_db": float(np.mean(psnrs)),
        "l0_fraction": float("nan"),
    })
  return points


def save_rd_curve(points, labels, csv_path, png_path, title):
  """Write an RD curve CSV and a matplotlib PNG."""
  import matplotlib
  matplotlib.use("Agg")
  from matplotlib import pyplot as plt

  with open(csv_path, "w") as f:
    f.write("label,rate_bits_per_pixel,psnr_db,l0_fraction\n")
    for label, pts in zip(labels, points):
      for p in pts:
        f.write(f"{label},{p['rate_bits_per_pixel']:.4f},"
                f"{p['psnr_db']:.3f},{p['l0_fraction']:.4f}\n")
  fig, ax = plt.subplots(figsize=(7, 5))
  for label, pts in zip(labels, points):
    rates = [p["rate_bits_per_pixel"] for p in pts]
    psnrs = [p["psnr_db"] for p in pts]
    ax.plot(rates, psnrs, marker="o", label=label)
  ax.set_xlabel("rate (bits / pixel)")
  ax.set_ylabel("pSNR (dB)")
  ax.set_title(title)
  ax.grid(True, alpha=0.3)
  ax.legend()
  fig.savefig(png_path, dpi=120, bbox_inches="tight")
  plt.close(fig)
