"""Exact code-space Gram operator for convolutional sparse inference.

The conv FISTA gradient is ``A(mask*(S(z) - X))`` (reference
conv/ista_fista.py:152-155): synthesize to image space, mask the padded
border, analyze back.  Image space is pure data movement -- measured
~50x the matmul FLOP cost per iteration on v5e -- so this module
eliminates it: ``L(z) = A(mask*S(z))`` is a LINEAR operator on codes
whose kernel couples only code positions whose tiles overlap (offsets
|dy| <= (kh-1)//stride_v etc.), i.e. a small "conv" over code space
with an (s, s) channel mix per offset.

The padding mask enters LINEARLY, and it is separable
(mask = rowmask x colmask), so with m = 1 - mbar per dimension:

  W(p) = (1 - mbar_r) x (1 - mbar_c)
       = 1 - mbar_r x 1 - 1 x mbar_c + mbar_r x mbar_c

and therefore, exactly,

  L = L_interior - L_rows - L_cols + L_corners

where L_interior is translation-invariant (9 offset matrices G_I for a
2x-overlapping kernel), and the row/col/corner corrections act only on
the handful of code rows/columns whose tiles touch the masked border
(the "special" positions).  Everything is MXU matmuls; per iteration the
whole gradient is 4 einsums over stacked offset tensors plus cheap
shifted views.

Exactness (vs ops/convolutions.inference_gradient) is tested to float
tolerance in tests/test_conv_gram.py for odd strides, paddings, and
kernel sizes, including kernel % stride != 0.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from vtc_tpu.ops.precision import matmul_precision


def _overlap_range(k, shift):
  """Tile-p pixel rows that overlap tile p+offset (offset*stride = shift)."""
  return max(0, shift), min(k, k + shift)


def _special_positions(num_positions, stride, kernel, lead, trail, size):
  """Code positions whose tiles touch the masked border, with the
  in-tile masked-pixel indicator for each."""
  specials, masks = [], []
  for p in range(num_positions):
    start = p * stride
    m = np.zeros(kernel, np.float32)
    for r in range(kernel):
      pix = start + r
      if pix < lead or pix >= size - trail:
        m[r] = 1.0
    if m.any():
      specials.append(p)
      masks.append(m)
  return specials, masks


def build_gram_operator(dictionary, kernel_stride, padding, padded_hw,
                        code_hw):
  """Precompute the offset matrices of L(z) = A(mask*S(z)).

  Args:
    dictionary: (s, c, kh, kw) kernels (the matrices are differentiable
      functions of it -- rebuild per solve; a few small matmuls).
    kernel_stride: (sv, sh).
    padding: ((lead_v, trail_v), (lead_h, trail_h)) or None.
    padded_hw: (H, W) of the padded images.
    code_hw: (sh, sw) code spatial dims.

  Returns:
    dict of arrays consumed by apply_gram (static structure per shape).
  """
  s, _, kh, kw = dictionary.shape
  sv, sh_ = kernel_stride
  height, width = padded_hw
  code_h, code_w = code_hw
  ry = (kh - 1) // sv
  rx = (kw - 1) // sh_
  offs_y = list(range(-ry, ry + 1))
  offs_x = list(range(-rx, rx + 1))

  if padding is None:
    (lead_v, trail_v), (lead_h, trail_h) = (0, 0), (0, 0)
  else:
    (lead_v, trail_v), (lead_h, trail_h) = padding
  spec_py, mrow = _special_positions(code_h, sv, kh, lead_v, trail_v,
                                     height)
  spec_px, mcol = _special_positions(code_w, sh_, kw, lead_h, trail_h,
                                     width)
  mrow = np.stack(mrow) if spec_py else np.zeros((0, kh), np.float32)
  mcol = np.stack(mcol) if spec_px else np.zeros((0, kw), np.float32)

  def gram(weight_rows, weight_cols):
    """Offset matrices (O, s, s) weighted by in-tile-p pixel weights.

    weight_rows: (kh,) or None; weight_cols: (kw,) or None.
    Result[o][i, j] = sum_{r,c,ch} w_r[r] w_c[c] D[i,ch,r,c]
                                   D[j,ch,r - dy*sv, c - dx*sh].
    """
    mats = []
    for dy in offs_y:
      r0, r1 = _overlap_range(kh, dy * sv)
      for dx in offs_x:
        c0, c1 = _overlap_range(kw, dx * sh_)
        if r0 >= r1 or c0 >= c1:
          mats.append(jnp.zeros((s, s), jnp.float32))
          continue
        a = dictionary[:, :, r0:r1, c0:c1]
        if weight_rows is not None:
          a = a * weight_rows[r0:r1][None, None, :, None]
        if weight_cols is not None:
          a = a * weight_cols[c0:c1][None, None, None, :]
        b = dictionary[:, :, r0 - dy * sv:r1 - dy * sv,
                       c0 - dx * sh_:c1 - dx * sh_]
        mats.append(a.reshape(s, -1) @ b.reshape(s, -1).T)
    return jnp.stack(mats)  # (O, s, s)

  with matmul_precision():
    g_int = gram(None, None)
    g_rows = (jnp.stack([gram(jnp.asarray(m), None) for m in mrow])
              if spec_py else jnp.zeros((0,) + g_int.shape))
    g_cols = (jnp.stack([gram(None, jnp.asarray(m)) for m in mcol])
              if spec_px else jnp.zeros((0,) + g_int.shape))
    g_corners = (jnp.stack([
        jnp.stack([gram(jnp.asarray(mr), jnp.asarray(mc)) for mc in mcol])
        for mr in mrow]) if (spec_py and spec_px)
        else jnp.zeros((0, 0) + g_int.shape))

  return {
      "g_int": g_int, "g_rows": g_rows, "g_cols": g_cols,
      "g_corners": g_corners,
      "spec_py": tuple(spec_py), "spec_px": tuple(spec_px),
      "ry": ry, "rx": rx, "code_hw": (code_h, code_w),
  }


def apply_gram(z, op, interior="conv"):
  """L(z) for codes z (b, s, sh, sw) given build_gram_operator output.

  interior: 'conv' (default -- the translation-invariant part as ONE
  lax.conv with an (s, s, 2ry+1, 2rx+1) channel-mix kernel; border
  corrections gather only the special rows/columns, so no full shifted
  stack is materialized) or 'einsum' (the stacked-shifted-views
  contraction; corrections sliced from the stack).  Identical results
  to float tolerance (tests/test_conv_gram.py).
  """
  b, s, code_h, code_w = z.shape
  ry, rx = op["ry"], op["rx"]
  spec_py = np.asarray(op["spec_py"], np.int32)
  spec_px = np.asarray(op["spec_px"], np.int32)
  offs = [(dy, dx) for dy in range(-ry, ry + 1)
          for dx in range(-rx, rx + 1)]

  with matmul_precision():
    if interior == "conv":
      # out[b,i,y,x] = sum_{dy,dx,j} g[o,i,j] z[b,j,y+dy,x+dx]: a
      # correlation with kernel W[i,j,ry+dy,rx+dx] = g_int[o,i,j] --
      # a dense (s x s)-channel-mix conv XLA tiles well on the MXU
      kernel = op["g_int"].reshape(2 * ry + 1, 2 * rx + 1, s,
                                   s).transpose(2, 3, 0, 1)
      out = jax.lax.conv_general_dilated(
          z, kernel, window_strides=(1, 1),
          padding=((ry, ry), (rx, rx)),
          dimension_numbers=("NCHW", "OIHW", "NCHW"))
      need_pad = len(spec_py) or len(spec_px)
      zp = (jnp.pad(z, ((0, 0), (0, 0), (ry, ry), (rx, rx)))
            if need_pad else None)
      # thin corrections: the special positions are STATIC, so every
      # extraction below is a static slice (no XLA gather -- gathers
      # measured ~2x the whole step cost on v5e)
      if len(spec_py):
        rows = jnp.stack([
            jnp.stack([zp[:, :, p + ry + dy, rx + dx:rx + dx + code_w]
                       for p in op["spec_py"]], axis=2)
            for dy, dx in offs])                 # (O, b, j, P, w)
        out = out.at[:, :, spec_py, :].add(
            -jnp.einsum("objpw,poij->bipw", rows, op["g_rows"]))
      if len(spec_px):
        cols = jnp.stack([
            jnp.stack([zp[:, :, ry + dy:ry + dy + code_h, q + rx + dx]
                       for q in op["spec_px"]], axis=3)
            for dy, dx in offs])                 # (O, b, j, h, Q)
        out = out.at[:, :, :, spec_px].add(
            -jnp.einsum("objhq,qoij->bihq", cols, op["g_cols"]))
      if len(spec_py) and len(spec_px):
        corners = jnp.stack([
            jnp.stack([
                jnp.stack([zp[:, :, p + ry + dy, q + rx + dx]
                           for q in op["spec_px"]], axis=2)
                for p in op["spec_py"]], axis=2)
            for dy, dx in offs])                 # (O, b, j, P, Q)
        out = out.at[:, :, spec_py[:, None], spec_px[None, :]].add(
            jnp.einsum("objpq,pqoij->bipq", corners, op["g_corners"]))
      return out

    zp = jnp.pad(z, ((0, 0), (0, 0), (ry, ry), (rx, rx)))
    shifted = jnp.stack([
        jax.lax.dynamic_slice(
            zp, (0, 0, ry + dy, rx + dx), (b, s, code_h, code_w))
        for dy, dx in offs])
    # (O, b, j, h, w) x (O, i, j) -> (b, i, h, w): one big MXU
    # contraction over (offset, atom) for the translation-invariant part
    out = jnp.einsum("objhw,oij->bihw", shifted, op["g_int"])

    if len(spec_py):
      rows = shifted[:, :, :, spec_py, :]        # (O, b, j, P, w)
      out = out.at[:, :, spec_py, :].add(
          -jnp.einsum("objpw,poij->bipw", rows, op["g_rows"]))
    if len(spec_px):
      cols = shifted[:, :, :, :, spec_px]        # (O, b, j, h, Q)
      out = out.at[:, :, :, spec_px].add(
          -jnp.einsum("objhq,qoij->bihq", cols, op["g_cols"]))
    if len(spec_py) and len(spec_px):
      corners = shifted[:, :, :, spec_py[:, None], spec_px[None, :]]
      out = out.at[:, :, spec_py[:, None], spec_px[None, :]].add(
          jnp.einsum("objpq,pqoij->bipq", corners, op["g_corners"]))
  return out


def inference_gradient_gram(images_padded, z, dictionary, stride, mask,
                            op=None, corr=None):
  """Drop-in replacement for convolutions.inference_gradient via the
  code-space Gram: grad = L(z) - A(mask*X)."""
  from vtc_tpu.ops import convolutions as conv_ops

  if corr is None:
    corr = conv_ops.analyze(mask * images_padded, dictionary, stride)
  if op is None:
    raise ValueError("pass op=build_gram_operator(...)")
  return apply_gram(z, op) - corr
