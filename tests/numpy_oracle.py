"""Pure-NumPy golden-value oracle for the transform-code math.

Independent re-derivation of the algorithms (ISTA/FISTA proximal descent,
group shrinkage, dictionary update rules) in float64 NumPy, used to verify
the TPU implementations to tight tolerances.  The update equations follow
the published algorithms (Beck & Teboulle 2009 FISTA; Yuan & Lin 2006
group LASSO) with the same conventions as the reference library
(sample-index-first layouts, stepsize = 1 / lambda_max(Gram)).
"""
import numpy as np


def _threshold(x, t, nonneg, hard):
  if hard:
    if nonneg:
      return np.where(x < t, 0.0, x)
    return np.where(np.abs(x) < t, 0.0, x)
  if nonneg:
    return np.maximum(x - t, 0.0)
  return np.sign(x) * np.maximum(np.abs(x) - t, 0.0)


def fc_stepsize(dictionary):
  gram = dictionary.T @ dictionary  # (n, n), same nonzero spectrum
  return 1.0 / np.linalg.eigvalsh(gram)[-1]


def fc_ista_fista(images, dictionary, lam, num_iters, variant="fista",
                  initial_codes=None, eps=None, nonneg=False, hard=False):
  """Reference fc solver trajectory in float64."""
  b = images.shape[0]
  s = dictionary.shape[0]
  step = fc_stepsize(dictionary)
  z = np.zeros((b, s)) if initial_codes is None else initial_codes.copy()
  old = z.copy()
  t_k = 1.0
  codes = z.copy()
  for k in range(num_iters):
    codes = _threshold(
        z - step * ((z @ dictionary - images) @ dictionary.T),
        lam * step, nonneg, hard)
    delta = codes - old
    if variant == "fista":
      t_next = (1.0 + np.sqrt(1.0 + 4.0 * t_k**2)) / 2.0
      beta = (t_k - 1.0) / t_next
      z = codes + beta * delta
      t_k = t_next
    else:
      z = codes
    old = codes.copy()
    if eps is not None and k > 0:
      if np.mean(np.abs(delta)) / step < eps:
        break
  return codes


def subspace_pack(groups, s):
  gmax = max(len(g) for g in groups)
  return gmax


def fc_subspace_ista_fista(images, dictionary, groups, lam, num_iters,
                           variant="fista", initial_codes=None, eps=None):
  """Group-LASSO solver trajectory in float64."""
  b, n = images.shape
  s = dictionary.shape[0]
  num_g = len(groups)
  gmax = max(len(g) for g in groups)
  grouped_dict = np.zeros((num_g * gmax, n))
  for gi, members in enumerate(groups):
    grouped_dict[gi * gmax:gi * gmax + len(members)] = dictionary[members]
  step = 1.0 / np.linalg.eigvalsh(grouped_dict.T @ grouped_dict)[-1]

  z = np.zeros((b, num_g, gmax))
  if initial_codes is not None:
    for gi, members in enumerate(groups):
      z[:, gi, :len(members)] = initial_codes[:, members]
  old = z.copy()
  t_k = 1.0
  gcodes = z.copy()
  for k in range(num_iters):
    flat = z.reshape(b, -1)
    grad = ((flat @ grouped_dict - images) @ grouped_dict.T).reshape(z.shape)
    gcodes = z - step * grad
    norms = np.linalg.norm(gcodes, axis=2, keepdims=True)
    norms[norms == 0] = 1.0
    gcodes = gcodes * np.maximum(1.0 - lam * step / norms, 0.0)
    delta = gcodes - old
    if variant == "fista":
      t_next = (1.0 + np.sqrt(1.0 + 4.0 * t_k**2)) / 2.0
      beta = (t_k - 1.0) / t_next
      z = gcodes + beta * delta
      t_k = t_next
    else:
      z = gcodes
    old = gcodes.copy()
    if eps is not None and k > 0:
      if np.mean(np.abs(delta)) / step < eps:
        break
  codes = np.zeros((b, s))
  for gi, members in enumerate(groups):
    codes[:, members] += gcodes[:, gi, :len(members)]
  return codes


def fc_sc_steepest_descent(images, dictionary, codes, stepsize, num_iters,
                           normalize=True):
  d = dictionary.copy()
  b = codes.shape[0]
  for _ in range(num_iters):
    d = d - stepsize * (codes.T @ (codes @ d - images)) / b
    if normalize:
      d = d / np.linalg.norm(d, axis=1, keepdims=True)
  return d


def fc_sc_cheap_quadratic_descent(images, dictionary, codes, hessian,
                                  stepsize, num_iters, low=0.001,
                                  normalize=True):
  d = dictionary.copy()
  b = codes.shape[0]
  for _ in range(num_iters):
    upd = stepsize * (codes.T @ (codes @ d - images)) / b
    upd = upd / (hessian[:, None] + low)
    d = d - upd
    if normalize:
      d = d / np.linalg.norm(d, axis=1, keepdims=True)
  return d


def alignment_reg_gradients(sub_dict, is_normalized):
  """Within-group anti-alignment gradient for one group's (m, n) block."""
  m = sub_dict.shape[0]
  if is_normalized:
    cos = sub_dict @ sub_dict.T
    axis0 = cos[:, :, None] * sub_dict[:, None, :]
    axis1 = np.broadcast_to(sub_dict[None, :, :], axis0.shape)
  else:
    norms = np.linalg.norm(sub_dict, axis=1, keepdims=True)
    cos = (sub_dict @ sub_dict.T) / (norms @ norms.T)
    axis0 = (cos / (norms**2))[:, :, None] * sub_dict[:, None, :]
    axis1 = sub_dict[None, :, :] / (norms @ norms.T)[:, :, None]
  return np.sum(np.sign(cos)[:, :, None] * (axis1 - axis0), axis=1)


def fc_subspace_cheap_quad(images, dictionary, codes, groups, hessian,
                           penalty, stepsize, num_iters, low=0.001,
                           normalize=True):
  d = dictionary.copy()
  b = codes.shape[0]
  for _ in range(num_iters):
    reg = np.zeros_like(d)
    for members in groups:
      members = list(members)
      reg[members] += alignment_reg_gradients(d[members], normalize)
    upd = stepsize * ((codes.T @ (codes @ d - images)) / b + penalty * reg)
    upd = upd / (hessian[:, None] + low)
    d = d - upd
    if normalize:
      d = d / np.linalg.norm(d, axis=1, keepdims=True)
  return d


def ica_natural_gradient(dictionary, codes, stepsize, num_iters):
  d = dictionary.copy()
  b = codes.shape[0]
  eye = np.eye(codes.shape[1])
  for _ in range(num_iters):
    d = d + stepsize * ((codes.T @ np.sign(codes) / b - eye) @ d)
  return d


# ---------------------------------------------------------------------------
# Convolutional oracle: dense matrix equivalent of strided conv synthesis
# ---------------------------------------------------------------------------
def conv_synthesis_matrix(dictionary, img_shape, stride):
  """Dense (s*sh*sw, c*h*w) synthesis matrix for strided conv_transpose.

  Builds the linear operator column by column so conv implementations can
  be validated against plain matmul in float64.
  """
  s, c, kh, kw = dictionary.shape
  _, _, h, w = img_shape
  sh = 1 + (h - kh) // stride[0]
  sw = 1 + (w - kw) // stride[1]
  mat = np.zeros((s * sh * sw, c * h * w))
  for si in range(s):
    for yi in range(sh):
      for xi in range(sw):
        img = np.zeros((c, h, w))
        y0, x0 = yi * stride[0], xi * stride[1]
        img[:, y0:y0 + kh, x0:x0 + kw] += dictionary[si]
        mat[(si * sh + yi) * sw + xi] = img.ravel()
  return mat, (sh, sw)


def conv_ista_fista(images, dictionary, stride, padding, lam, num_iters,
                    variant="fista", nonneg=False, hard=False,
                    stepsize=None):
  """Conv solver via the dense synthesis matrix (float64 oracle)."""
  b = images.shape[0]
  s, c, kh, kw = dictionary.shape
  syn, (sh, sw) = conv_synthesis_matrix(dictionary, images.shape, stride)
  mask = np.ones(images.shape[1:])
  if padding is not None:
    (lv, tv), (lh, th) = padding
    m2 = np.zeros(images.shape[2:])
    m2[lv:images.shape[2] - tv, lh:images.shape[3] - th] = 1.0
    mask = np.broadcast_to(m2, images.shape[1:]).copy()
  mask_flat = mask.ravel()

  if stepsize is None:
    flat_kernels = dictionary.reshape(s, -1)
    step = 1.0 / np.linalg.eigvalsh(flat_kernels @ flat_kernels.T)[-1]
  else:
    step = stepsize

  x_flat = images.reshape(b, -1)
  z = np.zeros((b, s * sh * sw))
  old = z.copy()
  t_k = 1.0
  codes = z.copy()
  for k in range(num_iters):
    resid = (z @ syn - x_flat) * mask_flat
    codes = _threshold(z - step * (resid @ syn.T), lam * step, nonneg, hard)
    delta = codes - old
    if variant == "fista":
      t_next = (1.0 + np.sqrt(1.0 + 4.0 * t_k**2)) / 2.0
      beta = (t_k - 1.0) / t_next
      z = codes + beta * delta
      t_k = t_next
    else:
      z = codes
    old = codes.copy()
  return codes.reshape(b, s, sh, sw)
