"""Visualization utilities: tile engines, display functions, imshow
standardization corner cases."""
import numpy as np
import pytest

import matplotlib
matplotlib.use("Agg")
from matplotlib import pyplot as plt

from vtc_tpu.utils import plotting


@pytest.fixture(autouse=True)
def _close_figures():
  yield
  plt.close("all")


def test_standardize_for_imshow_cases():
  # nonnegative
  img, mapping = plotting.standardize_for_imshow(np.array([[0.0, 2.0]]))
  np.testing.assert_allclose(img, [[0.0, 1.0]])
  assert mapping == [0.0, 1.0, 2.0]
  # nonpositive
  img, mapping = plotting.standardize_for_imshow(np.array([[-4.0, 0.0]]))
  np.testing.assert_allclose(img, [[0.0, 1.0]])
  # sign-straddling maps 0 -> 0.5
  img, mapping = plotting.standardize_for_imshow(
      np.array([[-1.0, 0.0, 3.0]]))
  np.testing.assert_allclose(img[0, 1], 0.5)
  assert mapping == [-3.0, 0.0, 3.0]
  # constant
  img, mapping = plotting.standardize_for_imshow(np.full((2, 2), 5.0))
  np.testing.assert_allclose(img, 0.5)


def test_display_dictionary_fc(rng):
  d = rng.randn(20, 64)
  figs = plotting.display_dictionary(d, plot_title="test")
  assert len(figs) == 1
  figs = plotting.display_dictionary(d, renormalize=True,
                                     reshaping=(8, 8), label_inds=True)
  assert len(figs) == 1


def test_display_dictionary_conv_and_multifig(rng):
  d = rng.randn(12, 1, 5, 5)
  figs = plotting.display_dictionary(d)
  assert len(figs) == 1
  # more elements than fit one figure -> several figures
  big = rng.randn(900, 16)
  figs = plotting.display_dictionary(big, reshaping=(4, 4))
  assert len(figs) == 3


def test_display_dictionary_grouped_and_highlighted(rng):
  d = rng.randn(16, 36)
  groups = [[0, 1, 2], [3, 4], list(range(5, 16))]
  figs = plotting.display_dictionary(d, groupings=groups,
                                     reshaping=(6, 6))
  assert len(figs) == 1
  figs = plotting.display_dictionary(
      d, reshaping=(6, 6),
      highlighting={"weights": rng.rand(16),
                    "color_range": (0.0, 1.0), "reorder": True})
  assert len(figs) == 1


def test_display_codes_and_densities(rng):
  codes = rng.randn(20, 30) * (rng.rand(20, 30) > 0.5)
  figs = plotting.display_codes(codes, plot_title="codes")
  assert len(figs) == 2  # 20 samples at 16 per figure
  figs = plotting.display_code_marginal_densities(codes, 12)
  assert len(figs) == 1
  figs = plotting.display_code_marginal_densities(
      codes, 12, log_prob=True, ignore_zeros=True, overlaid=True)
  assert len(figs) == 1
  figs = plotting.display_2d_code_densities(codes[:, :2], 16)
  assert len(figs) == 1


def test_display_codes_reference_variants(rng):
  """The reference's display_codes extras (plotting.py:486-641):
  input/recon side panels, pagination, and the packed-image mode."""
  codes = rng.randn(6, 30)
  inputs = rng.randn(6, 16)
  recons = inputs + 0.1 * rng.randn(6, 16)
  figs = plotting.display_codes(
      codes, input_and_recon={"input": inputs, "recon": recons,
                              "vrange": (-3.0, 3.0)},
      data_pt_per_fig=4)
  assert len(figs) == 2  # 6 samples at 4 per figure
  figs = plotting.display_codes(codes, indv_stem_plots=False)
  assert len(figs) == 1


def test_density_ignore_vals_and_variants(rng):
  codes = rng.randn(40, 8) * (rng.rand(40, 8) > 0.5)
  figs = plotting.display_code_marginal_densities(
      codes, 10, ignore_vals=[0.0], lines=True)
  assert len(figs) == 1
  figs = plotting.display_code_marginal_densities(
      codes, 10, lines=False)
  assert len(figs) == 1
  figs = plotting.display_2d_code_densities(
      codes[:, :2], 12, with_contours=False, ignore_vals=[0.0])
  assert len(figs) == 1


def test_one_d_tile(rng):
  d = rng.randn(9, 16)
  tiles, _, labels = plotting.get_dictionary_tile_imgs(
      d, reshape_to_these_dims=(4, 4), one_d_tile=True)
  assert len(tiles) == 1
  # 1x9 strip of 4x4 patches with 1px borders
  assert tiles[0].shape == (1 * 5 + 1, 9 * 5 + 1)
  assert len(labels[0]) == 9


def test_dictionary_tile_imgs_shapes(rng):
  d = rng.randn(9, 16)
  tiles, mapping, labels = plotting.get_dictionary_tile_imgs(
      d, reshape_to_these_dims=(4, 4))
  assert len(tiles) == 1
  # 3x3 grid of 4x4 patches with 1px borders
  assert tiles[0].shape == (3 * 5 + 1, 3 * 5 + 1)
  assert len(labels[0]) == 9
