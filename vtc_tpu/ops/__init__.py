"""Core TPU numerical engines: thresholds, Lipschitz bounds, ISTA/FISTA
solver loops, convolution shape helpers, and Pallas kernels."""

from vtc_tpu.ops import thresholds
from vtc_tpu.ops import lipschitz
from vtc_tpu.ops import conv_shapes
