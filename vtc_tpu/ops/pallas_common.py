"""Tiling constants and helpers shared by the Pallas TPU kernels
(ops/pallas_fista.py, ops/pallas_group_fista.py,
ops/pallas_train_step.py): float32 VMEM tiles are 8 sublanes x 128
lanes, so lane-dim sizes pad to 128 and sublane dims to 8."""

LANES = 128
SUBLANES = 8


def round_up(x, m):
  return -(-x // m) * m
