"""The whole-segment RDMA kernels' comm-scratch VMEM gates.  Round 5
decouples the fc stats exchange from P for power-of-2 axis sizes: the
butterfly all-reduce keeps 1 + 2 log2(P) slots resident (vs the
all-to-all's 2 P), so the fc DP path now admits pod-scale P at the
flagship geometry (BENCH_NOTES UPDATE 39).  Non-power-of-2 sizes keep
the all-to-all's linear growth, and oversized configs must still route
to the per-step fused-DP path (one XLA psum per step) with identical
semantics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtc_tpu.ops.pallas_code_shard_train import code_shard_segment_supported
from vtc_tpu.ops.pallas_dp_train import fused_dp_segment_supported
from vtc_tpu.ops.pallas_group_dp_train import fused_group_dp_segment_supported


def test_dp_rdma_vmem_gate():
  b, s, n = 32, 512, 256
  # fits at small P ...
  assert fused_dp_segment_supported(b, s, n, 2)
  assert fused_dp_segment_supported(b, s, n, 4)
  # ... and power-of-2 P now rides the O(log P) butterfly: the sizes
  # that tripped the all-to-all gate (P=8 did, round 4) are admitted
  # all the way to pod scale
  assert fused_dp_segment_supported(b, s, n, 8)
  assert fused_dp_segment_supported(b, s, n, 16)
  assert fused_dp_segment_supported(b, s, n, 64)
  # the log growth still meets the budget eventually
  assert not fused_dp_segment_supported(b, s, n, 256)
  # non-power-of-2 sizes keep the all-to-all's 2 P slots -> linear trip
  assert not fused_dp_segment_supported(b, s, n, 12)
  # larger payloads trip at smaller P even on the butterfly
  assert not fused_dp_segment_supported(b, 1024, n, 4)


def test_group_dp_rdma_vmem_gate():
  groups = tuple(tuple(range(i, i + 4)) for i in range(0, 256, 4))
  assert fused_group_dp_segment_supported(32, 256, 64, groups, 4)
  # pow2 sizes ride the O(log P) butterfly (this config tripped at
  # P=256 under the all-to-all model, rounds 1-4)
  assert fused_group_dp_segment_supported(32, 256, 64, groups, 256)
  # non-pow2 sizes keep the all-to-all's linear growth
  assert not fused_group_dp_segment_supported(32, 256, 64, groups, 255)


def test_code_shard_vmem_gate_linear_in_axes():
  # recon slots grow in the code-axis size, grad slots in the data-axis
  # size
  assert code_shard_segment_supported(64, 512, 256, 4)
  assert not code_shard_segment_supported(2048, 512, 256, 64)
  assert code_shard_segment_supported(64, 1024, 256, 4, 2)
  assert not code_shard_segment_supported(64, 4096, 1024, 4, 8)


def test_oversized_rdma_routes_to_per_step_psum(rng):
  """A config whose comm slots exceed the RDMA budget at the mesh's P
  must still train -- on the per-step fused-DP path (kernel solve +
  one XLA psum per step) -- and match the single-device trainer."""
  from vtc_tpu import parallel
  from vtc_tpu.ops.pallas_train_step import fused_solve_stats_supported
  from vtc_tpu.training import compiled_epoch

  # s=1024: the per-shard solve fits but even the butterfly comm
  # scratch exceeds the DP budget at this payload size (round 5: s=768
  # no longer qualifies -- the O(log P) scheme admits it)
  k, b, s, n, p = 2, 16, 1024, 256, 4
  # the routing premise: per-shard solve fits, RDMA comm does not
  assert fused_solve_stats_supported(b // p, s, n)
  assert not fused_dp_segment_supported(b // p, s, n, p)

  d0 = rng.randn(s, n).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  batches = rng.randn(k, b, n).astype(np.float32) * 0.5
  params = {
      "mode": "fully-connected",
      "num_epochs": 1,
      "code_inference_algorithm": "fista",
      "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 4}},
      "dict_update_param_schedule": {
          0: {"stepsize": 0.05, "num_iters": 1}},
      "fc_formulation": "pallas",
  }
  single = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(), dict(params)))
  dp = np.asarray(compiled_epoch.train_dictionary_scanned(
      batches, batches[:1], d0.copy(),
      dict(params, data_parallel=parallel.make_mesh(data=p))))
  np.testing.assert_allclose(dp, single, atol=5e-5)
