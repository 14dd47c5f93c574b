"""The scanned (compiled-segment) trainer must reproduce the per-batch
trainer exactly on the same batch sequence."""
import numpy as np

from vtc_tpu.training import compiled_epoch
from vtc_tpu.training import sparse_coding as sc


def test_scanned_matches_perbatch_trainer(rng, tmp_path):
  basis = rng.randn(8, 32)
  w = rng.randn(6 * 16, 8) * 2.0
  data = (w @ basis + 0.2 * rng.randn(96, 32)).astype(
      np.float32).reshape(6, 16, 32)
  d0 = rng.randn(48, 32).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  params = {
      "mode": "fully-connected",
      "num_epochs": 3,
      "code_inference_algorithm": "fista",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 10},
          7: {"sparsity_weight": 0.04, "num_iters": 20}},
      "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.1, "num_iters": 1},
          11: {"stepsize": 0.05, "num_iters": 2}},
      # keep both paths on the same formulation (the CPU test backend
      # would run pallas in slow interpret mode)
      "fc_formulation": "gram",
      "lipschitz_method": "eigvalsh",
  }
  ref = np.asarray(sc.train_dictionary(data, data[:1], d0, params))
  fast = np.asarray(compiled_epoch.train_dictionary_scanned(
      data, data[:1], d0, params))
  np.testing.assert_allclose(fast, ref, atol=2e-5)


def test_scanned_early_stopping_matches_perbatch_trainer(rng):
  """all_params['early_stopping_epsilon'] (reference solver rule,
  fc/ista_fista.py:135-144) on the scanned trainer must reproduce the
  flexible per-batch trainer's trajectory with the same epsilon -- and
  differ from the run without it (the stop genuinely fires at these
  iteration counts)."""
  basis = rng.randn(8, 32)
  w = rng.randn(5 * 16, 8) * 2.0
  data = (w @ basis + 0.2 * rng.randn(80, 32)).astype(
      np.float32).reshape(5, 16, 32)
  d0 = rng.randn(48, 32).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  params = {
      "mode": "fully-connected",
      "num_epochs": 2,
      "code_inference_algorithm": "fista",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 60}},
      "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.1, "num_iters": 1}},
      "fc_formulation": "gram",
      "lipschitz_method": "eigvalsh",
      # 0.1 fires within 60 iterations on this problem (smaller eps
      # never triggers and the runs are bit-identical to eps=None)
      "early_stopping_epsilon": 0.1,
  }
  ref = np.asarray(sc.train_dictionary(data, data[:1], d0, params))
  fast = np.asarray(compiled_epoch.train_dictionary_scanned(
      data, data[:1], d0, params))
  np.testing.assert_allclose(fast, ref, atol=2e-5)
  no_eps = np.asarray(compiled_epoch.train_dictionary_scanned(
      data, data[:1], d0,
      {k: v for k, v in params.items()
       if k != "early_stopping_epsilon"}))
  assert np.abs(no_eps - ref).max() > 1e-5


def test_early_stopping_composes_with_data_parallel(rng):
  """early_stopping_epsilon + data_parallel runs (the solver predicate
  pmeans the shard-local mean |delta|, keeping the reference's
  batch-GLOBAL stop test -- see tests/test_dp_early_stop.py for the
  trajectory-parity checks); this is the smoke guard that the former
  refusal stays gone in BOTH trainers."""
  from vtc_tpu import parallel

  data = rng.randn(4, 16, 24).astype(np.float32)
  d0 = rng.randn(24, 24).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  params = {
      "mode": "fully-connected",
      "num_epochs": 1,
      "code_inference_algorithm": "fista",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 10}},
      "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.1, "num_iters": 1}},
      "early_stopping_epsilon": 1e-4,
      "data_parallel": parallel.make_mesh(data=8),
  }
  out = np.asarray(compiled_epoch.train_dictionary_scanned(
      data, data[:1], d0, dict(params)))
  assert np.isfinite(out).all()


def test_hbm_streaming_matches_resident(rng):
  """all_params['hbm_chunk_steps'] with a host numpy dataset must give
  the IDENTICAL trajectory to the device-resident path -- including
  per-epoch shuffling (same jax.random permutation, applied host-side)
  and a chunk size that does not divide the segment lengths."""
  data = (0.3 * rng.randn(7, 16, 24)).astype(np.float32)
  d0 = rng.randn(24, 24).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  params = {
      "mode": "fully-connected",
      "num_epochs": 2,
      "code_inference_algorithm": "fista",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 8},
          4: {"sparsity_weight": 0.04, "num_iters": 10}},
      "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.05, "num_iters": 1}},
      "fc_formulation": "gram",
      "shuffle_each_epoch": True,
  }
  resident = np.asarray(compiled_epoch.train_dictionary_scanned(
      data, data[:1], d0, dict(params)))
  streamed = np.asarray(compiled_epoch.train_dictionary_scanned(
      data.copy(), data[:1], d0, dict(params, hbm_chunk_steps=3)))
  np.testing.assert_allclose(streamed, resident, atol=1e-6)


def test_hbm_streaming_prefetches_one_chunk_ahead(rng, monkeypatch):
  """The streaming loop must issue every continuation chunk's
  host->device transfer DURING the previous chunk's compute window
  (the one-ahead prefetch slot), never stage it synchronously: each
  in-segment chunk is a prefetch 'hit' preceded by its own 'prefetch'
  event.  (Timing evidence that the overlap pays on the real device
  lives in BENCH_NOTES -- this pins the mechanism.)"""
  data = (0.3 * rng.randn(7, 16, 24)).astype(np.float32)
  d0 = rng.randn(24, 24).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  params = {
      "mode": "fully-connected",
      "num_epochs": 1,
      "code_inference_algorithm": "fista",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 8},
          4: {"sparsity_weight": 0.04, "num_iters": 10}},
      "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.05, "num_iters": 1}},
      "fc_formulation": "gram",
      "shuffle_each_epoch": False,
      "hbm_chunk_steps": 3,
  }
  trace = []
  monkeypatch.setattr(compiled_epoch, "stream_trace", trace)
  compiled_epoch.train_dictionary_scanned(data, data[:1], d0, params)
  stages = [(ev, pos) for ev, pos in trace if ev in ("hit", "miss")]
  assert len(stages) >= 4  # two segments, each multi-chunk
  # segment-opening chunks stage synchronously (nothing to overlap
  # with); EVERY continuation chunk must come from the prefetch slot
  seg_starts = {0, 4}  # schedule change at iteration 4 splits segments
  for ev, pos in stages:
    assert ev == ("miss" if pos in seg_starts else "hit"), (ev, pos)
  prefetch_pos = [pos for ev, pos in trace if ev == "prefetch"]
  hit_pos = [pos for ev, pos in stages if ev == "hit"]
  assert sorted(prefetch_pos) == sorted(hit_pos)
  # and the prefetch event precedes its hit in program order
  for pos in hit_pos:
    assert trace.index(("prefetch", pos)) < trace.index(("hit", pos))


def test_hbm_streaming_composes_with_data_parallel(rng):
  """Streaming + data_parallel: chunks are device_put with the DP
  runners' NamedSharding (batch axis over the data axes) and the
  trajectory still matches the single-device resident path -- both
  the fused-DP pallas composition and the psum-per-op scan."""
  from vtc_tpu import parallel

  data = (0.3 * rng.randn(8, 16, 24)).astype(np.float32)
  d0 = rng.randn(24, 24).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  for formulation in ("pallas", "gram"):
    params = {
        "mode": "fully-connected",
        "num_epochs": 2,
        "code_inference_algorithm": "fista",
        "inference_param_schedule": {
            0: {"sparsity_weight": 0.05, "num_iters": 8}},
        "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
        "dict_update_param_schedule": {
            0: {"stepsize": 0.05, "num_iters": 1}},
        "fc_formulation": formulation,
        "shuffle_each_epoch": True,
    }
    if formulation == "gram":
      # the psum-per-op DP scan recomputes the stepsize in-step; pin an
      # exact method so resident and DP trajectories are comparable
      params["lipschitz_method"] = "eigvalsh"
    resident = np.asarray(compiled_epoch.train_dictionary_scanned(
        data, data[:1], d0, dict(params)))
    dp_streamed = np.asarray(compiled_epoch.train_dictionary_scanned(
        data.copy(), data[:1], d0,
        dict(params, hbm_chunk_steps=3,
             data_parallel=parallel.make_mesh(data=8))))
    np.testing.assert_allclose(dp_streamed, resident, atol=2e-5,
                               err_msg=formulation)


def test_scanned_default_warm_power_close_to_exact(rng):
  """The scanned trainer's default warm Lipschitz tracking should stay
  within trajectory noise of the exact per-batch eigvalsh path for a
  stable (steepest-descent) rule."""
  data = rng.randn(8, 16, 24).astype(np.float32)
  d0 = rng.randn(24, 24).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  base = {
      "mode": "fully-connected",
      "num_epochs": 2,
      "code_inference_algorithm": "fista",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 10}},
      "dictionary_update_algorithm": "sc_steepest_descent",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.01, "num_iters": 1}},
      "fc_formulation": "gram",
  }
  exact = np.asarray(compiled_epoch.train_dictionary_scanned(
      data, data[:1], d0, dict(base, lipschitz_method="eigvalsh")))
  warm = np.asarray(compiled_epoch.train_dictionary_scanned(
      data, data[:1], d0, base))  # default: power_warm
  np.testing.assert_allclose(warm, exact, atol=1e-3)


def test_scanned_epoch_shuffling_changes_order_not_quality(rng):
  data = rng.randn(4, 16, 24).astype(np.float32)
  d0 = rng.randn(24, 24).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  base = {
      "mode": "fully-connected",
      "num_epochs": 3,
      "code_inference_algorithm": "ista",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 8}},
      "dictionary_update_algorithm": "sc_steepest_descent",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.01, "num_iters": 1}},
      "fc_formulation": "gram",
  }
  plain = np.asarray(compiled_epoch.train_dictionary_scanned(
      data, data[:1], d0, base))
  shuffled = np.asarray(compiled_epoch.train_dictionary_scanned(
      data, data[:1], d0, dict(base, shuffle_each_epoch=True)))
  assert not np.allclose(plain, shuffled)  # order actually changed
  np.testing.assert_allclose(
      np.linalg.norm(shuffled, axis=1), 1.0, atol=1e-4)


def test_scanned_with_checkpoints_and_rp(rng, tmp_path):
  data = rng.randn(4, 16, 24).astype(np.float32).reshape(4, 16, 24)
  d0 = rng.randn(24, 24).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  params = {
      "mode": "fully-connected",
      "num_epochs": 2,
      "code_inference_algorithm": "ista",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 8}},
      "dictionary_update_algorithm": "sc_steepest_descent",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.01, "num_iters": 1}},
      "checkpoint_schedule": {3, 7},
      "logging_folder_fullpath": tmp_path / "scanrun",
      "dict_element_rp_schedule": {
          5: {"filter_type": "random",
              "filter_params": {"num_to_modify": 2},
              "action": "reset"}},
      "fc_formulation": "gram",
  }
  final = np.asarray(compiled_epoch.train_dictionary_scanned(
      data, data[:1], d0, params))
  assert final.shape == (24, 24)
  assert (tmp_path / "scanrun" / "checkpoint_dictionary_iter_3").exists()
  assert (tmp_path / "scanrun" / "checkpoint_dictionary_iter_7").exists()


def test_scanned_data_parallel_matches_single_chip(rng):
  """Multi-chip scanned trainer (scan-inside-shard_map over the
  8-device mesh) must reproduce the single-chip scanned trainer on the
  identical batch sequence: the psum of per-shard gradient/Hessian
  statistics equals the full-batch statistics to float tolerance."""
  from vtc_tpu import parallel

  data = rng.randn(6, 16, 24).astype(np.float32)
  d0 = rng.randn(32, 24).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  base = {
      "mode": "fully-connected",
      "num_epochs": 2,
      "code_inference_algorithm": "fista",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.05, "num_iters": 10},
          8: {"sparsity_weight": 0.04, "num_iters": 15}},
      "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.1, "num_iters": 1}},
      "fc_formulation": "gram",
      "lipschitz_method": "eigvalsh",
  }
  single = np.asarray(compiled_epoch.train_dictionary_scanned(
      data, data[:1], d0, base))
  dp = np.asarray(compiled_epoch.train_dictionary_scanned(
      data, data[:1], d0, dict(base, data_parallel=True)))
  np.testing.assert_allclose(dp, single, atol=2e-5)
  # an explicit smaller mesh works too
  dp4 = np.asarray(compiled_epoch.train_dictionary_scanned(
      data, data[:1], d0,
      dict(base, data_parallel=parallel.make_mesh(data=4))))
  np.testing.assert_allclose(dp4, single, atol=2e-5)


def test_scanned_data_parallel_conv(rng):
  from vtc_tpu import parallel

  data = rng.randn(3, 8, 1, 12, 12).astype(np.float32)
  d0 = rng.randn(6, 1, 4, 4).astype(np.float32)
  d0 /= np.linalg.norm(d0.reshape(6, -1), axis=1)[:, None, None, None]
  base = {
      "mode": "convolutional",
      "num_epochs": 2,
      "strides": (2, 2),
      "padding": ((1, 1), (1, 1)),
      "code_inference_algorithm": "fista",
      "inference_param_schedule": {
          0: {"sparsity_weight": 0.02, "num_iters": 6}},
      "dictionary_update_algorithm": "sc_steepest_descent",
      "dict_update_param_schedule": {
          0: {"stepsize": 0.05, "num_iters": 1}},
      "lipschitz_method": "eigvalsh",
  }
  single = np.asarray(compiled_epoch.train_dictionary_scanned(
      data, data[:1], d0, base))
  dp = np.asarray(compiled_epoch.train_dictionary_scanned(
      data, data[:1], d0,
      dict(base, data_parallel=parallel.make_mesh(data=8))))
  np.testing.assert_allclose(dp, single, atol=3e-5)
