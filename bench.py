#!/usr/bin/env python
"""Benchmark: FISTA sparse-coding dictionary learning throughput on TPU.

Stdout contract: a `{"bench_detail": ...}` JSON line with every detail
row, then a FINAL compact headline JSON line {"metric", "value",
"unit", "vs_baseline", "detail"} hard-capped at HEADLINE_CAP bytes so
the driver's bounded tail capture always parses it (BENCH_r04 lost its
headline to a single oversized line; BENCH_NOTES UPDATE 38).

Workload (BASELINE.json config #3 / the reference's flagship recipe,
examples/train_sparse_coding.py:20-27,63-68): 16x16 patches (n=256),
256-atom dictionary, FISTA inference at 25 iterations + cheap-quadratic
dictionary update with the Hessian-diagonal EMA, Lipschitz stepsize
recomputed from the current dictionary EVERY batch (the reference's
per-batch symeig semantics; we track the top Gram eigenvalue with a
warm-started power iteration -- 2 refresh steps per batch from an
exact-eigenpair seed carried through the scan, ~1e-6 relative of
per-batch eigvalsh in steady state, identical to 12 steps/batch).

Measurement: K train steps run as ONE compiled on-device program (data
resident in HBM, zero Python in the loop); wall-clock over several
calls after a warmup.  Headline: batch 250 (the reference's own batch
size) as ONE fused Pallas kernel per 1000-step segment
(ops/pallas_train_step.py).  The "detail" field additionally records
the TPU-saturating batch-2048 fc path, the subspace (group-sparse)
fused train step, the convolutional train step (reference conv
config: 64 16x16 kernels, stride 8, 256x256 images, batch 5/40), and
the scanned ICA trainer -- each with derived model TFLOP/s and
%-of-roofline so perf regressions on any model family are visible
round over round.

Roofline accounting: FLOPs per train step are ANALYTIC counts of the
algorithm's matmul work (formulas in the *_step_flops functions below;
elementwise work excluded), divided by measured step time.  The
roofline denominator is the chip's bf16 MXU peak / 6, because every
benchmarked matmul runs at `highest` (full-f32) precision, which the
MXU executes as a 6-pass bf16x3 product (see BENCH_NOTES.md).

Baseline: the reference publishes no numbers (BASELINE.md).  The
vs_baseline denominator is a documented ANALYTIC ESTIMATE of the PyTorch
reference on a V100-class GPU at its own config (batch 250, FISTA 25):
per batch ~1.5 ms symeig(256x256) + 25 iterations x ~0.25 ms (2 small
matmuls + threshold + momentum, kernel-launch bound) + ~1 ms dict update
~= 8.5 ms/batch ~= 30,000 patches/s.  BENCH_NOTES.md derives this.
"""
import json
import sys
import time

import numpy as np

BASELINE_PATCHES_PER_SEC = 30_000.0  # documented estimate, see above
N = 256          # 16x16 patches
S = 256          # dictionary atoms
FISTA_ITERS = 25

# The driver records only the tail of stdout; the final headline line
# must survive that capture whole.  2,000 bytes observed in rounds 1-4;
# cap well under it to leave room for a trailing newline + slack.
HEADLINE_CAP = 1500

# ((detail-row key, leaf key), compact name) -> the per-family headline
# numbers that ride on the final line.  Everything else stays on the
# bench_detail line.
_HEADLINE_FAM_KEYS = (
    (("subspace_batch250", "patches_per_sec"), "subspace_pps"),
    (("conv_batch40", "images_per_sec"), "conv_b40_ips"),
    (("ica_batch250", "patches_per_sec"), "ica_pps"),
    (("fc_batch250", "pct_f32_roofline"), "fc_pct_roofline"),
    (("subspace_batch250", "pct_f32_roofline"), "subspace_pct_roofline"),
    (("conv_batch40", "pct_f32_roofline"), "conv_pct_roofline"),
    (("ica_batch250", "pct_f32_roofline"), "ica_pct_roofline"),
    (("fc_dp_rdma_batch250", "pct_of_single_chip_fused"), "fc_dp_pct"),
    (("conv_dp_rdma_batch5", "pct_of_single_chip_fused"), "conv_dp_pct"),
    (("subspace_dp_rdma_batch250", "pct_of_single_chip_fused"),
     "subspace_dp_pct"),
    (("ica_dp_rdma_batch250", "pct_of_single_chip_fused"), "ica_dp_pct"),
    (("fc_batch250_bf16_training_mode", "speedup_vs_f32_headline"),
     "fc_bf16_speedup"),
)

# bf16 MXU peak TFLOP/s per chip by device kind (public spec sheets);
# f32-'highest' matmuls are 6 bf16 passes, so the parity-precision
# roofline is peak/6.
_BF16_PEAKS = (
    ("v6", 918.0),
    ("v5p", 459.0),
    ("v5", 197.0),     # v5e / 'TPU v5 lite'
    ("v4", 275.0),
)


def f32_roofline_tflops():
  """Per-chip f32-'highest' matmul roofline, or None off-TPU."""
  import jax
  dev = jax.devices()[0]
  if dev.platform != "tpu":
    return None
  kind = dev.device_kind.lower()
  for tag, bf16_peak in _BF16_PEAKS:
    if tag in kind:
      return bf16_peak / 6.0
  return None


def roofline_fields(flops_per_step, steps_per_sec):
  """Derived model TFLOP/s + % of the f32-parity roofline."""
  tf = flops_per_step * steps_per_sec / 1e12
  peak = f32_roofline_tflops()
  out = {"model_tflops": round(tf, 2)}
  if peak:
    out["pct_f32_roofline"] = round(100.0 * tf / peak, 1)
  return out


def fc_step_flops(b, s=S, n=N, iters=FISTA_ITERS, upd_iters=1,
                  power_iters=2):
  """Matmul FLOPs of one fc train step (gram-formulation semantics):
  Gram D@D^T, data projection X@D^T, `iters` FISTA iterations of z@G,
  warm power-iteration matvecs, and the cheap-quad update's two
  (b,s)x(s,n) matmuls per update iteration."""
  return (2 * s * s * n            # G = D D^T
          + 2 * b * n * s          # b-term X @ D^T
          + iters * 2 * b * s * s  # z @ G per FISTA iteration
          + power_iters * 4 * s * s      # warm Lipschitz matvecs
          + upd_iters * 4 * b * s * n)   # codes@D + codes^T@resid


def subspace_step_flops(b, s=S, n=N, num_groups=64, max_gs=4,
                        iters=FISTA_ITERS, upd_iters=1):
  """Matmul FLOPs of one subspace train step (packed one-matmul design,
  ops/pallas_train_step.py group kernel): grouped-dictionary build and
  code unpack as 0/1 matmuls, grouped Gram, per-iteration z@G plus the
  two skinny group-norm matmuls, and the update.

  FIXED WORK MODEL: this counts the matmul formulation's work even
  where the round-5 kernel executes it differently (the lane-rotate
  prox does the group-norm term on the VPU; the identity-gsel path
  skips the build/unpack matmuls entirely -- BENCH_NOTES UPDATEs
  40/42).  Keeping the model fixed preserves r01-r05 roofline
  comparability: the % tracks effective algorithm throughput, like
  reporting attention FLOPs for a fused-attention kernel."""
  gm = num_groups * max_gs
  g = num_groups
  return (2 * gm * s * n           # grouped dictionary build (gsel @ D)
          + 2 * gm * gm * n        # grouped Gram
          + 2 * b * n * gm         # b-term
          + iters * (2 * b * gm * gm + 4 * b * gm * g)  # z@G + group norms
          + 2 * b * gm * s         # duplicate-summed unpack
          + upd_iters * 4 * b * s * n)


def conv_flop_geometry(kdim=16, s=64, img=256, stride=8, c=1):
  """(geo, b_pad_fn) for the bench conv config, replicating
  measure_conv's stride-exact padding."""
  from vtc_tpu.ops import conv_shapes
  from vtc_tpu.ops.pallas_conv_direct import _geometry
  lead, trail = conv_shapes.get_padding_amt(img, kdim, stride)
  trail += (-(img + lead + trail - kdim)) % stride
  hw = img + lead + trail
  geo = _geometry((1, c, hw, hw), (s, c, kdim, kdim), (stride, stride))
  return geo


def conv_step_flops(b, iters=FISTA_ITERS, kdim=16, s=64, img=256,
                    stride=8, upd_iters=1):
  """EXECUTED matmul FLOPs of one conv train step on the fused
  direct/block kernel (ops/pallas_conv_train) -- derived from the
  kernel's actual per-geometry block-matmul dims, not an algorithmic
  model.  Per FISTA iteration the tile solver runs TWO deep-contraction
  matmuls, synthesis (cpx, R*s)x(R*s, tl) and analysis
  (s, R*cpx)x(R*cpx, tl), each 2*R*s*cpx*tl FLOPs, summed over batch
  tiles (sum tl = b_pad * ells, the spare-padded canvas the MXU really
  sweeps).  One-time per step: the corr b-term (analysis shape, half an
  iteration), the dall build (R per-part (cpx,s)^T x (cpx,R*cpx)
  placements), the (s, R*cpx) Gram, and per update iteration one
  synthesis + one correlation (= one iteration-equivalent).  The
  previous channel-mix model counted s^2-proportional work the block
  kernel does not execute, which inflated %-roofline quadratically in
  s (129.5% at s=128, BENCH_NOTES UPDATE 33)."""
  from vtc_tpu.ops.pallas_conv_train import _pick_tile
  geo = conv_flop_geometry(kdim=kdim, s=s, img=img, stride=stride)
  tile, num_tiles = _pick_tile(b, geo)
  b_pad = tile * num_tiles
  lanes = b_pad * geo["ells"]
  per_iter = 4 * geo["r"] * geo["s"] * geo["cpx"] * lanes
  corr = per_iter // 2                          # analysis b-term, once
  dall = 2 * geo["r"] ** 2 * geo["s"] * geo["cpx"] ** 2
  gram = 2 * geo["s"] ** 2 * geo["r"] * geo["cpx"]
  return (iters + upd_iters) * per_iter + corr + dall + gram


def ica_step_flops(b, n=N, refine_iters=3, upd_iters=1):
  """Matmul FLOPs of one scanned ICA train step with warm inverse
  tracking (training/ica): each Newton-Schulz refinement is two (n,n)
  matmuls (default depth 3 -- the residual-adaptive boost adds more
  only when the guard residual sits above the tier floor, which the
  bench's healthy config never does; BENCH_NOTES UPDATE 30d), the
  divergence guard one, the code solve and the natural-gradient
  statistic one (b,n)x(n,n) each, and the update one (n,n) matmul per
  iteration."""
  return ((4 * refine_iters + 2 + 2 * upd_iters) * n * n * n
          + 4 * b * n * n)


def measure_ica(batch_size, scan_steps, timed_calls=3,
                log=lambda *a: None, mxu="highest",
                formulation="fused"):
  """Scanned ICA trainer fast path at the critically-sampled 16x16
  config.  formulation: 'fused' (whole-segment Pallas kernel with D +
  the tracked inverse VMEM-resident -- what the scanned trainer
  auto-selects on TPU; ops/pallas_ica_train) or 'xla' (the lax.scan of
  separate ops with warm Newton-Schulz inverse tracking)."""
  import jax
  import jax.numpy as jnp

  from vtc_tpu.training.ica import (_fused_segment_runner,
                                    _segment_runner_tracked)

  rng = np.random.RandomState(0)
  q, _ = np.linalg.qr(rng.randn(N, N))
  d = jnp.asarray(q.astype(np.float32))
  dinv = jnp.asarray(q.T.astype(np.float32))  # exact inverse seed
  data = jnp.asarray(
      rng.randn(scan_steps, batch_size, N).astype(np.float32))
  if formulation == "fused":
    # interpret off-TPU so smoke runs don't hit Mosaic lowering
    fused = _fused_segment_runner(
        1, mxu=mxu, interpret=jax.default_backend() != "tpu")
    runner = lambda dd, xx, bb, ss: fused(dd, xx, bb, ss)[:2]
  elif formulation == "dp_rdma":
    # whole-segment ICA DP kernel on a 1-device mesh: the per-chip
    # rate multi-chip DP keeps (in-kernel RDMA stat all-reduce; at
    # axis size 1 the exchange short-circuits, BENCH_NOTES UPDATE 34)
    from vtc_tpu.parallel import make_mesh
    from vtc_tpu.training.ica import _rdma_segment_runner_dp
    rdma = _rdma_segment_runner_dp(
        1, make_mesh(data=1), "data", 1, mxu=mxu,
        interpret=jax.default_backend() != "tpu")
    runner = lambda dd, xx, bb, ss: rdma(dd, xx, bb, ss)[:2]
  else:
    runner = _segment_runner_tracked(1, mxu=mxu)
  step = jnp.float32(0.001)

  t0 = time.time()
  st = runner(d, dinv, data, step)
  float(jnp.sum(st[0]))
  log(f"ica b={batch_size}: compile+first call {time.time() - t0:.1f}s")

  def run_once(state):
    dd, xx = state if state is not None else st
    return runner(dd, xx, data, step)

  dt = _timed_best_of_two(run_once, timed_calls,
                          lambda s_: float(jnp.sum(s_[0])))
  pps = scan_steps * batch_size * timed_calls / dt
  log(f"ica b={batch_size}: {pps:,.0f} patches/s")
  return pps


def measure_streaming_ab(log=lambda *a: None, steps=600, b=250,
                         chunk=100):
  """Streaming-overlap A/B with TIMING (BENCH_NOTES UPDATE 36; run via
  `python bench.py --streaming-ab`): for a transfer-bound regime
  (FISTA-25) and a compute-bound regime (FISTA at high iters), measure
    resident  -- epoch with the dataset device-resident (pure compute)
    transfer  -- pure host->HBM device_put of the same chunks (no
                 compute), synced at the end
    streamed  -- the trainer's hbm_chunk_steps path (host numpy input,
                 one-chunk-ahead async double buffering)
  Overlap holds when streamed ~= max(resident, transfer) rather than
  their sum.  Each trainer config runs once for compile warmup and is
  timed on later calls (best of 2)."""
  import jax
  import jax.numpy as jnp

  from vtc_tpu.training import compiled_epoch

  rng = np.random.RandomState(0)
  d0 = rng.randn(S, N).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  data = rng.randn(steps, b, N).astype(np.float32)
  bytes_total = data.nbytes

  def params(iters, streaming):
    p = {
        "mode": "fully-connected", "num_epochs": 1,
        "code_inference_algorithm": "fista",
        "inference_param_schedule": {
            0: {"sparsity_weight": 0.008, "num_iters": iters}},
        "dictionary_update_algorithm": "sc_cheap_quadratic_descent",
        "dict_update_param_schedule": {
            0: {"stepsize": 0.1, "num_iters": 1}},
        "fc_formulation": "pallas",
    }
    if streaming:
      p["hbm_chunk_steps"] = chunk
    return p

  def timed_train(arr, p, calls=2):
    best = None
    compiled_epoch.train_dictionary_scanned(  # compile warmup
        arr, arr[:1], d0, dict(p))
    for _ in range(calls):
      t0 = time.time()
      out = compiled_epoch.train_dictionary_scanned(
          arr, arr[:1], d0, dict(p))
      float(jnp.sum(out))
      best = min(best or 1e9, time.time() - t0)
    return best

  # pure transfer: device_put the same chunk sequence, sync at the end
  # (matches the streamer's async overlap opportunity)
  def timed_transfer(calls=3):
    best = None
    for _ in range(calls):
      t0 = time.time()
      bufs = [jax.device_put(data[pos:pos + chunk])
              for pos in range(0, steps, chunk)]
      for bu in bufs:
        float(jnp.sum(bu[-1, -1]))
      best = min(best or 1e9, time.time() - t0)
    return best

  t_x = timed_transfer()
  bw = bytes_total / t_x / 1e6
  log(f"transfer: {t_x:.3f}s ({bw:,.0f} MB/s for "
      f"{bytes_total / 1e6:,.0f} MB)")
  dev_data = jax.device_put(data)
  rows = {}
  t_res400 = None
  # third regime: FISTA depth scaled so resident compute ~= 2x the
  # measured transfer (this runtime's tunnel moves ~25-40 MB/s, ~300x
  # slower than real PCIe, so a COMPUTE-bound regime needs the
  # compute-per-byte scaled up to match; num_iters is a runtime scalar
  # -- no recompile)
  for tag, iters in (("transfer_bound_fista25", FISTA_ITERS),
                     ("transfer_bound_fista400", 400),
                     ("compute_bound_adaptive", None)):
    if iters is None:
      iters = max(400, int(400 * 2.0 * t_x / max(t_res400, 1e-3)))
      tag = f"compute_bound_fista{iters}"
    t_res = timed_train(dev_data, params(iters, False))
    if iters == 400:
      t_res400 = t_res
    t_str = timed_train(data, params(iters, True))
    t_max = max(t_res, t_x)
    t_sum = t_res + t_x
    log(f"{tag}: resident {t_res:.3f}s  transfer {t_x:.3f}s  "
        f"streamed {t_str:.3f}s  (max {t_max:.3f}s, sum {t_sum:.3f}s)")
    rows[tag] = {
        "resident_s": round(t_res, 3), "transfer_s": round(t_x, 3),
        "streamed_s": round(t_str, 3),
        "streamed_over_max": round(t_str / t_max, 3),
        "streamed_over_sum": round(t_str / t_sum, 3)}
  return rows


def build_epoch_fn(raw_step):
  """Scan the fused step with the Lipschitz eigenvector carried through
  the scan: the dictionary drifts slowly, so 2 warm power iterations per
  step from an exact-eigenpair seed track the exact Lipschitz constant
  to ~1e-6 relative (the refresh is sequential matvec latency, so fewer
  iterations buy step time directly)."""
  import jax
  import jax.numpy as jnp

  from vtc_tpu.ops import lipschitz as lip

  def epoch(dictionary, hessian, eigvec, data, sw, n_it, upd_step):
    def body(carry, batch):
      d, h, v = carry
      eigval, v = lip.power_iterate(d, v, num_iters=2)
      d, h, _ = raw_step(d, h, batch, sw, n_it, upd_step, 1,
                         1.0 / eigval)
      return (d, h, v), ()

    (dictionary, hessian, eigvec), _ = jax.lax.scan(
        body, (dictionary, hessian, eigvec), data)
    return dictionary, hessian, eigvec

  return jax.jit(epoch)


def _timed_best_of_two(run_once, timed_calls, sync):
  """Best of two timed blocks: the shared relay/chip shows occasional
  ~15% environment dips between runs, and best-of is the standard
  throughput estimator under one-sided noise."""
  dt = None
  for _block in range(2):
    t0 = time.time()
    state = None
    for _ in range(timed_calls):
      state = run_once(state)
    sync(state)  # one sync at the end; calls pipeline on-device
    bt = time.time() - t0
    dt = bt if dt is None else min(dt, bt)
  return dt


def measure(batch_size, scan_steps, timed_calls=3, log=lambda *a: None,
            formulation="fused", mxu="highest"):
  """Time `timed_calls` executions of a compiled scan over `scan_steps`
  fused train steps.  The per-call host<->device round trip through the
  runtime costs ~30 ms here, so throughput is measured with large scans
  that amortize it (the same way production training would run).

  formulation: 'fused' (the ENTIRE segment as one Pallas kernel --
  dictionary/Hessian/eigenvector VMEM-resident across all steps, batches
  streamed with double buffering; ops/pallas_train_step.py; full-f32
  parity grade), 'pallas' (fused VMEM-resident FISTA kernel inside an
  XLA scan), 'gram' (XLA while_loop), 'direct' (reference's literal
  two-matmul iteration)."""
  import jax
  import jax.numpy as jnp

  from vtc_tpu.training.sparse_coding import build_raw_step_fn

  if formulation == "fused":
    from vtc_tpu.ops.pallas_train_step import fused_train_segment_pallas

    def epoch_fn(dictionary, hessian, eigvec, data, sw, n_it, upd_step):
      d, h, v, _ = fused_train_segment_pallas(
          dictionary, hessian, eigvec, data, sw, n_it, upd_step,
          power_iters=2,  # exact-eigenpair seed below
          mxu=mxu)
      return d, h, v
  elif formulation == "dp_rdma":
    # multi-chip production path on a 1-device mesh: the whole-segment
    # DP kernel with in-kernel RDMA stats all-reduce
    # (ops/pallas_dp_train; at axis size 1 the communication vanishes,
    # so this measures the per-chip kernel speed multi-chip DP keeps)
    from vtc_tpu.parallel import make_mesh
    from vtc_tpu.training.compiled_epoch import _dp_rdma_segment_runner
    epoch_fn = _dp_rdma_segment_runner(
        make_mesh(data=1), "data", 1, "fista",
        "sc_cheap_quadratic_descent", 1, False, False, True, mxu=mxu)
  else:
    raw = build_raw_step_fn(
        "fully-connected", "fista", "sc_cheap_quadratic_descent",
        compute_stepsize_in_step=False, fc_formulation=formulation)
    epoch_fn = build_epoch_fn(raw)

  rng = np.random.RandomState(0)
  dictionary = rng.randn(S, N).astype(np.float32)
  dictionary /= np.linalg.norm(dictionary, axis=1, keepdims=True)
  hessian = np.zeros(S, np.float32)
  data = rng.randn(scan_steps, batch_size, N).astype(np.float32)

  from vtc_tpu.ops import lipschitz as lip

  d = jnp.asarray(dictionary)
  h = jnp.asarray(hessian)
  # an exact eigenpair seeds the carried eigenvector (no cold-start
  # transient); the scan then only refreshes it
  _, v = lip.top_gram_eigenpair(d)
  data = jnp.asarray(data)
  args = (jnp.float32(0.008), jnp.int32(FISTA_ITERS), jnp.float32(0.1))

  t0 = time.time()
  d1, h1, v1 = epoch_fn(d, h, v, data, *args)
  float(jnp.sum(d1))  # true sync (block_until_ready is unreliable here)
  log(f"b={batch_size}: compile+first call {time.time() - t0:.1f}s")

  def run_once(state):
    dd, hh, vv = state if state is not None else (d1, h1, v1)
    return epoch_fn(dd, hh, vv, data, *args)

  dt = _timed_best_of_two(run_once, timed_calls,
                          lambda st: float(jnp.sum(st[0])))
  patches = scan_steps * batch_size * timed_calls
  pps = patches / dt
  log(f"b={batch_size}: {patches} patches in {dt:.3f}s -> "
      f"{pps:,.0f} patches/s")
  return pps, dt


def measure_subspace(batch_size, scan_steps, timed_calls=2,
                     log=lambda *a: None, mxu="highest",
                     formulation="fused"):
  """Subspace (group-sparse) fused train segment at the flagship config
  (64 groups of 4, FISTA-25, cheap-quad update).  formulation:
  'fused' (single-chip whole-segment kernel) or 'dp_rdma' (the
  whole-segment group DP kernel on a 1-device mesh -- the per-chip
  rate multi-chip DP keeps; at axis size 1 the in-kernel stats
  exchange short-circuits, see BENCH_NOTES UPDATE 34)."""
  import jax
  import jax.numpy as jnp

  from vtc_tpu.analysis_transforms.fully_connected import (
      subspace_ista_fista)
  from vtc_tpu.ops import lipschitz as lip
  from vtc_tpu.ops.pallas_train_step import (
      fused_group_train_segment_pallas)

  groups = tuple(tuple(range(i, i + 4)) for i in range(0, S, 4))
  rng = np.random.RandomState(0)
  d0 = rng.randn(S, N).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  d = jnp.asarray(d0)
  h = jnp.full((S,), 0.01, jnp.float32)
  gi, vm = subspace_ista_fista.pack_group_indices(groups, S)
  grouped = subspace_ista_fista.build_grouped_dictionary(d, gi, vm)
  _, v = lip.top_gram_eigenpair(grouped)
  data = jnp.asarray(
      rng.randn(scan_steps, batch_size, N).astype(np.float32))

  if formulation == "dp_rdma":
    from vtc_tpu.parallel import make_mesh
    from vtc_tpu.training.compiled_epoch import (
        _dp_rdma_group_segment_runner)
    runner = _dp_rdma_group_segment_runner(
        make_mesh(data=1), "data", 1, "fista",
        "subspace_sc_cheap_quadratic_descent", 1, False, True, groups,
        mxu=mxu)

    def run_once(state):
      dd, hh, vv = state if state is not None else (d, h, v)
      return runner(dd, hh, vv, data, jnp.float32(0.008),
                    jnp.int32(FISTA_ITERS), jnp.float32(0.05))
  else:
    def run_once(state):
      dd, hh, vv = state if state is not None else (d, h, v)
      out = fused_group_train_segment_pallas(
          dd, hh, vv, data, jnp.float32(0.008), jnp.int32(FISTA_ITERS),
          jnp.float32(0.05), group_assignments=groups, power_iters=2,
          mxu=mxu)
      return out[:3]

  t0 = time.time()
  st = run_once(None)
  float(jnp.sum(st[0]))
  log(f"subspace b={batch_size}: compile+first call {time.time()-t0:.1f}s")
  dt = _timed_best_of_two(run_once, timed_calls,
                          lambda s_: float(jnp.sum(s_[0])))
  pps = scan_steps * batch_size * timed_calls / dt
  log(f"subspace b={batch_size}: {pps:,.0f} patches/s")
  return pps


def measure_bigdict(scan_steps, timed_calls=2, log=lambda *a: None,
                    s=2048, b=128, formulation="residual",
                    grouped=False):
  """Beyond-VMEM dictionary: s=2048 @ n=256 -- the (s, s) Gram alone
  is 16 MB, so ops/pallas_train_step's gram-form kernel rejects the
  shape and round-2 fell back to the XLA scan.  The code-sharded
  segment kernel's RESIDUAL form (ops/pallas_code_shard_train, axis
  size 1 here) never builds that Gram, keeping huge dictionaries on a
  fused path.  formulation='xla' times the scan fallback for the A/B
  row.  grouped=True runs the group-sparse variant (s/4 groups of 4,
  subspace FISTA + subspace cheap-quad update) on the same geometry --
  the heavily-overcomplete grouped case SURVEY §2.2 motivates."""
  import jax
  import jax.numpy as jnp

  from vtc_tpu.ops import lipschitz as lip
  from vtc_tpu.ops.pallas_train_step import fused_segment_supported
  from vtc_tpu.parallel import make_mesh
  from vtc_tpu.training.compiled_epoch import (_code_shard_segment_runner,
                                               _segment_runner)
  from vtc_tpu.training.sparse_coding import build_raw_step_fn

  assert not fused_segment_supported(
      "fully-connected", "fista", "sc_cheap_quadratic_descent",
      batch_size=b, code_size=s, input_size=N), (
      "config must exceed the gram-form kernel's VMEM budget")

  groups = ([list(range(i, i + 4)) for i in range(0, s, 4)]
            if grouped else None)
  rng = np.random.RandomState(0)
  d0 = rng.randn(s, N).astype(np.float32)
  d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
  d = jnp.asarray(d0)
  h = jnp.zeros(s, jnp.float32)
  _, v = lip.top_gram_eigenpair(d)  # n-dim (s > n; == grouped-Gram's
  #                                    eigvec for a disjoint partition)
  data = jnp.asarray(
      rng.randn(scan_steps, b, N).astype(np.float32))
  args = (jnp.float32(0.008), jnp.int32(FISTA_ITERS), jnp.float32(0.1))

  if formulation == "residual" and grouped:
    from vtc_tpu.ops.pallas_code_shard_train import (
        code_shard_group_arrays)
    runner = _code_shard_segment_runner(
        make_mesh(data=1, code=1), 1, 1, "fista",
        "subspace_sc_cheap_quadratic_descent", 1, False, False, True,
        group_arrays=code_shard_group_arrays(groups, s, 1))
  elif formulation == "residual":
    runner = _code_shard_segment_runner(
        make_mesh(data=1, code=1), 1, 1, "fista",
        "sc_cheap_quadratic_descent", 1, False, False, True)
  else:
    raw = build_raw_step_fn(
        "fully-connected",
        "subspace_fista" if grouped else "fista",
        ("subspace_sc_cheap_quadratic_descent" if grouped
         else "sc_cheap_quadratic_descent"),
        group_assignments=groups,
        fc_formulation="gram", compute_stepsize_in_step=False)
    if grouped:
      from vtc_tpu.analysis_transforms.fully_connected import (
          subspace_ista_fista)
      gi, vm = subspace_ista_fista.pack_group_indices(groups, s)
      lipm = lambda dd: subspace_ista_fista.build_grouped_dictionary(
          dd, gi, vm)
    else:
      lipm = lambda dd: dd
    runner = _segment_runner(raw, 1, True, lipm)

  t0 = time.time()
  st = runner(d, h, v, data, *args)
  float(jnp.sum(st[0]))
  log(f"bigdict[{formulation}] s={s} b={b}: compile+first "
      f"{time.time() - t0:.1f}s")

  def run_once(state):
    dd, hh, vv = state if state is not None else st
    return runner(dd, hh, vv, data, *args)

  dt = _timed_best_of_two(run_once, timed_calls,
                          lambda s_: float(jnp.sum(s_[0])))
  pps = scan_steps * b * timed_calls / dt
  log(f"bigdict[{formulation}] s={s}: {pps:,.0f} patches/s")
  return pps


def measure_conv(batch_size, scan_steps, timed_calls=2,
                 log=lambda *a: None, mxu="highest", kdim=16, s=64,
                 formulation="fused", tag=""):
  """Convolutional train step, default the reference conv config (64
  16x16 kernels, stride 8, 256x256 images + analysis padding -> 33x33
  code maps), scanned over `scan_steps` batches resident in HBM -- via
  the whole-segment fused conv kernel the scanned trainer auto-selects
  (ops/pallas_conv_train; warm Lipschitz tracking, exact eigenpair
  seed).  kdim/s vary the geometry (non-stride-multiple kernels run
  the zero-extension path); formulation='gram' times the XLA scan of
  the gram-formulation step instead (the fallback path, for A/B
  rows)."""
  import jax
  import jax.numpy as jnp

  from vtc_tpu.ops import conv_shapes
  from vtc_tpu.ops import lipschitz as lip
  from vtc_tpu.ops.pallas_conv_train import (
      fused_conv_train_segment_pallas)

  stride, img = (8, 8), 256
  lead, trail = conv_shapes.get_padding_amt(img, kdim, stride[0])
  # stride-exact trailing correction ((padded - kernel) % stride == 0,
  # the repo's conv shape contract) for non-stride-multiple kernels
  trail += (-(img + lead + trail - kdim)) % stride[0]
  pad = (lead, trail)
  padding = (pad, pad)
  hw = img + pad[0] + pad[1]

  rng = np.random.RandomState(0)
  d0 = rng.randn(s, 1, kdim, kdim).astype(np.float32)
  d0 /= np.sqrt((d0 ** 2).sum(axis=(1, 2, 3), keepdims=True))
  d = jnp.asarray(d0)
  h = jnp.full((s,), 0.01, jnp.float32)
  _, v = lip.top_gram_eigenpair(d.reshape(s, -1))
  key = jax.random.PRNGKey(0)
  data = 0.3 * jax.random.normal(
      key, (scan_steps, batch_size, 1, hw, hw), jnp.float32)
  mask = conv_shapes.create_mask(data.shape[1:], padding, jnp.float32)
  data = data * mask  # zero the analysis-padding border like real input
  float(jnp.sum(data))  # materialize before timing

  if formulation == "fused":
    def epoch(dd, hh, vv):
      out = fused_conv_train_segment_pallas(
          dd, hh, vv, data, jnp.float32(0.05), jnp.int32(FISTA_ITERS),
          jnp.float32(0.05), kernel_stride=stride, padding=padding,
          power_iters=2, mxu=mxu)
      return out[:3]
  elif formulation == "dp_rdma":
    # whole-segment conv DP kernel on a 1-device mesh: the per-chip
    # rate multi-chip DP keeps (in-kernel RDMA stats all-reduce; at
    # axis size 1 the exchange short-circuits, BENCH_NOTES UPDATE 34)
    from vtc_tpu.parallel import make_mesh
    from vtc_tpu.training.compiled_epoch import (
        _dp_rdma_conv_segment_runner)
    runner = _dp_rdma_conv_segment_runner(
        make_mesh(data=1), "data", 1, "fista",
        "sc_cheap_quadratic_descent", 1, False, False, True, stride,
        padding, mxu=mxu)

    def epoch(dd, hh, vv):
      return runner(dd, hh, vv, data, jnp.float32(0.05),
                    jnp.int32(FISTA_ITERS), jnp.float32(0.05))
  else:
    # the XLA fallback: lax.scan of the gram-formulation conv step with
    # warm power tracking (compiled_epoch._segment_runner semantics)
    from vtc_tpu.training.compiled_epoch import _segment_runner
    from vtc_tpu.training.sparse_coding import build_raw_step_fn
    raw = build_raw_step_fn(
        "convolutional", "fista", "sc_cheap_quadratic_descent",
        kernel_stride=stride, padding=padding,
        conv_formulation="gram", compute_stepsize_in_step=False)
    runner = _segment_runner(raw, 1, True,
                             lambda dd: dd.reshape(dd.shape[0], -1))

    def epoch(dd, hh, vv):
      return runner(dd, hh, vv, data, jnp.float32(0.05),
                    jnp.int32(FISTA_ITERS), jnp.float32(0.05))

  t0 = time.time()
  st = epoch(d, h, v)
  float(jnp.sum(st[0]))
  log(f"conv{tag} b={batch_size}: compile+first call "
      f"{time.time() - t0:.1f}s")

  def run_once(state):
    dd, hh, vv = state if state is not None else st
    return epoch(dd, hh, vv)

  dt = _timed_best_of_two(run_once, timed_calls,
                          lambda s_: float(jnp.sum(s_[0])))
  ips = scan_steps * batch_size * timed_calls / dt
  log(f"conv{tag} b={batch_size}: {ips:,.0f} images/s")
  return ips


def main():
  smoke = "--smoke" in sys.argv

  def log(*a):
    print(*a, file=sys.stderr)

  if "--streaming-ab" in sys.argv:
    rows = measure_streaming_ab(log=log)
    print(json.dumps({"streaming_ab": rows}))
    return

  detail = {}
  if smoke:
    import jax
    jax.config.update("jax_platforms", "cpu")
    global FISTA_ITERS
    FISTA_ITERS = 5
    pps_ref, epoch_seconds = measure(32, 2, timed_calls=1, log=log,
                                     formulation="gram")
    pps_big = pps_ref
  else:
    # headline: the reference's own flagship config -- batch 250, 1M
    # patches/epoch (4 calls x 1000 scanned steps x 250 = exactly 1M),
    # the whole segment as ONE Pallas kernel at full-f32 (parity-grade)
    # precision
    pps_ref, epoch_seconds = measure(250, 1000, timed_calls=4, log=log)
    # TPU-saturating batch: the batch-tiled fused kernel (per-tile
    # gradient accumulation in VMEM scratch, update on the last tile)
    pps_big, _ = measure(2048, 64, timed_calls=3, log=log)
    # the other two model families, with roofline accounting
    pps_sub = measure_subspace(250, 1000, log=log)
    ips_conv5 = measure_conv(5, 100, log=log)
    ips_conv40 = measure_conv(40, 25, log=log)
    detail["subspace_batch250"] = {
        "patches_per_sec": round(pps_sub, 1),
        **roofline_fields(subspace_step_flops(250), pps_sub / 250)}
    detail["conv_batch5"] = {
        "images_per_sec": round(ips_conv5, 1),
        **roofline_fields(conv_step_flops(5), ips_conv5 / 5)}
    detail["conv_batch40"] = {
        "images_per_sec": round(ips_conv40, 1),
        **roofline_fields(conv_step_flops(40), ips_conv40 / 40)}
    # kernel % stride != 0 (12x12 kernels, stride 8): the fused direct
    # kernel's zero-extension path vs the XLA gram-scan fallback that
    # previously served this geometry
    ips_nm = measure_conv(40, 25, log=log, kdim=12, tag="-k12s8")
    ips_nm_gram = measure_conv(40, 10, log=log, kdim=12,
                               formulation="gram", tag="-k12s8-gram")
    detail["conv_nonmultiple_k12s8_batch40"] = {
        "images_per_sec": round(ips_nm, 1),
        "images_per_sec_gram_fallback": round(ips_nm_gram, 1),
        "speedup_vs_gram": round(ips_nm / ips_nm_gram, 2),
        # executed-work accounting: the zero-extended 12x12@8 kernel
        # runs the same block-matmul shapes as 16x16@8 (khp=16, R=4),
        # which conv_step_flops derives from the geometry itself
        **roofline_fields(conv_step_flops(40, kdim=12), ips_nm / 40)}
    # full-occupancy geometry (s=128 >= one MXU tile; BENCH_NOTES
    # UPDATE 17 predicted full occupancy here -- measured evidence)
    ips_s128 = measure_conv(40, 25, log=log, s=128, tag="-s128")
    detail["conv_s128_batch40"] = {
        "images_per_sec": round(ips_s128, 1),
        **roofline_fields(conv_step_flops(40, s=128), ips_s128 / 40)}
    # ICA steps are ~3x shorter than fc steps, so the row needs more
    # chained work for the same dispatch-overhead amortization as the
    # other rows (~15 ms/block pollutes a 50 ms block by 30% but a
    # 260 ms block by 6%; BENCH_NOTES UPDATE 35)
    pps_ica = measure_ica(250, 2000, timed_calls=8, log=log)
    detail["ica_batch250"] = {
        "patches_per_sec": round(pps_ica, 1),
        **roofline_fields(ica_step_flops(250), pps_ica / 250)}
    detail["fc_batch250"] = roofline_fields(fc_step_flops(250),
                                            pps_ref / 250)
    # per-chip speed of the multi-chip whole-segment DP kernel
    # (in-kernel RDMA stats all-reduce) on a 1-device mesh -- the rate
    # each chip sustains under data parallelism
    pps_dp, _ = measure(250, 1000, timed_calls=4, log=log,
                        formulation="dp_rdma")
    detail["fc_dp_rdma_batch250"] = {
        "patches_per_sec_per_chip": round(pps_dp, 1),
        "pct_of_single_chip_fused": round(100 * pps_dp / pps_ref, 1)}
    # the other three families' whole-segment DP kernels, same
    # per-chip-rate contract (round-4 closes the fc-only gap).  conv
    # at the reference's own conv batch (5): the conv DP kernel's
    # gram-form stats + per-shard state admit b_shard <= 5 at this
    # geometry (larger shards route to the per-step fused-DP path,
    # tests/test_dp_rdma_gate.py)
    ips_conv_dp = measure_conv(5, 100, log=log, formulation="dp_rdma",
                               tag="-dp-rdma")
    detail["conv_dp_rdma_batch5"] = {
        "images_per_sec_per_chip": round(ips_conv_dp, 1),
        "pct_of_single_chip_fused": round(100 * ips_conv_dp / ips_conv5,
                                          1)}
    pps_sub_dp = measure_subspace(250, 1000, log=log,
                                  formulation="dp_rdma")
    detail["subspace_dp_rdma_batch250"] = {
        "patches_per_sec_per_chip": round(pps_sub_dp, 1),
        "pct_of_single_chip_fused": round(100 * pps_sub_dp / pps_sub,
                                          1)}
    pps_ica_dp = measure_ica(250, 2000, timed_calls=8, log=log,
                             formulation="dp_rdma")
    detail["ica_dp_rdma_batch250"] = {
        "patches_per_sec_per_chip": round(pps_ica_dp, 1),
        "pct_of_single_chip_fused": round(100 * pps_ica_dp / pps_ica,
                                          1)}
    # beyond-VMEM dictionary (s=2048: the s x s Gram breaks the fused
    # kernel's budget): residual-form code-shard kernel vs the XLA
    # scan fallback round 2 used for this shape
    pps_big_res = measure_bigdict(200, log=log)
    pps_big_xla = measure_bigdict(200, log=log, formulation="xla")
    detail["fc_bigdict_s2048_batch128"] = {
        "patches_per_sec": round(pps_big_res, 1),
        "patches_per_sec_xla_fallback": round(pps_big_xla, 1),
        "speedup_vs_fallback": round(pps_big_res / pps_big_xla, 2)}
    # the grouped variant of the same beyond-VMEM geometry (512 groups
    # of 4): the round-4 group code-shard kernel in its axis_size=1
    # residual form vs the XLA subspace scan fallback
    pps_gbig_res = measure_bigdict(200, log=log, grouped=True)
    pps_gbig_xla = measure_bigdict(50, log=log, formulation="xla",
                                   grouped=True)
    detail["group_bigdict_s2048_batch128"] = {
        "patches_per_sec": round(pps_gbig_res, 1),
        "patches_per_sec_xla_fallback": round(pps_gbig_xla, 1),
        "speedup_vs_fallback": round(pps_gbig_res / pps_gbig_xla, 2)}
    detail["fc_batch2048"] = roofline_fields(fc_step_flops(2048),
                                             pps_big / 2048)
    # opt-in bf16 training-speed mode (all_params['train_precision'] =
    # 'bf16'): hot-loop matmuls single-pass bf16.  NOT parity grade --
    # reported as a separate detail row, never the headline
    pps_bf16x3, _ = measure(250, 1000, timed_calls=4, log=log,
                            mxu="bf16x3")
    detail["fc_batch250_bf16x3_training_mode"] = {
        "patches_per_sec": round(pps_bf16x3, 1),
        "speedup_vs_f32_headline": round(pps_bf16x3 / pps_ref, 2)}
    pps_bf16, _ = measure(250, 1000, timed_calls=4, log=log,
                          mxu="bf16")
    detail["fc_batch250_bf16_training_mode"] = {
        "patches_per_sec": round(pps_bf16, 1),
        "speedup_vs_f32_headline": round(pps_bf16 / pps_ref, 2)}
    ips_conv40_x3 = measure_conv(40, 25, log=log, mxu="bf16x3")
    detail["conv_batch40_bf16x3_training_mode"] = {
        "images_per_sec": round(ips_conv40_x3, 1),
        "speedup_vs_f32": round(ips_conv40_x3 / ips_conv40, 2)}
    ips_conv40_bf16 = measure_conv(40, 25, log=log, mxu="bf16")
    detail["conv_batch40_bf16_training_mode"] = {
        "images_per_sec": round(ips_conv40_bf16, 1),
        "speedup_vs_f32": round(ips_conv40_bf16 / ips_conv40, 2)}
    pps_sub_bf16 = measure_subspace(250, 1000, log=log, mxu="bf16x3")
    detail["subspace_batch250_bf16x3_training_mode"] = {
        "patches_per_sec": round(pps_sub_bf16, 1),
        "speedup_vs_f32": round(pps_sub_bf16 / pps_sub, 2)}
    pps_ica_x3 = measure_ica(250, 2000, timed_calls=8, log=log,
                             mxu="bf16x3")
    detail["ica_batch250_bf16x3_training_mode"] = {
        "patches_per_sec": round(pps_ica_x3, 1),
        "speedup_vs_f32": round(pps_ica_x3 / pps_ica, 2)}
    # round 5 completes the bf16 matrix: the subspace bf16 mode exists
    # since commit 5cdeb63 (2.03x, tracking notes in BENCH_NOTES) and
    # the ICA bf16 tier is measured safe (UPDATE 24: 4.6e-4 dictionary
    # deviation over 4000 steps; Newton-Schulz self-corrects and the
    # guard residual always runs HIGHEST) -- both rows now published
    # alongside fc/conv so every family reports bf16x3 AND bf16
    pps_sub_b16 = measure_subspace(250, 1000, log=log, mxu="bf16")
    detail["subspace_batch250_bf16_training_mode"] = {
        "patches_per_sec": round(pps_sub_b16, 1),
        "speedup_vs_f32": round(pps_sub_b16 / pps_sub, 2)}
    pps_ica_b16 = measure_ica(250, 2000, timed_calls=8, log=log,
                              mxu="bf16")
    detail["ica_batch250_bf16_training_mode"] = {
        "patches_per_sec": round(pps_ica_b16, 1),
        "speedup_vs_f32": round(pps_ica_b16 / pps_ica, 2)}

  full_detail = {
      "epoch_1M_patches_batch250_seconds": round(epoch_seconds, 3),
      "batch2048_patches_per_sec": round(pps_big, 1),
      "baseline_estimate_patches_per_sec": BASELINE_PATCHES_PER_SEC,
      "fista_iters": FISTA_ITERS,
      **detail,
  }
  # Output contract (BENCH_NOTES UPDATE 38): the driver captures only the
  # tail of stdout and parses the LAST line.  Round 4's single giant JSON
  # line outgrew that capture and lost the headline (BENCH_r04 parsed:
  # null), so the detail rows now go on their OWN earlier line and the
  # final line is a compact headline hard-capped at HEADLINE_CAP bytes.
  print(json.dumps({"bench_detail": full_detail}))
  fam = {}
  for src, dst in _HEADLINE_FAM_KEYS:
    path, leaf = src
    row = detail.get(path)
    if isinstance(row, dict) and leaf in row:
      fam[dst] = row[leaf]
  headline = {
      "metric": "FISTA-25 dict-learning patches/sec/chip @16x16 "
                "(batch 250, full train step)",
      "value": round(pps_ref, 1),
      "unit": "patches/sec",
      "vs_baseline": round(pps_ref / BASELINE_PATCHES_PER_SEC, 2),
      "detail": {"epoch_1M_patches_batch250_seconds":
                 round(epoch_seconds, 3), **fam},
  }
  line = json.dumps(headline)
  if len(line) > HEADLINE_CAP:  # never let the headline outgrow capture
    headline["detail"] = {}
    line = json.dumps(headline)
  assert len(line) <= HEADLINE_CAP, len(line)
  print(line)


if __name__ == "__main__":
  main()
