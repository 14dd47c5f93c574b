#!/usr/bin/env python
"""Benchmark: FISTA sparse-coding dictionary learning throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

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
calls after a warmup.  Two batch sizes are measured:
  * b=250  -- the reference's own batch size (headline, vs_baseline),
    run as ONE fused Pallas kernel per 1000-step segment (dictionary /
    Hessian EMA / Lipschitz eigenvector VMEM-resident across steps,
    batches streamed HBM->VMEM; ops/pallas_train_step.py)
  * b=2048 -- TPU-saturating batch on the batch-tiled variant of the
    same fused kernel: per-tile gradient accumulation in VMEM scratch,
    update applied on each step's last tile (reported in "detail")

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


def measure(batch_size, scan_steps, timed_calls=3, log=lambda *a: None,
            formulation="fused"):
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
          dictionary, hessian, eigvec, data, sw, n_it, upd_step)
      return d, h, v
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

  # best of two timed blocks: the shared relay/chip shows occasional
  # ~15% environment dips between runs, and best-of is the standard
  # throughput estimator under one-sided noise
  dt = None
  for _block in range(2):
    t0 = time.time()
    for _ in range(timed_calls):
      d1, h1, v1 = epoch_fn(d1, h1, v1, data, *args)
    float(jnp.sum(d1))  # one sync at the end; calls pipeline on-device
    bt = time.time() - t0
    dt = bt if dt is None else min(dt, bt)
  patches = scan_steps * batch_size * timed_calls
  pps = patches / dt
  log(f"b={batch_size}: {patches} patches in {dt:.3f}s -> "
      f"{pps:,.0f} patches/s")
  return pps, dt


def main():
  smoke = "--smoke" in sys.argv

  def log(*a):
    print(*a, file=sys.stderr)

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

  result = {
      "metric": "FISTA-25 dict-learning patches/sec/chip @16x16 "
                "(batch 250, full train step)",
      "value": round(pps_ref, 1),
      "unit": "patches/sec",
      "vs_baseline": round(pps_ref / BASELINE_PATCHES_PER_SEC, 2),
      "detail": {
          "epoch_1M_patches_batch250_seconds": round(epoch_seconds, 3),
          "batch2048_patches_per_sec": round(pps_big, 1),
          "baseline_estimate_patches_per_sec": BASELINE_PATCHES_PER_SEC,
          "fista_iters": FISTA_ITERS,
      },
  }
  print(json.dumps(result))


if __name__ == "__main__":
  main()
