"""High-throughput dataset encoding (inference-only serving path).

The reference encodes whole datasets with a single solver call on one
device (experiments/rate_distortion_sparse_coding.py:742-751 --
``fista.run(all_patches, dictionary, sp, 1000)``), which is bounded by
device memory and leaves no batching, streaming, or multi-chip story.
``encode_dataset`` is the TPU-native production version of that flow:

* the dataset is cut into fixed-size batches and each CHUNK of batches
  runs as ONE compiled ``lax.scan`` program (one dispatch per chunk, not
  per batch -- dispatch costs ~30 ms on tunneled runtimes);
* the stepsize (top Gram eigenvalue) is computed ONCE per dictionary
  and amortized across every batch, like the trainers do;
* on TPU each batch solve is the fused Pallas kernel (fc:
  ops/pallas_fista, subspace: ops/pallas_group_fista, conv:
  ops/pallas_conv_direct via the solver ``run`` dispatchers);
* chunks are host->HBM double-buffered (the next chunk's device_put
  overlaps the current chunk's compute) and results are drained one
  chunk behind (the device->host copy overlaps compute too), so
  datasets far larger than HBM stream at compute speed given host
  bandwidth;
* ``data_parallel``: a ``jax.sharding.Mesh`` shards every batch over
  the mesh's data axes (inference is embarrassingly parallel -- no
  collective at all); chunks are device_put directly to the sharded
  layout so each chip's shard rides its own host->HBM DMA.

Used by api.SparseCoder.encode(batch_size=...) and available directly:

  codes = encode_dataset(patches, dictionary, 0.008, 100)
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp


def _solver(mode, group_assignments):
  if mode == "convolutional":
    from vtc_tpu.analysis_transforms.convolutional import ista_fista
    return "conv", ista_fista.run
  if group_assignments is not None:
    from vtc_tpu.analysis_transforms.fully_connected import (
        subspace_ista_fista)
    return "subspace", subspace_ista_fista.run
  from vtc_tpu.analysis_transforms.fully_connected import ista_fista
  return "fc", ista_fista.run


@functools.lru_cache(maxsize=64)
def _chunk_encoder(kind, run_fn, variant, nonneg, hard, formulation,
                   group_assignments, kernel_stride, padding, mesh,
                   dp_axes_, mxu_precision):
  """jitted (batches, dictionary, sw, n_it, eta) -> codes, scanning the
  batch axis inside one program.  Cached per static config."""

  def encode(batches, dictionary, sw, n_it, eta):
    def body(_, batch):
      if kind == "fc":
        codes = run_fn(batch, dictionary, sw, n_it, variant=variant,
                       nonnegative_only=nonneg, hard_threshold=hard,
                       stepsize=eta, formulation=formulation,
                       mxu_precision=mxu_precision)
      elif kind == "subspace":
        codes = run_fn(batch, dictionary, list(group_assignments), sw,
                       n_it, variant=variant, hard_threshold=hard,
                       stepsize=eta, formulation=formulation,
                       mxu_precision=mxu_precision)
      else:
        codes = run_fn(batch, dictionary, kernel_stride, padding, sw,
                       n_it, variant=variant, nonnegative_only=nonneg,
                       hard_threshold=hard, stepsize=eta,
                       formulation=formulation,
                       mxu_precision=mxu_precision)
      return (), codes

    _, codes = jax.lax.scan(body, (), batches)
    return codes

  if mesh is None:
    return jax.jit(encode)

  from jax.sharding import PartitionSpec as P
  rep = P()
  # scanned shapes: conv in (k, b, c, h, w) -> out (k, b, s, sh, sw);
  # fc/subspace in (k, b, n) -> out (k, b, s)
  nd = 5 if kind == "conv" else 3
  batch_spec = P(*((None, dp_axes_) + (None,) * (nd - 2)))
  out_spec = batch_spec
  return jax.jit(jax.shard_map(
      encode, mesh=mesh, in_specs=(batch_spec, rep, rep, rep, rep),
      out_specs=out_spec, check_vma=False))


def encode_dataset(data, dictionary, sparsity_weight, num_iters, *,
                   mode="fully-connected", batch_size=1024,
                   chunk_batches=8, variant="fista",
                   group_assignments=None, kernel_stride=None,
                   padding=None, nonnegative_only=False,
                   hard_threshold=False, formulation=None,
                   lipschitz_method="eigvalsh", data_parallel=None,
                   mxu_precision="highest"):
  """Encode a full dataset into codes, batched + streamed + compiled.

  Args:
    data: host array -- (D, n) flattened patches (fully-connected /
      subspace) or (D, c, h, w) PADDED images (convolutional; pad with
      vtc_tpu.ops.conv_shapes first, as for the conv trainer).
    dictionary: (s, n) or (s, c, kh, kw) trained dictionary.
    sparsity_weight, num_iters, variant: solver parameters (reference
      semantics; see the per-mode ``run`` docstrings).
    mode: 'fully-connected' or 'convolutional'.
    batch_size: rows per solver call (the Pallas kernels tile batches
      internally; 1024-4096 saturates a v5e chip for s=n=256).
    chunk_batches: batches per compiled dispatch AND per host->HBM
      transfer unit; device footprint is ~2 input chunks + 2 output
      chunks (double buffering).
    group_assignments: list of index lists -> group-sparse inference.
    kernel_stride, padding: conv-mode geometry (as the conv trainer).
    nonnegative_only, hard_threshold: threshold variants.
    formulation: None -> 'pallas' on TPU else 'gram' (same convention
      as the trainers); or force 'gram'/'direct'/'pallas'.
    lipschitz_method: 'eigvalsh' (exact, default) or 'power' for the
      once-per-dictionary stepsize.
    data_parallel: optional jax.sharding.Mesh; each batch is sharded
      over its data axes (batch_size must divide by the DP size).
    mxu_precision: all three families' 'pallas' formulations --
      'highest' (parity, default) | 'bf16x3' (~1e-4 accuracy, faster)
      | 'default'/'bf16' (single bf16 pass, fastest, ~1e-1 screening
      grade).  Conv tiers need the direct-kernel geometry (kernel
      dims multiples of the strides; asserts otherwise).

  Returns:
    (D, s) float32 codes (or (D, s, sh, sw) for convolutional), on host.
  """
  from vtc_tpu.ops import lipschitz as lipschitz_ops

  data = np.asarray(data, np.float32)
  total = data.shape[0]
  assert total > 0
  dictionary = jnp.asarray(np.asarray(dictionary), jnp.float32)
  if formulation is None:
    formulation = ("pallas" if jax.default_backend() == "tpu"
                   else "gram")
    if (formulation == "pallas" and mode == "convolutional"
        and kernel_stride is not None):
      # geometry-aware conv default: outside the direct kernel's gate
      # (pallas_conv_direct.supported -- stride-exact padded dims,
      # MXU-sized per-part weights) 'pallas' would route to the
      # gram-form conv kernel, which measures SLOWER than the XLA
      # gram path at reference-like geometry (BENCH_NOTES UPDATE 4).
      # Explicitly passing formulation='pallas' keeps the old routing.
      from vtc_tpu.ops import pallas_conv_direct
      bshape = (int(batch_size),) + tuple(data.shape[1:])
      if not pallas_conv_direct.supported(
          bshape, tuple(int(x) for x in np.shape(dictionary)),
          tuple(int(x) for x in kernel_stride)):
        formulation = "gram"
  if mxu_precision == "bf16":  # accept the training-tier spelling too
    mxu_precision = "default"
  assert not (nonnegative_only and group_assignments is not None), (
      "nonnegative_only is not defined for group-sparse inference "
      "(the group prox shrinks norms, not signs)")

  mesh = dp_axes_ = None
  sharding = None
  if data_parallel is not None:
    from jax.sharding import NamedSharding, PartitionSpec
    from vtc_tpu.parallel.mesh import dp_axes
    mesh = data_parallel
    dp_axes_ = dp_axes(mesh)
    size = 1
    for a in dp_axes_:
      size *= mesh.shape[a]
    assert batch_size % size == 0, (
        f"batch_size {batch_size} must divide by the DP size {size}")
    # chunks are (chunk, batch_size, ...): one leading axis on top of
    # the host dataset's layout, batch axis sharded over the data axes
    sharding = NamedSharding(
        mesh, PartitionSpec(*((None, dp_axes_)
                              + (None,) * (data.ndim - 1))))

  if mode == "convolutional":
    kind, run_fn = _solver(mode, None)
    assert kernel_stride is not None
    kernel_stride = tuple(int(x) for x in kernel_stride)
    if padding is not None:
      padding = tuple(tuple(int(x) for x in p) for p in padding)
    eta_src = dictionary.reshape(dictionary.shape[0], -1)
  elif group_assignments is not None:
    kind, run_fn = _solver(mode, group_assignments)
    group_assignments = tuple(tuple(int(m) for m in g)
                              for g in group_assignments)
    from vtc_tpu.analysis_transforms.fully_connected import (
        subspace_ista_fista)
    gi, vm = subspace_ista_fista.pack_group_indices(
        group_assignments, dictionary.shape[0])
    eta_src = subspace_ista_fista.build_grouped_dictionary(
        dictionary, gi, vm)
  else:
    kind, run_fn = _solver(mode, None)
    eta_src = dictionary
  eta = jnp.asarray(
      lipschitz_ops.fista_stepsize(eta_src, lipschitz_method),
      jnp.float32)

  encoder = _chunk_encoder(
      kind, run_fn, variant, bool(nonnegative_only),
      bool(hard_threshold), formulation, group_assignments,
      kernel_stride, padding, mesh, dp_axes_, str(mxu_precision))

  sw = jnp.asarray(sparsity_weight, jnp.float32)
  n_it = jnp.asarray(num_iters, jnp.int32)

  # pad the tail to a whole batch (zero rows give zero codes; dropped
  # at the end), then walk the dataset in chunk_batches-sized chunks
  num_batches = -(-total // batch_size)
  padded = num_batches * batch_size
  if padded != total:
    data = np.concatenate(
        [data, np.zeros((padded - total,) + data.shape[1:],
                        np.float32)], axis=0)
  data = data.reshape((num_batches, batch_size) + data.shape[1:])

  def _put(x):
    return (jax.device_put(x) if sharding is None
            else jax.device_put(x, sharding))

  results = []
  pending = None  # (device codes) of the previous chunk, drained late
  staged = _put(data[:chunk_batches])
  pos = 0
  while pos < num_batches:
    nxt = min(pos + chunk_batches, num_batches)
    out = encoder(staged, dictionary, sw, n_it, eta)
    if nxt < num_batches:
      # overlap the next chunk's host->HBM transfer with this compute
      staged = _put(data[nxt:nxt + chunk_batches])
    if pending is not None:
      # drain the PREVIOUS chunk's codes -- its device->host copy
      # overlaps the chunk dispatched above
      results.append(np.asarray(pending))
    pending = out
    pos = nxt
  results.append(np.asarray(pending))
  codes = np.concatenate(results, axis=0)
  codes = codes.reshape((padded,) + codes.shape[2:])
  return codes[:total]
