"""In-kernel cross-chip collectives for the whole-segment kernels.

One primitive: a deterministic all-to-all slot all-reduce.  Every chip
stages its payload into slot ``my_idx`` of a double-buffered comm
scratch, remote-DMAs that slot to every peer, waits for all incoming
slots, and sums slots 0..P-1 in FIXED index order -- so the reduced
value is bitwise identical on every chip (a ring all-reduce's per-chip
accumulation order differs, which would let replicated state drift).

Double-buffer phase safety (callers alternate ``phase`` per exchange,
in program order): a chip only reaches exchange e+2 after completing
exchange e+1, which required every peer's e+1 slot, which each peer
sent only after finishing its exchange-e reads -- so e+2's writes into
the e%2 buffer can never race e's reads.  This argument needs every
exchange to be BLOCKING (wait for all slots before proceeding), which
`slot_allreduce` is.

Off-TPU these run under Pallas TPU interpret mode (simulated remote
DMAs / semaphores); the interpreter needs one spare host device thread
(see ops/pallas_dp_train docstring).

Used by ops/pallas_dp_train (per-step stats all-reduce) and
ops/pallas_code_shard_train (per-iteration partial-reconstruction
all-reduce).
"""
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def slot_exchange(comm, send_sem, recv_sem, *, phase, my_idx,
                  num_devices, device_for=None):
  """All-to-all the staged comm[phase, my_idx] slot; BLOCKS until all
  P-1 incoming slots have landed.  The caller must have written its
  payload into comm[phase, my_idx] first.

  ``device_for``: optional map from slot position (0..P-1 along the
  reduced axis) to the peer's LOGICAL device id.  The default identity
  map is the 1D case (the reduced axis is the mesh's only non-trivial
  axis); on a multi-axis mesh pass the row-major linearization of the
  full mesh coordinate with only the reduced axis varying (e.g.
  ``lambda c: data_idx * code_size + c`` for a code-axis reduce on a
  (data, code) mesh) -- the slot index stays the position WITHIN the
  axis, so the comm scratch needs only axis_size slots."""
  if device_for is None:
    device_for = lambda pos: pos
  copies = []
  for off in range(1, num_devices):
    peer = jax.lax.rem(my_idx + off, num_devices)
    rdma = pltpu.make_async_remote_copy(
        src_ref=comm.at[phase, my_idx],
        dst_ref=comm.at[phase, my_idx],
        send_sem=send_sem.at[phase, off - 1],
        recv_sem=recv_sem.at[phase, my_idx],
        device_id=device_for(peer),
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma.start()
    copies.append(rdma)
  for c in copies:
    c.wait_send()
  for off in range(1, num_devices):
    src = jax.lax.rem(my_idx + num_devices - off, num_devices)
    pltpu.make_async_remote_copy(
        src_ref=comm.at[phase, src],
        dst_ref=comm.at[phase, src],
        send_sem=send_sem.at[phase, off - 1],
        recv_sem=recv_sem.at[phase, src],
        device_id=device_for(my_idx),
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    ).wait_recv()


def slot_allreduce(comm, send_sem, recv_sem, payload, *, phase, my_idx,
                   num_devices, device_for=None):
  """Deterministic all-reduce of ``payload`` (one full comm slot):
  stage, exchange, fixed-order slot sum.  Returns the global sum --
  bitwise identical on every chip.  num_devices == 1 short-circuits.
  ``device_for`` as in slot_exchange (sub-axis reduces on multi-axis
  meshes)."""
  if num_devices == 1:
    return payload
  comm[phase, my_idx] = payload
  slot_exchange(comm, send_sem, recv_sem, phase=phase, my_idx=my_idx,
                num_devices=num_devices, device_for=device_for)
  total = comm[phase, 0]
  for slot in range(1, num_devices):
    total = total + comm[phase, slot]
  return total


def comm_scratch_shapes(num_devices, slot_shape, dtype=jnp.float32):
  """(comm, send_sem, recv_sem) scratch specs for slot_allreduce."""
  return [
      pltpu.VMEM((2, num_devices) + tuple(slot_shape), dtype),
      pltpu.SemaphoreType.DMA((2, max(num_devices - 1, 1))),
      pltpu.SemaphoreType.DMA((2, num_devices)),
  ]
