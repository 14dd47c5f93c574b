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


# ---------------------------------------------------------------------
# Butterfly (recursive-doubling) all-reduce: comm scratch O(log P), not
# O(P) -- the all-to-all scheme's 2 P slots cap the whole-segment DP
# kernels at P <= 6 for the flagship fc geometry (BENCH_NOTES UPDATE
# 34 / tests/test_dp_rdma_gate.py), exactly where a real pod runs.
#
# log2(P) rounds; in round t every chip exchanges its partial with
# partner my_idx XOR 2^t and adds the received partial.  Determinism:
# after round t-1 every chip in each 2^t index block holds an
# IDENTICAL partial (induction), and round t has every chip of a
# 2^(t+1) block compute partial_A + partial_B from identical operand
# bits -- IEEE addition is COMMUTATIVE (only associativity fails), so
# a + b and b + a agree bitwise and the whole mesh ends with identical
# bits.  The association ORDER is the fixed index-block tree, so the
# result is deterministic call to call (it differs from the
# all-to-all's linear slot sum only by rounding -- a different but
# equally fixed association).
#
# Race safety: within one call each recv slot (1 + phase*L + t) is
# written exactly ONCE (by the round-t partner), so intra-call skew
# cannot race.  Across calls the butterfly is a global sync point (the
# round-L partial depends transitively on every chip's contribution),
# so call c+1's writes trail every chip's call-c reads by at most one
# call -- the recv slots are phase-double-buffered exactly like the
# all-to-all scheme.  The single staging slot 0 is only read by the
# local send DMA (wait_send precedes its next write; no phase needed).
# ---------------------------------------------------------------------


def is_pow2(p):
  """Power-of-2 axis sizes ride the butterfly; others the all-to-all."""
  p = int(p)
  return p >= 2 and (p & (p - 1)) == 0


def _butterfly_rounds(num_devices):
  l = int(num_devices).bit_length() - 1
  assert (1 << l) == int(num_devices), "butterfly needs a power of 2"
  return l


def allreduce_comm_shapes(num_devices, slot_shape, dtype=jnp.float32):
  """Scratch specs for value_allreduce: butterfly shapes for
  power-of-2 axis sizes (O(log P) slots), all-to-all otherwise."""
  if is_pow2(num_devices):
    return butterfly_comm_shapes(num_devices, slot_shape, dtype)
  return comm_scratch_shapes(num_devices, slot_shape, dtype)


def value_allreduce(comm, send_sem, recv_sem, payload, *, phase,
                    my_idx, num_devices, device_for=None):
  """Deterministic all-reduce of a full-slot VALUE payload,
  dispatching butterfly (power-of-2 P) vs the all-to-all fixed-order
  slot sum.  Scratch from allreduce_comm_shapes; num_devices == 1
  short-circuits."""
  if num_devices == 1:
    return payload
  if is_pow2(num_devices):
    comm[0] = payload
    return staged_butterfly_allreduce(
        comm, send_sem, recv_sem, phase=phase, my_idx=my_idx,
        num_devices=num_devices, device_for=device_for)
  return slot_allreduce(comm, send_sem, recv_sem, payload, phase=phase,
                        my_idx=my_idx, num_devices=num_devices,
                        device_for=device_for)


def butterfly_comm_shapes(num_devices, slot_shape, dtype=jnp.float32):
  """(comm, send_sem, recv_sem) scratch specs for
  staged_butterfly_allreduce: slot 0 staging + 2 phases x log2(P) recv
  slots."""
  l = _butterfly_rounds(num_devices)
  return [
      pltpu.VMEM((1 + 2 * l,) + tuple(slot_shape), dtype),
      pltpu.SemaphoreType.DMA((2, l)),
      pltpu.SemaphoreType.DMA((2, l)),
  ]


def butterfly_stage_ref(comm):
  """The ref the caller stages its payload sections into (slot 0)."""
  return comm.at[0]


def staged_butterfly_allreduce(comm, send_sem, recv_sem, *, phase,
                               my_idx, num_devices, device_for=None):
  """All-reduce the payload the caller staged into slot 0 of ``comm``
  (shapes from butterfly_comm_shapes).  Callers alternate ``phase``
  per exchange in program order, exactly as for slot_allreduce.
  Returns the global sum -- bitwise identical on every chip."""
  if device_for is None:
    device_for = lambda pos: pos
  l = _butterfly_rounds(num_devices)
  assert l >= 1, "num_devices == 1 has nothing to reduce"
  for t in range(l):
    partner = jax.lax.bitwise_xor(my_idx, 1 << t)
    recv_slot = 1 + t  # phase offset applied via dynamic index below
    rdma = pltpu.make_async_remote_copy(
        src_ref=comm.at[0],
        dst_ref=comm.at[recv_slot + phase * l],
        send_sem=send_sem.at[phase, t],
        recv_sem=recv_sem.at[phase, t],
        device_id=device_for(partner),
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    rdma.start()
    rdma.wait_send()
    rdma.wait_recv()
    if t < l - 1:
      comm[0] = comm[0] + comm[recv_slot + phase * l]
  return comm[0] + comm[1 + (l - 1) + phase * l]
