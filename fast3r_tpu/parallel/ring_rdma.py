"""In-kernel RDMA ring flash attention (forward) with BOUNDED comm memory.

The XLA ring in parallel/sequence.py rotates K/V with jax.lax.ppermute
between flash-kernel calls: the transfer of hop i+1 is only overlapped with
the attention of hop i when XLA's latency-hiding scheduler chooses to.  This
kernel makes the overlap STRUCTURAL: one pallas_call per device owns both
the compute and the interconnect transfers (pltpu.make_async_remote_copy),
so the next shard always streams while the resident shard's attention runs.

Topology — the textbook ring with TWO reusable slots + back-pressure
(replacing r2's full-gather (n, BH, S_loc, D) slots, whose O(global K/V)
footprint undercut the scaling argument — VERDICT r2 item 5):

  * comm_k/comm_v live in HBM shaped (2, BH, S_loc, D): shard epoch s
    occupies slot s % 2 — comm memory is O(S_loc), independent of the ring
    size n.
  * grid (n, BH, q_blocks), shard epoch OUTERMOST.  The online-softmax
    state (m | acc+l) for every (head, q-block) persists BETWEEN epochs in
    HBM scratch, DMA'd through VMEM per cell (state traffic is ~2.6 KB per
    token-head per epoch vs 4*S_loc*D flops: irrelevant above ~2k
    tokens/device).  Input/output aliasing can NOT carry this state — the
    pipeline does not round-trip revisited blocks (verified empirically).
  * hop j copies my slot (j-1)%2 into the RIGHT neighbour's slot j%2.
    Cell (s, 0, 0) runs the epoch logistics: await shard s's arrival, then
    launch hop s+1 — so shard s+1 is in flight while all of epoch s
    computes.  Slot reuse is guarded by back-pressure semaphores: the LAST
    cell of epoch s waits the hop-(s+1) send (slot s%2's bytes have left)
    and then signals capacity to the LEFT neighbour, whose hop s+2 (the
    next write into this slot) blocks on that signal.  Launches of hop
    j >= 2 wait the capacity of the right neighbour's target slot.
  * attention per (head, q-block) streams K/V tiles comm->VMEM with
    double-buffered local DMA (the standard flash inner loop).

Semaphore budget (all reused mod 2): DMA recv/send per (slot, k|v), one
REGULAR capacity semaphore per slot, 2 local-copy + 4 tile-copy DMA sems.
An n=1 ring degenerates to local-copy + compute with no remote ops — the
single-chip configuration used to exercise the Mosaic lowering on real
hardware (VERDICT r2 item 5; interpreter-green != TPU-green).

Expected-overlap model (BENCHMARKS.md "Ring attention"): per hop a device
moves bytes_h = 2 * BH * S_loc * D * itemsize over one ICI link while
computing 4 * BH * S_loc^2 * D flops on the resident shard; at flagship
shapes (S_loc = 96k tokens, BH = 12, D = 64, bf16, v5e) the hop is ~6.6 ms
against ~290 ms of compute: ~40x slack, fully hidden.  Transfers become
exposed when S_loc drops below ~2k tokens per device.  Measured validation
needs multi-chip hardware (ROADMAP).

Used by make_seq_sharded_forward(ring_impl="rdma") — the inference path.
Training keeps the differentiable ppermute ring (custom VJP); this kernel
is forward-only.

Reference gap: the reference has no sequence parallelism at all
(SURVEY.md §5.7); this file is TPU-native new capability.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fast3r_tpu.ops.flash_attention import (
    LN2,
    LOG2E,
    NEG_INF,
    _interpret,
    _ones_width,
    _pick_block,
)

MAX_BLOCK_Q = 512
MAX_BLOCK_KV = 1024
NSLOTS = 2


def _hop_descriptors(comm_k, comm_v, j, right, send_sem, recv_sem):
    """RDMA descriptors for hop j: my slot (j-1)%2 -> right's slot j%2.
    (Descriptors are cheap handles over refs+semaphores — recreating one to
    wait on is the pallas idiom for split start/wait sites.)"""
    src = jax.lax.rem(j - 1, NSLOTS)
    dst = jax.lax.rem(j, NSLOTS)
    rk = pltpu.make_async_remote_copy(
        src_ref=comm_k.at[src], dst_ref=comm_k.at[dst],
        send_sem=send_sem.at[2 * dst], recv_sem=recv_sem.at[2 * dst],
        device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
    rv = pltpu.make_async_remote_copy(
        src_ref=comm_v.at[src], dst_ref=comm_v.at[dst],
        send_sem=send_sem.at[2 * dst + 1],
        recv_sem=recv_sem.at[2 * dst + 1],
        device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
    return rk, rv


def _hop(comm_k, comm_v, j, right, send_sem, recv_sem):
    rk, rv = _hop_descriptors(comm_k, comm_v, j, right, send_sem, recv_sem)
    rk.start()
    rv.start()


def _release_descriptor(cap_buf, cap_send, cap_recv, slot, target):
    """Capacity token for `slot`, implemented as a tiny remote copy: the
    arrival increments the receiver's cap_recv[slot] — a remote semaphore
    signal expressed through the one RDMA primitive that exists in both the
    Mosaic lowering AND the interpreter (pltpu.semaphore_signal with a
    device_id has no interpret-mode implementation)."""
    return pltpu.make_async_remote_copy(
        src_ref=cap_buf.at[slot], dst_ref=cap_buf.at[slot],
        send_sem=cap_send.at[slot], recv_sem=cap_recv.at[slot],
        device_id=target, device_id_type=pltpu.DeviceIdType.LOGICAL)


def _ring_fwd_kernel(q_ref, k_ref, v_ref,
                     o_ref, lse_ref, comm_k, comm_v, cap_buf,
                     acc_hbm, m_hbm,
                     kv_vmem_k, kv_vmem_v, acc_vmem, m_vmem,
                     local_sem, recv_sem, send_sem, copy_sem,
                     cap_send, cap_recv, state_sem,
                     *, scale: float, n: int, nd: int, bk: int, bq: int,
                     d: int, axis_name: str):
    # comm/state buffers are HBM OUTPUTS, not scratch: Mosaic only allocates
    # scratch in vmem/smem/semaphore_mem (caught on hardware, r3) — and HBM
    # output refs are the standard pallas-distributed comm-buffer idiom
    # anyway (every device allocates the same outputs, so remote copies may
    # target them symmetrically).
    s = pl.program_id(0)
    bh = pl.program_id(1)
    qi = pl.program_id(2)
    nbh = pl.num_programs(1)
    nq = pl.num_programs(2)
    my = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my + 1, nd)
    left = jax.lax.rem(my + nd - 1, nd)
    S_loc = k_ref.shape[1]
    kv_steps = S_loc // bk
    slot = jax.lax.rem(s, NSLOTS)
    first_cell = (bh == 0) & (qi == 0)
    last_cell = (bh == nbh - 1) & (qi == nq - 1)

    # ---- epoch logistics (cell (s, 0, 0)) -----------------------------
    @pl.when(first_cell & (s == 0))
    def _bootstrap():
        ck = pltpu.make_async_copy(k_ref, comm_k.at[0], local_sem.at[0])
        cv = pltpu.make_async_copy(v_ref, comm_v.at[0], local_sem.at[1])
        ck.start()
        cv.start()
        ck.wait()
        cv.wait()
        if n > 1:
            _hop(comm_k, comm_v, 1, right, send_sem, recv_sem)

    if n > 1:
        @pl.when(first_cell & (s > 0))
        def _await_and_forward():
            rk, rv = _hop_descriptors(comm_k, comm_v, s, right,
                                      send_sem, recv_sem)
            rk.wait_recv()
            rv.wait_recv()

            @pl.when(s + 1 < n)
            def _launch_next():
                # hop s+1 >= 2 writes a REUSED slot on the right — block on
                # its capacity token (back-pressure): the right neighbour's
                # release copy targeting ME increments MY cap_recv[slot]
                if n > 2:
                    _release_descriptor(
                        cap_buf, cap_send, cap_recv,
                        jax.lax.rem(s + 1, NSLOTS), right).wait_recv()
                _hop(comm_k, comm_v, s + 1, right, send_sem, recv_sem)

    # ---- attention for shard s against this (head, q-block) -----------
    # q/k/v arrive LANE-PADDED to W = d + _ones_width(d): manual DMA slices
    # of HBM scratch require a 128-aligned minor dim (Mosaic rejects D=64 —
    # caught on hardware, r3).  K and Q pad with zeros (contraction
    # unaffected); V's pad lanes carry the ONES extension the MXU row-sum
    # trick needs anyway, so the kernel consumes v_ext directly.
    q = q_ref[0]  # (bq, W)

    def get_tile(buf, ki):
        return (
            pltpu.make_async_copy(
                comm_k.at[slot, bh, pl.ds(ki * bk, bk)], kv_vmem_k.at[buf],
                copy_sem.at[2 * buf]),
            pltpu.make_async_copy(
                comm_v.at[slot, bh, pl.ds(ki * bk, bk)], kv_vmem_v.at[buf],
                copy_sem.at[2 * buf + 1]),
        )

    tk0, tv0 = get_tile(0, 0)
    tk0.start()
    tv0.start()

    # ---- cross-epoch online-softmax state: HBM scratch <-> VMEM --------
    # (input/output aliasing does NOT round-trip revisited blocks through
    # the pipeline — verified empirically in interpret mode — so the state
    # carry is explicit: ~0.6 MB per cell against kv_steps MXU matmuls)
    @pl.when(s == 0)
    def _init_state():
        m_vmem[:] = jnp.full_like(m_vmem, NEG_INF)
        acc_vmem[:] = jnp.zeros_like(acc_vmem)

    @pl.when(s > 0)
    def _load_state():
        cm = pltpu.make_async_copy(
            m_hbm.at[bh, pl.ds(qi * bq, bq)], m_vmem, state_sem.at[0])
        ca = pltpu.make_async_copy(
            acc_hbm.at[bh, pl.ds(qi * bq, bq)], acc_vmem, state_sem.at[1])
        cm.start()
        ca.start()
        cm.wait()
        ca.wait()

    m_prev = m_vmem[:]
    acc_prev = acc_vmem[:]

    def tile_body(t, carry):
        m_c, acc_c = carry
        buf = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        @pl.when(t + 1 < kv_steps)
        def _prefetch():
            nk, nv = get_tile(nxt, t + 1)
            nk.start()
            nv.start()

        ck_, cv_ = get_tile(buf, t)
        ck_.wait()
        cv_.wait()

        k = kv_vmem_k[buf]
        v_ext = kv_vmem_v[buf]  # ones-extended in the pad lanes (wrapper)
        # log2-domain scores (exp2 trick, ops/flash_attention.py LOG2E note)
        s_ = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * (scale * LOG2E)
        mp = m_c[:, :1]
        m_new = jnp.maximum(mp, jnp.max(s_, axis=-1, keepdims=True))
        alpha = jnp.exp2(mp - m_new)
        p = jnp.exp2(s_ - m_new).astype(v_ext.dtype)
        # row-sum on the MXU: l rides the PV matmul's ones lanes
        # (flash_attention.py _fwd_kernel docstring)
        acc_c = acc_c * alpha + jax.lax.dot_general(
            p, v_ext, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.broadcast_to(m_new, m_c.shape), acc_c

    m_fin, acc_fin = jax.lax.fori_loop(0, kv_steps, tile_body,
                                       (m_prev, acc_prev))

    @pl.when(s < n - 1)
    def _store_state():
        m_vmem[:] = m_fin
        acc_vmem[:] = acc_fin
        cm = pltpu.make_async_copy(
            m_vmem, m_hbm.at[bh, pl.ds(qi * bq, bq)], state_sem.at[0])
        ca = pltpu.make_async_copy(
            acc_vmem, acc_hbm.at[bh, pl.ds(qi * bq, bq)], state_sem.at[1])
        cm.start()
        ca.start()
        cm.wait()
        ca.wait()

    @pl.when(s == n - 1)
    def _finish():
        l = acc_fin[:, d:d + 1]  # first ones lane
        o_ref[0] = (acc_fin[:, :d] / l).astype(o_ref.dtype)
        lse_ref[0] = (m_fin[:, :1] + jnp.log2(l)) * LN2  # natural-log

    # ---- slot release / send drain (cell (s, last, last)) -------------
    if n > 1:
        @pl.when(last_cell & (s + 1 < n))
        def _drain_send():
            rk, rv = _hop_descriptors(comm_k, comm_v, s + 1, right,
                                      send_sem, recv_sem)
            rk.wait_send()
            rv.wait_send()

        if n > 2:
            @pl.when(last_cell & (s <= n - 3))
            def _release_slot():
                # slot s%2's bytes have left (send drained) and its tiles are
                # consumed: let the LEFT neighbour's hop s+2 overwrite it.
                # The token copy is ~1 KB; waiting its send inline costs a
                # couple of µs against a whole epoch of compute.
                rel = _release_descriptor(cap_buf, cap_send, cap_recv, slot,
                                          left)
                rel.start()
                rel.wait_send()


def ring_flash_attention_rdma(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                              scale: float, axis_name: str,
                              axis_size: int,
                              self_ring_epochs: int = None) -> jnp.ndarray:
    """Drop-in for ring_flash_attention (forward only): (B, N_loc, H, D).

    axis_size: STATIC size of the ring axis (mesh.shape[axis_name]) — sizes
    the epoch grid dimension and the hop schedule.

    self_ring_epochs: debug/validation mode for axis_size == 1 — run that
    many ring epochs with every hop RDMA-ing the device's OWN slots
    (right == left == self).  Softmax over n duplicated copies of K/V
    returns the SAME output o (the duplicate weights renormalize away), so
    a self-ring must bit-match the plain single-pass kernel — this is the
    single-chip configuration that exercises the remote-copy + capacity
    -token Mosaic lowering on real hardware (VERDICT r2 item 5).
    """
    n = axis_size
    if self_ring_epochs is not None:
        assert axis_size == 1, "self-ring is a single-device mode"
        n = self_ring_epochs
    B, S_loc, H, D = q.shape
    ow = _ones_width(D)
    W = D + ow  # lane-padded width (128-aligned; kernel docstring)
    zpad = ((0, 0), (0, 0), (0, ow))
    qt = jnp.pad(jnp.swapaxes(q, 1, 2).reshape(B * H, S_loc, D), zpad)
    kt = jnp.pad(jnp.swapaxes(k, 1, 2).reshape(B * H, S_loc, D), zpad)
    vt = jnp.pad(jnp.swapaxes(v, 1, 2).reshape(B * H, S_loc, D), zpad,
                 constant_values=1)  # ones lanes = in-matmul row sum

    bq = _pick_block(S_loc, MAX_BLOCK_Q)
    bk = _pick_block(S_loc, MAX_BLOCK_KV)
    assert bq and bk, f"S_loc={S_loc} not tileable for the RDMA ring"
    BH = B * H

    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    o, lse, *_ = pl.pallas_call(
        functools.partial(_ring_fwd_kernel, scale=float(scale), n=n,
                          nd=axis_size, bk=bk, bq=bq, d=D,
                          axis_name=axis_name),
        grid=(n, BH, S_loc // bq),
        in_specs=[
            pl.BlockSpec((1, bq, W), lambda s, bh, qi: (bh, qi, 0)),
            hbm,
            hbm,
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda s, bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, bq, 1), lambda s, bh, qi: (bh, qi, 0)),
            hbm, hbm, hbm, hbm, hbm,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S_loc, D), q.dtype),
            jax.ShapeDtypeStruct((BH, S_loc, 1), jnp.float32),
            # HBM comm/state buffers (kernel docstring); discarded by caller
            jax.ShapeDtypeStruct((NSLOTS, BH, S_loc, W), kt.dtype),  # comm_k
            jax.ShapeDtypeStruct((NSLOTS, BH, S_loc, W), vt.dtype),  # comm_v
            jax.ShapeDtypeStruct((NSLOTS, 8, 128), jnp.int8),  # cap tokens
            jax.ShapeDtypeStruct((BH, S_loc, W), jnp.float32),  # acc|l state
            jax.ShapeDtypeStruct((BH, S_loc, 128), jnp.float32),  # m state
        ],
        scratch_shapes=[
            pltpu.VMEM((2, bk, W), kt.dtype),              # kv tile dbl buf
            pltpu.VMEM((2, bk, W), vt.dtype),
            pltpu.VMEM((bq, W), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),                 # local copy
            pltpu.SemaphoreType.DMA((2 * NSLOTS,)),        # recv per slot,k/v
            pltpu.SemaphoreType.DMA((2 * NSLOTS,)),        # send per slot,k/v
            pltpu.SemaphoreType.DMA((4,)),                 # kv tile copies
            pltpu.SemaphoreType.DMA((NSLOTS,)),            # capacity send
            pltpu.SemaphoreType.DMA((NSLOTS,)),            # capacity recv
            pltpu.SemaphoreType.DMA((2,)),                 # state copies
        ],
        # no collective_id: it is only legal alongside a custom barrier
        # semaphore (get_barrier_semaphore), which this kernel does not use —
        # Mosaic rejects it otherwise (caught on hardware, r3)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(qt, kt, vt)

    o = o.reshape(B, H, S_loc, D)
    return jnp.swapaxes(o, 1, 2)
