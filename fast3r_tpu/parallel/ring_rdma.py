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

Used by make_seq_sharded_forward(ring_impl="rdma") — the inference path —
and, since r5, by make_seq_sharded_train_step(ring_impl="rdma") through
ring_flash_attention_rdma_diff:

Backward (r5) — TWO ring kernels riding the SAME bounded-slot protocol
(bootstrap local copy, hop j: my slot (j-1)%2 -> right's slot j%2,
capacity-token back-pressure), so comm memory stays O(S_loc):

  * dq kernel: rotates K/V again (identical payload to the forward); each
    (epoch, head, q-block) cell accumulates ds0 @ K of the resident shard
    into fp32 HBM state that persists between epochs (the forward's acc|m
    state pattern) — dq is local to the query owner by construction.
  * dkv kernel: rotates (q', do, meta) where q' is pre-scaled by
    scale*log2(e) and meta packs (lse*log2(e), delta) in two fp32 lanes;
    K/V stay LOCAL, so each (epoch, head, kv-block) cell accumulates
    ds0^T @ q' and p^T @ do into HBM state — dK/dV finish at the shard's
    OWNER with no final permute.

The two-rotation split is the standard ring-attention backward shape: it
keeps every cross-epoch accumulator at O(block) state traffic instead of
the O(S_loc^2/bk) read-modify-write a single-rotation backward would need.
Gradient math mirrors ops/flash_attention.py's split backward (log2-domain
scores, p = exp2(s - lse*log2e), ds0 = p*(dp - delta), deferred
scale/LN2 factors at the output writes).

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
    _softmax_normalize,
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
        o_ref[0] = _softmax_normalize(acc_fin[:, :d], l, o_ref.dtype)
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
    o, _ = _rdma_forward(q, k, v, scale, axis_name, axis_size, n)
    return o


def _rdma_forward(q, k, v, scale, axis_name: str, axis_size: int, n: int):
    """Forward kernel wrapper returning (o (B,S,H,D), lse (BH,S_loc,1))."""
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
    return jnp.swapaxes(o, 1, 2), lse


# ---------------------------------------------------------------------------
# backward (r5): two ring kernels on the same bounded-slot protocol
# ---------------------------------------------------------------------------

def _hop_descriptors_multi(bufs, j, right, send_sem, recv_sem):
    """Hop j descriptors for an arbitrary payload: buf[i]'s slot (j-1)%2 ->
    right's slot j%2, semaphores laid out [len(bufs)*slot + i]."""
    src = jax.lax.rem(j - 1, NSLOTS)
    dst = jax.lax.rem(j, NSLOTS)
    nb = len(bufs)
    return [
        pltpu.make_async_remote_copy(
            src_ref=buf.at[src], dst_ref=buf.at[dst],
            send_sem=send_sem.at[nb * dst + i],
            recv_sem=recv_sem.at[nb * dst + i],
            device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
        for i, buf in enumerate(bufs)
    ]


def _hop_multi(bufs, j, right, send_sem, recv_sem):
    for desc in _hop_descriptors_multi(bufs, j, right, send_sem, recv_sem):
        desc.start()


def _epoch_logistics(s, first_cell, last_cell, bufs, locals_, right, left,
                     local_sem, send_sem, recv_sem,
                     cap_buf, cap_send, cap_recv, n):
    """The shared ring schedule (forward kernel docstring): bootstrap local
    copies at epoch 0, await+forward at first cell, send drain + capacity
    release at last cell.  `bufs` are the rotating comm buffers, `locals_`
    the same-shaped local HBM sources for the bootstrap."""
    @pl.when(first_cell & (s == 0))
    def _bootstrap():
        copies = [
            pltpu.make_async_copy(src, buf.at[0], local_sem.at[i])
            for i, (src, buf) in enumerate(zip(locals_, bufs))
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        if n > 1:
            _hop_multi(bufs, 1, right, send_sem, recv_sem)

    if n > 1:
        @pl.when(first_cell & (s > 0))
        def _await_and_forward():
            for desc in _hop_descriptors_multi(bufs, s, right,
                                               send_sem, recv_sem):
                desc.wait_recv()

            @pl.when(s + 1 < n)
            def _launch_next():
                if n > 2:
                    _release_descriptor(
                        cap_buf, cap_send, cap_recv,
                        jax.lax.rem(s + 1, NSLOTS), right).wait_recv()
                _hop_multi(bufs, s + 1, right, send_sem, recv_sem)

        @pl.when(last_cell & (s + 1 < n))
        def _drain_send():
            for desc in _hop_descriptors_multi(bufs, s + 1, right,
                                               send_sem, recv_sem):
                desc.wait_send()

        if n > 2:
            @pl.when(last_cell & (s <= n - 3))
            def _release_slot():
                rel = _release_descriptor(cap_buf, cap_send, cap_recv,
                                          jax.lax.rem(s, NSLOTS), left)
                rel.start()
                rel.wait_send()


def _ring_bwd_dq_kernel(q_ref, do_ref, meta_ref, k_hbm, v_hbm,
                        dq_ref, comm_k, comm_v, cap_buf, acc_hbm,
                        kv_vmem_k, kv_vmem_v, acc_vmem,
                        local_sem, recv_sem, send_sem, copy_sem,
                        cap_send, cap_recv, state_sem,
                        *, scale: float, n: int, nd: int, bk: int, bq: int,
                        d: int, axis_name: str):
    """dq ring: K/V rotate (the forward's payload); q'/do/meta stay local.

    q arrives PRE-SCALED by scale*log2(e); meta packs lse*log2(e) (lane 0)
    and delta = rowsum(do*o) (lane 1) in fp32.  dq accumulates across
    epochs in fp32 HBM state (acc_hbm), written out scaled at epoch n-1.
    """
    s = pl.program_id(0)
    bh = pl.program_id(1)
    qi = pl.program_id(2)
    nbh = pl.num_programs(1)
    nq = pl.num_programs(2)
    my = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my + 1, nd)
    left = jax.lax.rem(my + nd - 1, nd)
    S_loc = k_hbm.shape[1]
    kv_steps = S_loc // bk
    slot = jax.lax.rem(s, NSLOTS)
    first_cell = (bh == 0) & (qi == 0)
    last_cell = (bh == nbh - 1) & (qi == nq - 1)

    _epoch_logistics(s, first_cell, last_cell, [comm_k, comm_v],
                     [k_hbm, v_hbm], right, left, local_sem, send_sem,
                     recv_sem, cap_buf, cap_send, cap_recv, n)

    q = q_ref[0]              # (bq, W), pre-scaled
    do = do_ref[0]            # (bq, W), zero pad lanes
    lse2 = meta_ref[0][:, 0:1]   # lse * log2(e)
    delta = meta_ref[0][:, 1:2]

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

    @pl.when(s == 0)
    def _init_state():
        acc_vmem[:] = jnp.zeros_like(acc_vmem)

    @pl.when(s > 0)
    def _load_state():
        ca = pltpu.make_async_copy(
            acc_hbm.at[bh, pl.ds(qi * bq, bq)], acc_vmem, state_sem.at[0])
        ca.start()
        ca.wait()

    def tile_body(t, acc):
        buf = jax.lax.rem(t, 2)

        @pl.when(t + 1 < kv_steps)
        def _prefetch():
            nk, nv = get_tile(jax.lax.rem(t + 1, 2), t + 1)
            nk.start()
            nv.start()

        ck_, cv_ = get_tile(buf, t)
        ck_.wait()
        cv_.wait()
        k = kv_vmem_k[buf]    # (bk, W)
        v = kv_vmem_v[buf]
        s_ = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # log2 domain
        p = jnp.exp2(s_ - lse2)                       # (bq, bk)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds0 = (p * (dp - delta)).astype(k.dtype)
        return acc + jax.lax.dot_general(
            ds0, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc_fin = jax.lax.fori_loop(0, kv_steps, tile_body, acc_vmem[:])

    @pl.when(s < n - 1)
    def _store_state():
        acc_vmem[:] = acc_fin
        ca = pltpu.make_async_copy(
            acc_vmem, acc_hbm.at[bh, pl.ds(qi * bq, bq)], state_sem.at[0])
        ca.start()
        ca.wait()

    @pl.when(s == n - 1)
    def _finish():
        dq_ref[0] = (acc_fin[:, :d] * scale).astype(dq_ref.dtype)


def _ring_bwd_dkv_kernel(k_ref, v_ref, q_hbm, do_hbm, meta_hbm,
                         dk_ref, dv_ref, comm_q, comm_do, comm_meta,
                         cap_buf, dk_hbm, dv_hbm,
                         q_vmem, do_vmem, meta_vmem, dk_vmem, dv_vmem,
                         local_sem, recv_sem, send_sem, copy_sem,
                         cap_send, cap_recv, state_sem,
                         *, n: int, nd: int, bk: int, bq: int,
                         d: int, axis_name: str):
    """dkv ring: (q', do, meta) rotate; K/V stay LOCAL, so dK/dV finish at
    the shard owner.  dk accumulates ds0^T @ q' (the deferred LN2 factor is
    applied at the output write, ops/flash_attention.py _bwd_dkv_kernel
    note); dv accumulates p^T @ do.  Both persist across epochs in fp32 HBM
    state."""
    s = pl.program_id(0)
    bh = pl.program_id(1)
    ki = pl.program_id(2)
    nbh = pl.num_programs(1)
    nk = pl.num_programs(2)
    my = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my + 1, nd)
    left = jax.lax.rem(my + nd - 1, nd)
    S_loc = q_hbm.shape[1]
    q_steps = S_loc // bq
    slot = jax.lax.rem(s, NSLOTS)
    first_cell = (bh == 0) & (ki == 0)
    last_cell = (bh == nbh - 1) & (ki == nk - 1)

    _epoch_logistics(s, first_cell, last_cell, [comm_q, comm_do, comm_meta],
                     [q_hbm, do_hbm, meta_hbm], right, left, local_sem,
                     send_sem, recv_sem, cap_buf, cap_send, cap_recv, n)

    k = k_ref[0]   # (bk, W)
    v = v_ref[0]

    def get_tile(buf, t):
        return (
            pltpu.make_async_copy(
                comm_q.at[slot, bh, pl.ds(t * bq, bq)], q_vmem.at[buf],
                copy_sem.at[3 * buf]),
            pltpu.make_async_copy(
                comm_do.at[slot, bh, pl.ds(t * bq, bq)], do_vmem.at[buf],
                copy_sem.at[3 * buf + 1]),
            pltpu.make_async_copy(
                comm_meta.at[slot, bh, pl.ds(t * bq, bq)], meta_vmem.at[buf],
                copy_sem.at[3 * buf + 2]),
        )

    for c in get_tile(0, 0):
        c.start()

    @pl.when(s == 0)
    def _init_state():
        dk_vmem[:] = jnp.zeros_like(dk_vmem)
        dv_vmem[:] = jnp.zeros_like(dv_vmem)

    @pl.when(s > 0)
    def _load_state():
        ck = pltpu.make_async_copy(
            dk_hbm.at[bh, pl.ds(ki * bk, bk)], dk_vmem, state_sem.at[0])
        cv = pltpu.make_async_copy(
            dv_hbm.at[bh, pl.ds(ki * bk, bk)], dv_vmem, state_sem.at[1])
        ck.start()
        cv.start()
        ck.wait()
        cv.wait()

    def tile_body(t, carry):
        dk_c, dv_c = carry
        buf = jax.lax.rem(t, 2)

        @pl.when(t + 1 < q_steps)
        def _prefetch():
            for c in get_tile(jax.lax.rem(t + 1, 2), t + 1):
                c.start()

        for c in get_tile(buf, t):
            c.wait()
        q = q_vmem[buf]                  # (bq, W), pre-scaled
        do = do_vmem[buf]
        lse2 = meta_vmem[buf][:, 0:1]
        delta = meta_vmem[buf][:, 1:2]

        s_ = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (bq, bk), log2
        p = jnp.exp2(s_ - lse2)
        dv_c = dv_c + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (bk, W)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (bq, bk)
        ds0 = (p * (dp - delta)).astype(q.dtype)
        dk_c = dk_c + jax.lax.dot_general(
            ds0, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (bk, W)
        return dk_c, dv_c

    dk_fin, dv_fin = jax.lax.fori_loop(0, q_steps, tile_body,
                                       (dk_vmem[:], dv_vmem[:]))

    @pl.when(s < n - 1)
    def _store_state():
        dk_vmem[:] = dk_fin
        dv_vmem[:] = dv_fin
        ck = pltpu.make_async_copy(
            dk_vmem, dk_hbm.at[bh, pl.ds(ki * bk, bk)], state_sem.at[0])
        cv = pltpu.make_async_copy(
            dv_vmem, dv_hbm.at[bh, pl.ds(ki * bk, bk)], state_sem.at[1])
        ck.start()
        cv.start()
        ck.wait()
        cv.wait()

    @pl.when(s == n - 1)
    def _finish():
        dk_ref[0] = (dk_fin[:, :d] * LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_fin[:, :d].astype(dv_ref.dtype)


def _ring_backward(q, k, v, o, lse, do, scale, axis_name: str,
                   axis_size: int):
    """(B, S_loc, H, D) grads via the two backward ring kernels."""
    n = axis_size
    B, S_loc, H, D = q.shape
    ow = _ones_width(D)
    W = D + ow
    zpad = ((0, 0), (0, 0), (0, ow))

    def to_bhsw(x):
        return jnp.pad(jnp.swapaxes(x, 1, 2).reshape(B * H, S_loc, D), zpad)

    c = scale * LOG2E
    qs = to_bhsw((q.astype(jnp.float32) * c).astype(q.dtype))  # pre-scaled
    kt = to_bhsw(k)
    vt = to_bhsw(v)   # ZERO pad lanes (no row-sum trick in the backward)
    dot_ = to_bhsw(do)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)                       # (B, S_loc, H)
    delta = jnp.swapaxes(delta, 1, 2).reshape(B * H, S_loc)
    lse2 = lse.reshape(B * H, S_loc) * LOG2E       # natural -> log2 domain
    meta = jnp.zeros((B * H, S_loc, 128), jnp.float32)
    meta = meta.at[:, :, 0].set(lse2).at[:, :, 1].set(delta)

    bq = _pick_block(S_loc, MAX_BLOCK_Q)
    bk = _pick_block(S_loc, MAX_BLOCK_KV)
    assert bq and bk, f"S_loc={S_loc} not tileable for the RDMA ring bwd"
    BH = B * H
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)

    dq, *_ = pl.pallas_call(
        functools.partial(_ring_bwd_dq_kernel, scale=float(scale), n=n,
                          nd=axis_size, bk=bk, bq=bq, d=D,
                          axis_name=axis_name),
        grid=(n, BH, S_loc // bq),
        in_specs=[
            pl.BlockSpec((1, bq, W), lambda s, bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, bq, W), lambda s, bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, bq, 128), lambda s, bh, qi: (bh, qi, 0)),
            hbm, hbm,
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda s, bh, qi: (bh, qi, 0)),
            hbm, hbm, hbm, hbm,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S_loc, D), q.dtype),
            jax.ShapeDtypeStruct((NSLOTS, BH, S_loc, W), kt.dtype),  # comm_k
            jax.ShapeDtypeStruct((NSLOTS, BH, S_loc, W), vt.dtype),  # comm_v
            jax.ShapeDtypeStruct((NSLOTS, 8, 128), jnp.int8),  # cap tokens
            jax.ShapeDtypeStruct((BH, S_loc, W), jnp.float32),  # dq state
        ],
        scratch_shapes=[
            pltpu.VMEM((2, bk, W), kt.dtype),
            pltpu.VMEM((2, bk, W), vt.dtype),
            pltpu.VMEM((bq, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2 * NSLOTS,)),
            pltpu.SemaphoreType.DMA((2 * NSLOTS,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(qs, dot_, meta, kt, vt)

    dk, dv, *_ = pl.pallas_call(
        functools.partial(_ring_bwd_dkv_kernel, n=n, nd=axis_size, bk=bk,
                          bq=bq, d=D, axis_name=axis_name),
        grid=(n, BH, S_loc // bk),
        in_specs=[
            pl.BlockSpec((1, bk, W), lambda s, bh, ki: (bh, ki, 0)),
            pl.BlockSpec((1, bk, W), lambda s, bh, ki: (bh, ki, 0)),
            hbm, hbm, hbm,
        ],
        out_specs=[
            pl.BlockSpec((1, bk, D), lambda s, bh, ki: (bh, ki, 0)),
            pl.BlockSpec((1, bk, D), lambda s, bh, ki: (bh, ki, 0)),
            hbm, hbm, hbm, hbm, hbm, hbm,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S_loc, D), k.dtype),
            jax.ShapeDtypeStruct((BH, S_loc, D), v.dtype),
            jax.ShapeDtypeStruct((NSLOTS, BH, S_loc, W), qs.dtype),  # comm_q
            jax.ShapeDtypeStruct((NSLOTS, BH, S_loc, W), dot_.dtype),
            jax.ShapeDtypeStruct((NSLOTS, BH, S_loc, 128), jnp.float32),
            jax.ShapeDtypeStruct((NSLOTS, 8, 128), jnp.int8),  # cap tokens
            jax.ShapeDtypeStruct((BH, S_loc, W), jnp.float32),  # dk state
            jax.ShapeDtypeStruct((BH, S_loc, W), jnp.float32),  # dv state
        ],
        scratch_shapes=[
            pltpu.VMEM((2, bq, W), qs.dtype),
            pltpu.VMEM((2, bq, W), dot_.dtype),
            pltpu.VMEM((2, bq, 128), jnp.float32),
            pltpu.VMEM((bk, W), jnp.float32),
            pltpu.VMEM((bk, W), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((3 * NSLOTS,)),
            pltpu.SemaphoreType.DMA((3 * NSLOTS,)),
            pltpu.SemaphoreType.DMA((6,)),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(kt, vt, qs, dot_, meta)

    def from_bhsd(x):
        return jnp.swapaxes(x.reshape(B, H, S_loc, D), 1, 2)

    return from_bhsd(dq), from_bhsd(dk), from_bhsd(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def ring_flash_attention_rdma_diff(q, k, v, scale: float, axis_name: str,
                                   axis_size: int):
    """Differentiable RDMA ring attention: (B, S_loc, H, D) in/out.

    Forward = the bounded-slot RDMA ring kernel; backward = the dq + dkv
    ring kernels (module docstring).  This is the training-path entry used
    by make_seq_sharded_train_step(ring_impl="rdma"); gradients match the
    XLA ppermute ring (tests/test_sequence_parallel.py rdma grad suites).
    """
    o, _ = _rdma_forward(q, k, v, scale, axis_name, axis_size, axis_size)
    return o


def _rdma_diff_fwd(q, k, v, scale, axis_name, axis_size):
    o, lse = _rdma_forward(q, k, v, scale, axis_name, axis_size, axis_size)
    return o, (q, k, v, o, lse)


def _rdma_diff_bwd(scale, axis_name, axis_size, res, do):
    q, k, v, o, lse = res
    return _ring_backward(q, k, v, o, lse, do, scale, axis_name, axis_size)


ring_flash_attention_rdma_diff.defvjp(_rdma_diff_fwd, _rdma_diff_bwd)
