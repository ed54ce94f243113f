"""In-kernel RDMA ring flash attention (forward).

The XLA ring in parallel/sequence.py rotates K/V with jax.lax.ppermute
between flash-kernel calls: the transfer of hop i+1 is only overlapped with
the attention of hop i when XLA's latency-hiding scheduler chooses to.  This
kernel makes the overlap STRUCTURAL: one pallas_call per device owns both
the compute and the interconnect transfers (pltpu.make_async_remote_copy),
so the next shard always streams while the resident shard's attention runs.

Topology — pipelined ring broadcast into per-shard slots:
  * comm buffers comm_k/comm_v live in HBM, shaped (n, BH, S_loc, D); slot
    j on device d holds shard (d - j) mod n.  Every slot is written exactly
    ONCE, so no slot-reuse back-pressure protocol is needed (the price is
    holding the full gathered K/V — bytes equal to global K/V, ~2.4 GB
    transient for the 1000-view flagship pass, well within HBM).
  * grid cell (0,0) owns the ring logistics, INTERLEAVED with its own
    attention: after the local shard is copied into slot 0 it launches hop
    1 (local shard -> right neighbour's slot 1); thereafter, on finishing
    the tiles of slot s it waits the arrival semaphore for slot s+1 and
    immediately launches hop s+2.  Compute on slot s therefore overlaps
    the flight of slot s+1 — the textbook ring schedule, but enforced
    inside the kernel instead of hoped for from the XLA scheduler.
  * TPU grid cells run sequentially on the core, so cells after (0,0)
    need no waits: every slot they read was already awaited by cell (0,0).
  * attention per (head, q-block) streams K/V tiles comm->VMEM with
    double-buffered local DMA (the standard flash inner loop), carrying
    the online-softmax (m, l, acc) in VMEM scratch.

Expected-overlap model (BENCHMARKS.md "Ring attention"): per hop a device
moves bytes_h = 2 * BH * S_loc * D * itemsize over one ICI link while
computing att_s = 4 * BH * S_loc * bq * D flops per q-block against the
resident shard; slot s+1's flight is hidden iff its link time fits under
the remaining compute of slot s.  At flagship shapes (S_loc = 96k tokens,
BH = 12, D = 64, bf16, v5e: ~190e12 flops/s, ~4.5e10 B/s/link) a full hop
moves 295 MB in ~6.6 ms while ONE q-block (bq = 512) of one head against
the shard costs ~25 GFLOP ~ 0.13 ms -> a slot's full compute is
nq * H * 0.13 ms ~ 290 ms >> 6.6 ms: ~40x slack, fully hidden.  Transfers
become exposed when S_loc drops below ~2k tokens per device.  Measured
validation needs multi-chip hardware (ROADMAP).

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


def _hop_descriptors(comm_k, comm_v, j, right, send_sem, recv_sem):
    """RDMA descriptors for hop j: my slot j-1 -> right neighbour's slot j.
    (Descriptors are cheap handles over the refs+semaphores — recreating
    one to wait on is the pallas idiom for split start/wait sites.)"""
    rk = pltpu.make_async_remote_copy(
        src_ref=comm_k.at[j - 1], dst_ref=comm_k.at[j],
        send_sem=send_sem.at[2 * (j - 1)], recv_sem=recv_sem.at[2 * (j - 1)],
        device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
    rv = pltpu.make_async_remote_copy(
        src_ref=comm_v.at[j - 1], dst_ref=comm_v.at[j],
        send_sem=send_sem.at[2 * (j - 1) + 1],
        recv_sem=recv_sem.at[2 * (j - 1) + 1],
        device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL)
    return rk, rv


def _hop(comm_k, comm_v, j, right, send_sem, recv_sem):
    rk, rv = _hop_descriptors(comm_k, comm_v, j, right, send_sem, recv_sem)
    rk.start()
    rv.start()


def _ring_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                     comm_k, comm_v, kv_vmem_k, kv_vmem_v,
                     m_scr, acc_scr,
                     local_sem, recv_sem, send_sem, copy_sem,
                     *, scale: float, n: int, bk: int, axis_name: str):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    nbh = pl.num_programs(0)
    nq = pl.num_programs(1)
    my = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my + 1, n)
    S_loc = k_ref.shape[1]
    kv_steps = S_loc // bk
    first_cell = (bh == 0) & (qi == 0)
    last_cell = (bh == nbh - 1) & (qi == nq - 1)

    # ---- ring bootstrap: local shard -> slot 0, launch hop 1 ----------
    @pl.when(first_cell)
    def _bootstrap():
        ck = pltpu.make_async_copy(k_ref, comm_k.at[0], local_sem.at[0])
        cv = pltpu.make_async_copy(v_ref, comm_v.at[0], local_sem.at[1])
        ck.start()
        cv.start()
        ck.wait()
        cv.wait()
        if n > 1:
            _hop(comm_k, comm_v, 1, right, send_sem, recv_sem)

    # ---- attention with interleaved arrival waits / hop launches ------
    m_scr[:] = jnp.full_like(m_scr, NEG_INF)
    acc_scr[:] = jnp.zeros_like(acc_scr)
    q = q_ref[0]  # (bq, D)

    total_tiles = n * kv_steps

    def get_tile(slot, t):
        s = t // kv_steps
        ki = jax.lax.rem(t, kv_steps)
        return (
            pltpu.make_async_copy(
                comm_k.at[s, bh, pl.ds(ki * bk, bk)], kv_vmem_k.at[slot],
                copy_sem.at[2 * slot]),
            pltpu.make_async_copy(
                comm_v.at[s, bh, pl.ds(ki * bk, bk)], kv_vmem_v.at[slot],
                copy_sem.at[2 * slot + 1]),
        )

    tk0, tv0 = get_tile(0, 0)
    tk0.start()
    tv0.start()

    def tile_body(t, _):
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)
        s = t // kv_steps
        s_next = (t + 1) // kv_steps

        # slot transition: before anything touches shard s+1, cell (0,0)
        # awaits its arrival and launches hop s+2 so the NEXT shard is in
        # flight while s+1 computes (later cells skip — already awaited)
        @pl.when(first_cell & (s_next > s) & (s_next < n))
        def _await_and_forward():
            rk, rv = _hop_descriptors(comm_k, comm_v, s_next, right,
                                      send_sem, recv_sem)
            rk.wait_recv()
            rv.wait_recv()

            @pl.when(s_next + 1 < n)
            def _launch_next():
                _hop(comm_k, comm_v, s_next + 1, right, send_sem, recv_sem)

        @pl.when(t + 1 < total_tiles)
        def _prefetch():
            nk, nv = get_tile(nxt, t + 1)
            nk.start()
            nv.start()

        ck_, cv_ = get_tile(slot, t)
        ck_.wait()
        cv_.wait()

        k = kv_vmem_k[slot]
        v = kv_vmem_v[slot]
        d = v.shape[-1]
        # log2-domain scores (exp2 trick, ops/flash_attention.py LOG2E note)
        s_ = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * (scale * LOG2E)
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s_, axis=-1, keepdims=True))
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s_ - m_new).astype(v.dtype)
        # row-sum on the MXU via the ones-extended v: l rides the idle PV
        # output lanes and shares acc's alpha rescale (flash_attention.py
        # _fwd_kernel docstring)
        v_ext = jnp.concatenate(
            [v, jnp.ones((v.shape[0], _ones_width(d)), v.dtype)], axis=-1)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p, v_ext, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        return 0

    jax.lax.fori_loop(0, total_tiles, tile_body, 0)

    d_out = o_ref.shape[-1]
    l = acc_scr[:, d_out:d_out + 1]
    o_ref[0] = (acc_scr[:, :d_out] / l).astype(o_ref.dtype)
    lse_ref[0] = (m_scr[:, :1] + jnp.log2(l)) * LN2  # natural-log interface

    # ---- drain send semaphores before kernel exit ---------------------
    if n > 1:
        @pl.when(last_cell)
        def _drain():
            def drain(j, _):
                rk, rv = _hop_descriptors(comm_k, comm_v, j + 1, right,
                                          send_sem, recv_sem)
                rk.wait_send()
                rv.wait_send()
                return 0

            jax.lax.fori_loop(0, n - 1, drain, 0)


def ring_flash_attention_rdma(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                              scale: float, axis_name: str,
                              axis_size: int) -> jnp.ndarray:
    """Drop-in for ring_flash_attention (forward only): (B, N_loc, H, D).

    axis_size: STATIC size of the ring axis (mesh.shape[axis_name]) — sizes
    the per-shard comm slots and semaphore arrays.
    """
    n = axis_size
    B, S_loc, H, D = q.shape
    qt = jnp.swapaxes(q, 1, 2).reshape(B * H, S_loc, D)
    kt = jnp.swapaxes(k, 1, 2).reshape(B * H, S_loc, D)
    vt = jnp.swapaxes(v, 1, 2).reshape(B * H, S_loc, D)

    bq = _pick_block(S_loc, MAX_BLOCK_Q)
    bk = _pick_block(S_loc, MAX_BLOCK_KV)
    assert bq and bk, f"S_loc={S_loc} not tileable for the RDMA ring"
    BH = B * H

    o, lse = pl.pallas_call(
        functools.partial(_ring_fwd_kernel, scale=float(scale), n=n,
                          bk=bk, axis_name=axis_name),
        grid=(BH, S_loc // bq),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, bq, 1), lambda bh, qi: (bh, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S_loc, D), q.dtype),
            jax.ShapeDtypeStruct((BH, S_loc, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.HBM((n, BH, S_loc, D), kt.dtype),   # comm_k
            pltpu.HBM((n, BH, S_loc, D), vt.dtype),   # comm_v
            pltpu.VMEM((2, bk, D), kt.dtype),         # kv tile double buffer
            pltpu.VMEM((2, bk, D), vt.dtype),
            pltpu.VMEM((bq, 128), jnp.float32),       # m
            pltpu.VMEM((bq, D + _ones_width(D)), jnp.float32),  # acc | l
            pltpu.SemaphoreType.DMA((2,)),            # local copy
            pltpu.SemaphoreType.DMA((2 * max(n - 1, 1),)),  # recv per hop
            pltpu.SemaphoreType.DMA((2 * max(n - 1, 1),)),  # send per hop
            pltpu.SemaphoreType.DMA((4,)),            # kv tile copies
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            collective_id=7,
        ),
        interpret=_interpret(),
    )(qt, kt, vt)

    o = o.reshape(B, H, S_loc, D)
    return jnp.swapaxes(o, 1, 2)
