"""Single-program manual-DMA attention for many small independent heads.

The encoder's per-view attention (reference blocks.py:135-194 under the
per-image CroCo encoder, fast3r.py:499-559) is B*H independent little
attentions (flagship: 20 views x 16 heads at S=768, D=64).  Neither existing
path fits this shape well (r2 measurements, BENCHMARKS.md "Failed
experiment"):

  * XLA materializes the (B, H, S, S) logits in HBM — ~0.38 GB bf16 per
    encoder layer, the whole path HBM-bound at ~1.7 ms/layer;
  * a pallas_call grid over (B, H) pays a ~12 us/program fixed cost
    (pipeline entry/exit bubbles around 1.6 us of MXU work per head), and
    Mosaic's auto-pipelining double-buffers whole (bb, hc, S, D) blocks, so
    VMEM caps per-program batching at bb*hc <= 2.

This kernel runs ONE pallas program for the whole batch and does its own
pipelining (the r3 answer to both problems):

  * q/k/v stay in HBM (memory_space=HBM in_specs); (GROUP, S, 128) tiles of
    GROUP heads each are streamed into an NSLOTS-deep VMEM ring with
    pltpu.make_async_copy, the fetch for group u+NSLOTS-1 issued at the top
    of group u's compute — per-GROUP-heads overhead is one DMA wait, not
    GROUP program launches (grouping added r3: at ~4 us of MXU work per
    head, the per-unit waits + loop scalar work of the one-head-per-
    iteration version were a measurable serial tax);
  * heads are lane-PADDED to 128 (manual-DMA slices of HBM need a
    128-aligned minor dim — Mosaic rejects D=64, caught on hardware in the
    r3 ring-kernel bring-up).  Q/K pad with zeros: the QK^T contraction is
    then a FULL-depth 128 MXU pass whose extra flops are zeros (same
    wall-clock as the half-depth D=64 contraction).  V's pad lanes carry the
    ONES extension, so the PV matmul's idle output lanes accumulate the
    softmax row-sum (ops/flash_attention.py MXU-row-sum trick);
  * whole rows fit VMEM at S<=1024, so softmax is single-pass per head — no
    online state.  The kv axis is still split into SPLIT independent
    partial-softmax sub-chains (local max + exp2-weighted merge): sub-chain
    j+1's QK matmul (MXU) overlaps sub-chain j's exp2 passes (VPU), which a
    single chain serializes (same rationale as _fwd_kernel's split).

Forward-only: under jax.grad the custom VJP recomputes through a plain
differentiable path (bf16: the bf16-logits XLA path the r2 encoder trained
through; fp32: the naive fp32-logits reference — _replay_reference).  The
kernels keep fp32 softmax statistics too, so gradients are consistent at
bf16 rounding; encoder training remats the forward anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fast3r_tpu.ops.flash_attention import (
    LN2, LOG2E, _interpret, _softmax_normalize)

NSLOTS = 2
NSLOTS_PACKED = 4  # deeper ring for the packed kernel: at NSLOTS=2 the
                   # per-unit DMA waits leave ~10 us/unit unhidden (same-run
                   # sweep, scripts/bench_batched_attn.py: ns2/g8 0.99 ms,
                   # ns3/g8 1.02, ns4/g4 0.87 at (20,768,16,64)); 4 slots of
                   # 4-head slabs fit the VMEM budget and hide the latency
SPLIT = 2
GROUP = 4  # head units DMA'd + computed per loop iteration (r3: amortizes
           # the per-unit DMA waits / scalar loop overhead that dominated the
           # one-unit-per-iteration version at ~4 us of MXU work per unit)
LANE = 128
MAX_SEQ = 1024  # whole-row single-pass softmax must fit VMEM
VMEM_BUDGET = 10 * 1024 * 1024
# the fused-qkv kernel's view-grouped slot ring is allowed a bigger live set
# (v5e VMEM is 128 MiB; the pallas_call passes an explicit 100 MiB limit)
VMEM_BUDGET_FUSEDQKV = 40 * 1024 * 1024


def _vmem_estimate(n: int, itemsize: int, g: int) -> int:
    """Live-set model: slot ring (q/k/v/o group tiles) + one unit's two
    sub-chain score tiles (fp32 s + input-dtype p) + the fp32 accumulator."""
    tiles = NSLOTS * 4 * g * n * LANE * itemsize
    scores = n * (n // SPLIT) * (4 + itemsize) * SPLIT
    acc = n * LANE * 4 + 2 * n * LANE * itemsize
    return tiles + scores + acc


def _pick_group(nu: int, n: int, itemsize: int) -> int:
    for g in (GROUP, 2, 1):
        if nu % g == 0 and nu // g >= NSLOTS \
                and _vmem_estimate(n, itemsize, g) <= VMEM_BUDGET:
            return g
    return 0


def batched_attention_supported(q_shape, dtype) -> bool:
    B, N, H, D = q_shape
    itemsize = jnp.dtype(dtype).itemsize
    sub = 16 if itemsize == 2 else 8
    return (
        D <= LANE
        and N <= MAX_SEQ
        and N % (sub * SPLIT) == 0
        and _pick_group(B * H, N, itemsize) > 0
    )


def _batched_kernel(q_hbm, k_hbm, v_hbm, o_hbm,
                    qkv_vmem, o_vmem, in_sem, out_sem,
                    *, ng: int, g: int, n: int, d: int, scale: float):
    """One program; fori_loop over the NG = B*H / G unit GROUPS.  Each
    iteration DMAs one (G, N, 128) q/k/v group per slot and computes its G
    heads back to back — one set of DMA waits (and one trip through the loop
    body's scalar work) per G units instead of per unit.

    Slot schedule (ring of NSLOTS): at the top of iteration u the fetch for
    group u + NSLOTS - 1 is issued into slot (u + NSLOTS - 1) % NSLOTS — that
    slot's previous occupant (group u - 1) was consumed last iteration, so
    program order alone makes the overwrite safe (the guide's double-buffer
    pattern, NSLOTS deep).  o_vmem reuse is guarded by waiting group
    u - NSLOTS's output DMA before overwriting its slot.
    """

    def in_dmas(slot, u):
        return (
            pltpu.make_async_copy(q_hbm.at[u], qkv_vmem.at[slot, 0],
                                  in_sem.at[slot, 0]),
            pltpu.make_async_copy(k_hbm.at[u], qkv_vmem.at[slot, 1],
                                  in_sem.at[slot, 1]),
            pltpu.make_async_copy(v_hbm.at[u], qkv_vmem.at[slot, 2],
                                  in_sem.at[slot, 2]),
        )

    def out_dma(slot, u):
        return pltpu.make_async_copy(o_vmem.at[slot], o_hbm.at[u],
                                     out_sem.at[slot])

    # warm-up: groups 0 .. NSLOTS-2 (group u+NSLOTS-1 is fetched inside
    # iteration u)
    for u in range(NSLOTS - 1):
        for dma in in_dmas(u % NSLOTS, u):
            dma.start()

    sub = n // SPLIT

    def body(u, _):
        slot = jax.lax.rem(u, NSLOTS)

        pre = u + NSLOTS - 1

        @pl.when(pre < ng)
        def _prefetch():
            for dma in in_dmas(jax.lax.rem(pre, NSLOTS), pre):
                dma.start()

        for dma in in_dmas(slot, u):
            dma.wait()

        @pl.when(u >= NSLOTS)
        def _reclaim():
            out_dma(slot, u - NSLOTS).wait()

        for gi in range(g):
            q = qkv_vmem[slot, 0, gi]  # (N, 128); lanes d: are zero
            parts = []
            for j in range(SPLIT):
                k = qkv_vmem[slot, 1, gi, j * sub:(j + 1) * sub]
                v = qkv_vmem[slot, 2, gi, j * sub:(j + 1) * sub]  # pad = ones
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * (scale * LOG2E)  # (N, sub), log2 domain
                m_j = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2(s - m_j).astype(v.dtype)
                acc_j = jax.lax.dot_general(
                    p, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (N, 128): [:, :d] = p@v, [:, d:] = row-sum l
                parts.append((m_j, acc_j))

            m = parts[0][0]
            for m_j, _ in parts[1:]:
                m = jnp.maximum(m, m_j)
            acc = parts[0][1] * jnp.exp2(parts[0][0] - m)
            for m_j, acc_j in parts[1:]:
                acc = acc + acc_j * jnp.exp2(m_j - m)

            # normalize ALL lanes by l (fast reciprocal for bf16 outputs;
            # pad lanes become 1.0; wrapper slices [:d])
            o_vmem[slot, gi] = _softmax_normalize(
                acc, acc[:, d:d + 1], o_vmem.dtype)
        out_dma(slot, u).start()
        return 0

    jax.lax.fori_loop(0, ng, body, 0)

    for i in range(min(NSLOTS, ng)):
        u = ng - 1 - i
        out_dma(u % NSLOTS, u).wait()


def _run_kernel(qt, kt, vt, scale, d, g):
    NU, N, _ = qt.shape
    ng = NU // g
    qt, kt, vt = (t.reshape(ng, g, N, LANE) for t in (qt, kt, vt))
    out = pl.pallas_call(
        functools.partial(_batched_kernel, ng=ng, g=g, n=N, d=d,
                          scale=float(scale)),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((ng, g, N, LANE), qt.dtype),
        scratch_shapes=[
            pltpu.VMEM((NSLOTS, 3, g, N, LANE), qt.dtype),
            pltpu.VMEM((NSLOTS, g, N, LANE), qt.dtype),
            pltpu.SemaphoreType.DMA((NSLOTS, 3)),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(qt, kt, vt)
    return out.reshape(NU, N, LANE)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _batched_bnhd(q, k, v, scale):
    B, N, H, D = q.shape
    ow = LANE - D
    pad = ((0, 0), (0, 0), (0, ow))

    def to_units(x, cval):
        t = jnp.swapaxes(x, 1, 2).reshape(B * H, N, D)
        return jnp.pad(t, pad, constant_values=cval)

    g = _pick_group(B * H, N, q.dtype.itemsize)
    o = _run_kernel(to_units(q, 0), to_units(k, 0), to_units(v, 1), scale, D,
                    g)
    o = o[:, :, :D].reshape(B, H, N, D)
    return jnp.swapaxes(o, 1, 2)


def _batched_bnhd_fwd(q, k, v, scale):
    return _batched_bnhd(q, k, v, scale), (q, k, v)


def _naive_reference(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * jnp.float32(scale)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


def _replay_reference(q, k, v, scale):
    """Differentiable replay path for the custom VJPs.

    bf16 (production training): the bf16-logits XLA path — the same math the
    r2 encoder trained through before the packed kernels, with HALF the
    logits/d_logits HBM transient of the naive fp32 replay (the source of
    the r3 "~3% training tax" note, BENCHMARKS.md).  fp32 (tests): the naive
    fp32-logits path, numerically identical to the golden reference.
    Forward/backward consistency: both the kernels and this replay keep
    softmax statistics in fp32; differences are bf16 rounding scale.
    """
    if q.dtype == jnp.bfloat16:
        from fast3r_tpu.ops.attention import dot_product_attention

        return dot_product_attention(q, k, v, scale, impl="xla")
    return _naive_reference(q, k, v, scale)


def _batched_bnhd_bwd(scale, res, g):
    q, k, v = res
    B, N, H, D = q.shape
    if packed_qkv_bwd_supported(q.shape, q.dtype):
        # the r4 manual-DMA backward kernel (defined below) — one stack copy
        # in, one unstack out, no S x S HBM arrays
        qkv3 = jnp.stack([t.reshape(B, N, H * D) for t in (q, k, v)])
        d = packed_qkv_attention_bwd(qkv3, g.reshape(B, N, H * D),
                                     H, float(scale))
        return tuple(d[i].reshape(B, N, H, D) for i in range(3))
    _, vjp = jax.vjp(lambda q_, k_, v_: _replay_reference(q_, k_, v_, scale),
                     q, k, v)
    return vjp(g)


_batched_bnhd.defvjp(_batched_bnhd_fwd, _batched_bnhd_bwd)


# ----------------------------------------------------------------------------
# v2: zero-relayout "packed" variant
# ----------------------------------------------------------------------------
#
# The padded kernel above still pays XLA relayout passes AROUND the op: the
# (B, N, H, D) -> (B*H, N, 128) pad/transpose on the way in and the
# slice/unpad/transpose on the way out are ~5 full HBM round trips of q/k/v/o
# per layer.  This variant keeps q/k/v in the (B, N, H*D) layout the fused
# qkv kernel NATURALLY produces (nn/fused_block.py ln_qkv -> (B*N, C)):
#
#   * the DMA unit is a contiguous (N, PGROUP*D) slab of PGROUP consecutive
#     heads of one view — minor offset/extent are 128-aligned for D=64,
#     PGROUP=4 (no padding needed, HALF the DMA bytes of the padded kernel);
#   * heads are lane-SLICED from the slab in VMEM (static 64-aligned slices:
#     a register relayout, not an HBM pass);
#   * the MXU row-sum rides a per-head ones-EXTENDED v tile built in VMEM
#     ((N, 128): lanes [:64] = v_h, lanes [64:] = 1), so PV still yields
#     [p@v | row-sum] in one matmul;
#   * outputs are packed back into (N, PGROUP*D) slab lanes and DMA'd to a
#     (B, N, H*D) result — the proj matmul consumes it with NO reshuffle.


def _vmem_estimate_packed(n: int, itemsize: int, g: int, d: int) -> int:
    slab = g * d
    tiles = NSLOTS_PACKED * 4 * n * slab * itemsize          # q/k/v/o slot rings
    vext = n * (2 * d) * itemsize                     # ones-extended v tile
    scores = n * (n // SPLIT) * (4 + itemsize) * SPLIT
    acc = n * (2 * d) * 4
    return tiles + vext + scores + acc


def _pick_pgroup(h: int, n: int, itemsize: int, d: int) -> int:
    for g in (8, 4, 2, 1):
        if (g * d) % LANE:
            continue
        if h % g == 0 and _vmem_estimate_packed(n, itemsize, g, d) \
                <= VMEM_BUDGET:
            return g
    return 0


def packed_attention_supported(q_shape, dtype) -> bool:
    B, N, H, D = q_shape
    itemsize = jnp.dtype(dtype).itemsize
    sub = 16 if itemsize == 2 else 8
    return (
        N <= MAX_SEQ
        and N % (sub * SPLIT) == 0
        and _pick_pgroup(H, N, itemsize, D) > 0
    )


def _packed_kernel(q_hbm, k_hbm, v_hbm, o_hbm,
                   qkv_vmem, o_vmem, vext_vmem, in_sem, out_sem,
                   *, nv: int, npg: int, g: int, n: int, d: int,
                   scale: float):
    """One program; fori_loop over NV*NPG units (view vi, head-group gi).
    Same NSLOTS_PACKED ring schedule as _batched_kernel; the DMA src/dst are lane
    sub-slices of the (B, N, H*D) HBM arrays."""
    gd = g * d

    def in_dmas(slot, u):
        vi = u // npg
        lo = (u % npg) * gd
        return (
            pltpu.make_async_copy(q_hbm.at[vi, :, pl.ds(lo, gd)],
                                  qkv_vmem.at[slot, 0], in_sem.at[slot, 0]),
            pltpu.make_async_copy(k_hbm.at[vi, :, pl.ds(lo, gd)],
                                  qkv_vmem.at[slot, 1], in_sem.at[slot, 1]),
            pltpu.make_async_copy(v_hbm.at[vi, :, pl.ds(lo, gd)],
                                  qkv_vmem.at[slot, 2], in_sem.at[slot, 2]),
        )

    def out_dma(slot, u):
        vi = u // npg
        lo = (u % npg) * gd
        return pltpu.make_async_copy(o_vmem.at[slot],
                                     o_hbm.at[vi, :, pl.ds(lo, gd)],
                                     out_sem.at[slot])

    for u in range(NSLOTS_PACKED - 1):
        for dma in in_dmas(u % NSLOTS_PACKED, u):
            dma.start()

    # ones extension lanes never change — fill once
    vext_vmem[:, d:] = jnp.ones((n, d), vext_vmem.dtype)

    ng = nv * npg

    def body(u, _):
        slot = jax.lax.rem(u, NSLOTS_PACKED)
        pre = u + NSLOTS_PACKED - 1

        @pl.when(pre < ng)
        def _prefetch():
            for dma in in_dmas(jax.lax.rem(pre, NSLOTS_PACKED), pre):
                dma.start()

        for dma in in_dmas(slot, u):
            dma.wait()

        @pl.when(u >= NSLOTS_PACKED)
        def _reclaim():
            out_dma(slot, u - NSLOTS_PACKED).wait()

        _packed_compute_slot(qkv_vmem, o_vmem, vext_vmem, slot, g, n, d,
                             scale)
        out_dma(slot, u).start()
        return 0

    jax.lax.fori_loop(0, ng, body, 0)

    for i in range(min(NSLOTS_PACKED, ng)):
        u = ng - 1 - i
        out_dma(u % NSLOTS_PACKED, u).wait()


def _packed_compute_slot(qkv_vmem, o_vmem, vext_vmem, slot, g, n, d, scale):
    """Per-slot compute shared by the packed and fused-qkv kernels: for each
    of the slot's g heads, lane-slice q/k/v from the (3, N, g*d) slab, run
    the SPLIT-sub-chain partial softmax with the ones-extended-v MXU row
    sum, and pack the normalized output back into the slot's o slab."""
    sub = n // SPLIT
    for gi in range(g):
        q = qkv_vmem[slot, 0, :, gi * d:(gi + 1) * d]  # (N, d)
        vext_vmem[:, :d] = qkv_vmem[slot, 2, :, gi * d:(gi + 1) * d]
        parts = []
        for j in range(SPLIT):
            k = qkv_vmem[slot, 1, j * sub:(j + 1) * sub,
                         gi * d:(gi + 1) * d]  # (sub, d)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (scale * LOG2E)  # (N, sub), log2 domain
            m_j = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m_j).astype(vext_vmem.dtype)
            acc_j = jax.lax.dot_general(
                p, vext_vmem[j * sub:(j + 1) * sub],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (N, 2d): [:, :d] = p@v, [:, d:] = row-sum l replicated
            parts.append((m_j, acc_j))

        m = parts[0][0]
        for m_j, _ in parts[1:]:
            m = jnp.maximum(m, m_j)
        acc = parts[0][1] * jnp.exp2(parts[0][0] - m)
        for m_j, acc_j in parts[1:]:
            acc = acc + acc_j * jnp.exp2(m_j - m)

        o_vmem[slot, :, gi * d:(gi + 1) * d] = _softmax_normalize(
            acc[:, :d], acc[:, d:d + 1], o_vmem.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _packed_bnhd(q, k, v, scale):
    B, N, H, D = q.shape
    g = _pick_pgroup(H, N, q.dtype.itemsize, D)
    npg = H // g
    qp, kp, vp = (t.reshape(B, N, H * D) for t in (q, k, v))
    out = pl.pallas_call(
        functools.partial(_packed_kernel, nv=B, npg=npg, g=g, n=N, d=D,
                          scale=float(scale)),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((B, N, H * D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((NSLOTS_PACKED, 3, N, g * D), q.dtype),
            pltpu.VMEM((NSLOTS_PACKED, N, g * D), q.dtype),
            pltpu.VMEM((N, 2 * D), q.dtype),
            pltpu.SemaphoreType.DMA((NSLOTS_PACKED, 3)),
            pltpu.SemaphoreType.DMA((NSLOTS_PACKED,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(qp, kp, vp)
    return out.reshape(B, N, H, D)


def _packed_bnhd_fwd(q, k, v, scale):
    return _packed_bnhd(q, k, v, scale), (q, k, v)


def _packed_bnhd_bwd(scale, res, g):
    return _batched_bnhd_bwd(scale, res, g)


_packed_bnhd.defvjp(_packed_bnhd_fwd, _packed_bnhd_bwd)


# ----------------------------------------------------------------------------
# v3: fused-qkv single-DMA variant
# ----------------------------------------------------------------------------
#
# The packed kernel above still issues THREE input DMAs (q, k, v) per unit —
# at ~4 us of MXU work per head the per-DMA issue/wait latency is the
# dominant cost (r3 ablations: dmaonly == full kernel).  When the qkv
# projection emits the PACKED (3, B*N, C) layout (nn/fused_block.ln_qkv_rope,
# which also folds RoPE in so q/k need no XLA pass between the projection
# and the attention), one unit's q, k and v become a single strided region
# of ONE HBM array: slice [:, vi, :, lo:lo+g*d] -> (3, N, g*d), one
# make_async_copy, one semaphore wait.  Everything else (slot ring, lane
# slicing, SPLIT sub-chain softmax, MXU row-sum, packed output) is shared
# with the packed kernel via _packed_compute_slot.


def _fusedqkv_kernel(qkv_hbm, o_hbm, qkv_vmem, o_vmem, vext_vmem,
                     in_sem, out_sem,
                     *, nv: int, npg: int, g: int, gv: int, n: int, d: int,
                     scale: float, nslots: int):
    """gv VIEWS per DMA unit (r4): a unit is (view-group, head-group) and its
    input arrives as ONE (3, gv, N, g*d) strided copy.  At ~4 us of MXU work
    per head the per-unit DMA issue/wait latency dominates the packed kernels
    (r3 dmaonly == full); grouping views multiplies the compute per wait by
    gv without changing total bytes, cutting the number of issue/wait pairs
    from nv*npg to (nv/gv)*npg."""
    gd = g * d
    nvg = nv // gv

    def in_dma(slot, u):
        vi = (u // npg) * gv
        lo = (u % npg) * gd
        return pltpu.make_async_copy(
            qkv_hbm.at[:, pl.ds(vi, gv), :, pl.ds(lo, gd)],
            qkv_vmem.at[slot], in_sem.at[slot])

    def out_dma(slot, u):
        vi = (u // npg) * gv
        lo = (u % npg) * gd
        return pltpu.make_async_copy(o_vmem.at[slot],
                                     o_hbm.at[pl.ds(vi, gv), :, pl.ds(lo, gd)],
                                     out_sem.at[slot])

    ng = nvg * npg
    # ng can be smaller than the ring (tiny shapes): pl.ds bound-checks the
    # view slice statically, so never issue a DMA for a unit past ng
    for u in range(min(nslots - 1, ng)):
        in_dma(u % nslots, u).start()

    vext_vmem[:, d:] = jnp.ones((n, d), vext_vmem.dtype)

    def body(u, _):
        slot = jax.lax.rem(u, nslots)
        pre = u + nslots - 1

        @pl.when(pre < ng)
        def _prefetch():
            in_dma(jax.lax.rem(pre, nslots), pre).start()

        in_dma(slot, u).wait()

        @pl.when(u >= nslots)
        def _reclaim():
            out_dma(slot, u - nslots).wait()

        for vi in range(gv):
            _packed_compute_slot(qkv_vmem.at[:, :, vi], o_vmem.at[:, vi],
                                 vext_vmem, slot, g, n, d, scale)
        out_dma(slot, u).start()
        return 0

    jax.lax.fori_loop(0, ng, body, 0)

    for i in range(min(nslots, ng)):
        u = ng - 1 - i
        out_dma(u % nslots, u).wait()


def _vmem_estimate_fusedqkv(n: int, itemsize: int, g: int, gv: int,
                            nslots: int, d: int) -> int:
    slab = g * d
    tiles = nslots * 4 * gv * n * slab * itemsize      # qkv in + o out rings
    vext = n * (2 * d) * itemsize
    scores = n * (n // SPLIT) * (4 + itemsize) * SPLIT
    acc = n * (2 * d) * 4
    return tiles + vext + scores + acc


def _pick_gv(nv: int, n: int, itemsize: int, g: int, d: int,
             nslots: int) -> int:
    """Views per DMA unit.  Largest divisor of nv whose slot ring fits the
    fused-qkv budget; capped so an nslots-deep ring still has >= nslots
    units to overlap.

    r4 attribution at (20, 768, 16, 64), gv=5 ns=4 (bench_fusedqkv_ablate):
    full 0.974 / nosoftmax 0.852 / dmaonly 0.517 ms — the kernel is
    COMPUTE-bound (nosoftmax ~ 0.85 vs the 0.51 pure-MXU floor; VPU softmax
    exposes only ~0.12).  Two negative results to save re-deriving: a g=16
    whole-C slab (fully contiguous per-view DMAs) measured the same 0.96 ms
    AND produced wrong numerics on hardware (max|d| 0.94 vs naive — lane
    slicing at >=512-lane offsets miscompiles silently; interpret mode
    passes); gv=5 ns=2 measured 1.46 ms (ring too shallow)."""
    for gv in (10, 5, 4, 2, 1):
        if nv % gv or nv // gv < nslots:
            continue
        if _vmem_estimate_fusedqkv(n, itemsize, g, gv, nslots, d) \
                <= VMEM_BUDGET_FUSEDQKV:
            return gv
    # gv=1 fallback (nv < nslots or nothing divided): it must still satisfy
    # the same budget the loop enforces — today it coincides with the
    # _pick_pgroup 10 MiB gate, but that coupling is implicit (r4 advisor)
    est = _vmem_estimate_fusedqkv(n, itemsize, g, 1, nslots, d)
    assert est <= VMEM_BUDGET_FUSEDQKV, (
        f"fused-qkv gv=1 ring exceeds VMEM budget: {est} > "
        f"{VMEM_BUDGET_FUSEDQKV} (n={n}, g={g}, nslots={nslots}, d={d})")
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _fusedqkv_bnc(qkv3, num_heads, scale):
    _, B, N, C = qkv3.shape
    D = C // num_heads
    g = _pick_pgroup(num_heads, N, qkv3.dtype.itemsize, D)
    npg = num_heads // g
    nslots = NSLOTS_PACKED
    gv = _pick_gv(B, N, qkv3.dtype.itemsize, g, D, nslots)
    return pl.pallas_call(
        functools.partial(_fusedqkv_kernel, nv=B, npg=npg, g=g, gv=gv,
                          n=N, d=D, scale=float(scale), nslots=nslots),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv3.dtype),
        scratch_shapes=[
            pltpu.VMEM((nslots, 3, gv, N, g * D), qkv3.dtype),
            pltpu.VMEM((nslots, gv, N, g * D), qkv3.dtype),
            pltpu.VMEM((N, 2 * D), qkv3.dtype),
            pltpu.SemaphoreType.DMA((nslots,)),
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(qkv3)


def _fusedqkv_fwd(qkv3, num_heads, scale):
    return _fusedqkv_bnc(qkv3, num_heads, scale), (qkv3,)


def _fusedqkv_bwd(num_heads, scale, res, gout):
    (qkv3,) = res
    _, B, N, C = qkv3.shape
    D = C // num_heads

    if packed_qkv_bwd_supported((B, N, num_heads, D), qkv3.dtype):
        return (packed_qkv_attention_bwd(qkv3, gout, num_heads, scale),)

    def f(t):
        q, k, v = (t[i].reshape(B, N, num_heads, D) for i in range(3))
        return _replay_reference(q, k, v, scale).reshape(B, N, C)

    _, vjp = jax.vjp(f, qkv3)
    return vjp(gout)


_fusedqkv_bnc.defvjp(_fusedqkv_fwd, _fusedqkv_bwd)


# ----------------------------------------------------------------------------
# v4 (r4): manual-DMA BACKWARD kernel for the fused-qkv road
# ----------------------------------------------------------------------------
#
# The r4 train-step attribution (scripts/bench_train_ablate.py) put
# bwd-encoder at 0.390 s/step — its attention backward replayed through the
# bf16-logits XLA path, which materializes p / dp as (B, H, N, N) HBM
# arrays (~0.38 GB per layer each way) and runs the 5 backward matmuls at
# XLA's in-context rates.  This kernel computes the whole attention backward
# per (view, head-group) unit with the score matrices living ONLY in VMEM:
#
#   recompute  s = c*(q k^T)  (log2 domain, c = scale*log2e; lse is NOT
#   saved by the forward — residuals are just qkv3), P = exp2(s - m)/l,
#   then  dv = P^T do,  dp = do v^T,  delta = rowsum(P*dp),
#   ds0 = P*(dp - delta),  dq = scale*(ds0 @ k),  dk = ln2*(ds0^T @ qs)
#   (qs = c*q, so the scale folds exactly like _bwd_dkv_kernel's).
#
# fp32 logits throughout — gradient fidelity is BETTER than the bf16-logits
# XLA replay this supersedes (ADVICE r3 noted that path's ~2^-9 logit
# rounding as an accepted tradeoff; the kernel removes it).

VMEM_BUDGET_BWD = 64 * 1024 * 1024


def _vmem_estimate_bwd(n: int, itemsize: int, g: int, nslots: int,
                       d: int) -> int:
    slab = g * d
    rings = nslots * (3 + 1 + 3) * n * slab * itemsize  # qkv + do in, dqkv out
    scores = n * n * (4 * 4 + 2 * itemsize)  # s/P/dp/ds0 fp32 + 2 bf16 casts
    return rings + scores


def packed_qkv_bwd_supported(q_shape, dtype) -> bool:
    B, N, H, D = q_shape
    itemsize = jnp.dtype(dtype).itemsize
    g = _pick_pgroup(H, N, itemsize, D)
    return (
        packed_attention_supported(q_shape, dtype)
        and g > 0
        and _vmem_estimate_bwd(N, itemsize, g, NSLOTS_PACKED, D)
        <= VMEM_BUDGET_BWD
    )


def _fusedqkv_bwd_kernel(qkv_hbm, do_hbm, dqkv_hbm,
                         qkv_vmem, do_vmem, dqkv_vmem,
                         in_sem, do_sem, out_sem,
                         *, nv: int, npg: int, g: int, n: int, d: int,
                         scale: float, nslots: int):
    gd = g * d
    c = scale * LOG2E

    def in_dmas(slot, u):
        vi = u // npg
        lo = (u % npg) * gd
        return (
            pltpu.make_async_copy(qkv_hbm.at[:, vi, :, pl.ds(lo, gd)],
                                  qkv_vmem.at[slot], in_sem.at[slot]),
            pltpu.make_async_copy(do_hbm.at[vi, :, pl.ds(lo, gd)],
                                  do_vmem.at[slot], do_sem.at[slot]),
        )

    def out_dma(slot, u):
        vi = u // npg
        lo = (u % npg) * gd
        return pltpu.make_async_copy(dqkv_vmem.at[slot],
                                     dqkv_hbm.at[:, vi, :, pl.ds(lo, gd)],
                                     out_sem.at[slot])

    ng = nv * npg
    for u in range(min(nslots - 1, ng)):
        for dma in in_dmas(u % nslots, u):
            dma.start()

    def body(u, _):
        slot = jax.lax.rem(u, nslots)
        pre = u + nslots - 1

        @pl.when(pre < ng)
        def _prefetch():
            for dma in in_dmas(jax.lax.rem(pre, nslots), pre):
                dma.start()

        for dma in in_dmas(slot, u):
            dma.wait()

        @pl.when(u >= nslots)
        def _reclaim():
            out_dma(slot, u - nslots).wait()

        for gi in range(g):
            sl = slice(gi * d, (gi + 1) * d)
            q = qkv_vmem[slot, 0, :, sl]
            k = qkv_vmem[slot, 1, :, sl]
            v = qkv_vmem[slot, 2, :, sl]
            do = do_vmem[slot, :, sl]
            qs = (q.astype(jnp.float32) * c).astype(q.dtype)
            s = jax.lax.dot_general(
                qs, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (n, n), log2 domain
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m)
            # NOTE: this remat softmax uses a single global row max, while
            # the forward (_packed_compute_slot) scales with SPLIT partial
            # maxes — recomputed P differs from the forward's at rounding
            # level; the 0.02 grad bound in tests is an empirical, not
            # structural, guarantee of that association difference
            P = p / jnp.sum(p, axis=-1, keepdims=True)  # fp32 softmax
            Pc = P.astype(do.dtype)
            dv = jax.lax.dot_general(
                Pc, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (n, d)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (n, n)
            delta = jnp.sum(P * dp, axis=-1, keepdims=True)
            ds0 = (P * (dp - delta)).astype(k.dtype)
            dq = jax.lax.dot_general(
                ds0, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(
                ds0, qs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * LN2
            dqkv_vmem[slot, 0, :, sl] = dq.astype(dqkv_vmem.dtype)
            dqkv_vmem[slot, 1, :, sl] = dk.astype(dqkv_vmem.dtype)
            dqkv_vmem[slot, 2, :, sl] = dv.astype(dqkv_vmem.dtype)
        out_dma(slot, u).start()
        return 0

    jax.lax.fori_loop(0, ng, body, 0)

    for i in range(min(nslots, ng)):
        u = ng - 1 - i
        out_dma(u % nslots, u).wait()


def packed_qkv_attention_bwd(qkv3: jnp.ndarray, dout: jnp.ndarray,
                             num_heads: int, scale: float) -> jnp.ndarray:
    """dL/d(qkv3) for packed_qkv_attention from (3, B, N, C) residuals and
    the (B, N, C) output cotangent.  Caller must check
    packed_qkv_bwd_supported first."""
    _, B, N, C = qkv3.shape
    D = C // num_heads
    g = _pick_pgroup(num_heads, N, qkv3.dtype.itemsize, D)
    npg = num_heads // g
    nslots = NSLOTS_PACKED
    return pl.pallas_call(
        functools.partial(_fusedqkv_bwd_kernel, nv=B, npg=npg, g=g, n=N,
                          d=D, scale=float(scale), nslots=nslots),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((3, B, N, C), qkv3.dtype),
        scratch_shapes=[
            pltpu.VMEM((nslots, 3, N, g * D), qkv3.dtype),
            pltpu.VMEM((nslots, N, g * D), qkv3.dtype),
            pltpu.VMEM((nslots, 3, N, g * D), qkv3.dtype),
            pltpu.SemaphoreType.DMA((nslots,)),
            pltpu.SemaphoreType.DMA((nslots,)),
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(qkv3, dout)


def packed_qkv_attention(qkv3: jnp.ndarray, num_heads: int,
                         scale: float) -> jnp.ndarray:
    """Self-attention over a packed (3, B, N, C) qkv array (q/k already
    roped), returning (B, N, C) — the zero-relayout single-DMA-per-unit
    road.  Caller must check `packed_attention_supported((B, N, H, C//H),
    dtype)` first."""
    return _fusedqkv_bnc(qkv3, num_heads, float(scale))


def batched_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      scale: float) -> jnp.ndarray:
    """Many-small-heads attention over (B, N, H, D); self-attention only
    (N_q == N_kv).  Prefers the zero-relayout packed kernel, then the padded
    kernel, then the XLA path for unsupported shapes."""
    if q.shape == k.shape and packed_attention_supported(q.shape, q.dtype):
        return _packed_bnhd(q, k, v, float(scale))
    if q.shape != k.shape or not batched_attention_supported(q.shape, q.dtype):
        from fast3r_tpu.ops.attention import dot_product_attention

        return dot_product_attention(q, k, v, scale, impl="xla")
    return _batched_bnhd(q, k, v, float(scale))
