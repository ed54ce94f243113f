"""Single-program manual-DMA bilinear resize (align_corners=True) kernel.

The DPT regression trunk's full-resolution upsample (dpt_head.py:179,
reference croco/models/dpt_block.py:374 ``F.interpolate(align_corners=True)``)
is the head's single most expensive non-conv op: the dense-matrix XLA
formulation (ops/resize.py) costs 1.9 ms at the headline shape
(4,192,256,128)->(384,512) where pure HBM bandwidth is ~0.3 ms — every
formulation XLA offers (einsum, batched dot_general, static gather+lerp)
pays full-array relayout passes because one of the two contractions always
lands on a non-minor axis (measured ladder in scripts/bench_head.py, r3).

This kernel owns the data movement instead (same single-program pattern as
ops/batched_attention.py):

  * x is viewed (B, H, W*C) — lane dim W*C, rows on sublanes.  Per output
    row-block, an (RIN, W*C) row window streams into a 2-deep VMEM ring
    (pltpu.make_async_copy; the next block's fetch is issued before this
    block's compute);
  * the H-pass is ONE MXU matmul per block: a host-built (RB, RIN) weight
    block (2-tap rows of the align_corners interp matrix, shifted to the
    block's window) contracts the window's sublanes — no relayout, fp32
    accumulate, bf16 result;
  * the W-pass never transposes: output columns are 2-tap lerps of input
    columns, and in the (RB, W*C) flat layout each tap is a STATIC
    128-aligned lane slice — an unrolled loop of P vector lerps in VMEM;
  * per-block row windows/weights vary (the align_corners grid drifts, so
    block starts are not a fixed stride): starts ride in SMEM, weight
    blocks in VMEM, both indexed by the loop counter.

Forward-only kernel; under jax.grad a custom VJP computes the exact
transpose through the dense-matrix path (resize is linear, so the VJP is
the transposed interp matrices — ops/resize.py _resize_matmul machinery).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fast3r_tpu.ops.flash_attention import _interpret
from fast3r_tpu.ops.resize import _interp_taps, _resize_matmul

NSLOTS = 2
LANE = 128
MAX_LANES_IN = 32 * 1024   # W*C cap: the (RB, W*C) y tile must fit VMEM
MAX_LANES_OUT = 64 * 1024  # P*C cap: the (RB, P*C) out tile must fit VMEM
VMEM_LIMIT = 100 * 1024 * 1024  # v5 VMEM is 128 MB; default scoped limit is
                                # lower, so ask Mosaic for headroom explicitly


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=64)
def _row_plan(h: int, out_h: int, rb: int):
    """Per-output-row-block input windows + weight blocks.

    Returns (starts (nrb,) int32, mats (nrb, rb, rin) float32, rin), or
    (None, None, 0) if no plan exists.  Mosaic requires HBM row slices to be
    8-ALIGNED in both start and extent (caught on hardware, r3 — interpret
    mode accepts anything), so windows are aligned down and padded up; that
    needs h % 8 == 0 for the end-of-array clamp to stay aligned.
    """
    if h % 8 or out_h % rb:
        return None, None, 0
    lo, hi, frac = _interp_taps(out_h, h)
    nrb = out_h // rb
    spans = [
        int(hi[(b + 1) * rb - 1]) - (int(lo[b * rb]) & ~7) + 1
        for b in range(nrb)
    ]
    rin = min(_round_up(max(spans), 8), h)
    starts = np.zeros(nrb, np.int32)
    mats = np.zeros((nrb, rb, rin), np.float32)
    for b in range(nrb):
        s0 = max(0, min(int(lo[b * rb]) & ~7, h - rin))
        starts[b] = s0
        for i in range(rb):
            o = b * rb + i
            if int(hi[o]) - s0 >= rin:
                return None, None, 0  # window cannot cover this block
            mats[b, i, int(lo[o]) - s0] += 1.0 - float(frac[o])
            mats[b, i, int(hi[o]) - s0] += float(frac[o])
    return starts, mats, rin


def _vmem_estimate(rb: int, rin: int, wc: int, pc: int, nrb: int,
                   itemsize: int) -> int:
    tiles = NSLOTS * rin * wc * itemsize      # input row-window ring
    y = rb * wc * itemsize                    # H-pass result
    acc = rb * min(wc, 4 * 1024) * 4          # fp32 dot accumulator (chunked)
    out = rb * pc * itemsize                  # single-buffered output tile
    mats = nrb * rb * rin * itemsize
    return tiles + y + acc + out + mats


def _pick_rb(h: int, out_h: int, wc: int, pc: int, itemsize: int) -> int:
    # prefer the LARGEST block that fits: the kernel is DMA-wait-bound
    # (~30 us/block of issue/wait latency vs ~7 us of bytes at the headline
    # shape — the dmaonly probe in scripts/bench_head.py equals the full
    # kernel), so fewer/bigger blocks win as long as VMEM holds them
    for rb in (64, 48, 32, 16, 8):
        if out_h % rb:
            continue
        _, _, rin = _row_plan(h, out_h, rb)
        if rin == 0:
            continue
        if _vmem_estimate(rb, rin, wc, pc, out_h // rb, itemsize) \
                <= 15 * 1024 * 1024:
            return rb
    return 0


def resize_kernel_supported(shape, out_h: int, out_w: int, dtype) -> bool:
    """(B, H, W, C) -> (B, out_h, out_w, C) coverage of the pallas kernel."""
    if len(shape) != 4:
        return False
    B, h, w, c = shape
    if jnp.dtype(dtype).itemsize != 2:
        return False  # fp32 doubles every tile; the XLA path serves parity
    if c % LANE or h < 2 or w < 2 or out_h < 2 or out_w < 2:
        return False
    if w * c > MAX_LANES_IN or out_w * c > MAX_LANES_OUT:
        return False
    # only worth it at regression-trunk scale: at the DPT fusion-block
    # upsample shapes (h<=96 at c=256) the kernel LOSES to the XLA matmul
    # form (head 'full' probe 8.18 vs 7.47 ms, scripts/bench_head.py r3) —
    # per-call fixed cost plus a W pass whose unrolled per-column lerps
    # don't amortize over few rows
    if h * w * c < 192 * 256 * 128:
        return False
    return _pick_rb(h, out_h, w * c, out_w * c, 2) > 0


def _resize_kern(starts_smem, x_hbm, mh_hbm, o_hbm,
                 in_vmem, y_vmem, o_vmem, mh_vmem,
                 in_sem, out_sem, mh_sem,
                 *, nb: int, nrb: int, rb: int, rin: int,
                 w: int, c: int, p_taps, dtype):
    """One program; fori_loop over B*nrb output row-blocks."""
    nu = nb * nrb

    mh_dma = pltpu.make_async_copy(mh_hbm, mh_vmem, mh_sem)
    mh_dma.start()

    def in_dma(slot, u):
        bi = u // nrb
        rbi = jax.lax.rem(u, nrb)
        # starts ride in SMEM divided by 8: the explicit *8 lets Mosaic PROVE
        # the dynamic row offset is tile-aligned (a raw SMEM value fails
        # "tile index divisible by tiling" even when every value is aligned)
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(starts_smem[rbi] * 8, rin)],
            in_vmem.at[slot], in_sem.at[slot])

    def out_dma(u):
        return pltpu.make_async_copy(
            o_vmem,
            o_hbm.at[u // nrb, pl.ds(jax.lax.rem(u, nrb) * rb, rb)],
            out_sem)

    for u in range(NSLOTS - 1):
        in_dma(u % NSLOTS, u).start()

    mh_dma.wait()

    def body(u, _):
        slot = jax.lax.rem(u, NSLOTS)
        pre = u + NSLOTS - 1

        @pl.when(pre < nu)
        def _prefetch():
            in_dma(jax.lax.rem(pre, NSLOTS), pre).start()

        in_dma(slot, u).wait()

        rbi = jax.lax.rem(u, nrb)
        mh = mh_vmem[rbi]  # (rb, rin)

        # H pass: one MXU matmul per lane chunk, fp32 accumulate
        cc = min(w * c, 4 * 1024)
        for j in range(0, w * c, cc):
            y_vmem[:, j:j + cc] = jax.lax.dot_general(
                mh, in_vmem[slot, :, j:j + cc],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype)

        # output tile is single-buffered: drain its previous DMA before reuse
        @pl.when(u >= 1)
        def _reclaim():
            out_dma(u - 1).wait()

        # W pass: static 128-aligned lane slices; 2-tap lerp per output col
        one = jnp.asarray(1.0, dtype)
        for p, (lw, hw, f) in enumerate(p_taps):
            ylo = y_vmem[:, lw * c:(lw + 1) * c]
            if f == 0.0 or hw == lw:
                o_vmem[:, p * c:(p + 1) * c] = ylo
            else:
                yhi = y_vmem[:, hw * c:(hw + 1) * c]
                fb = jnp.asarray(f, dtype)
                o_vmem[:, p * c:(p + 1) * c] = ylo * (one - fb) + yhi * fb

        out_dma(u).start()
        return 0

    jax.lax.fori_loop(0, nu, body, 0, unroll=False)
    out_dma(nu - 1).wait()


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def resize_bilinear_kernel(x: jnp.ndarray, out_h: int, out_w: int):
    """Pallas bilinear align_corners=True resize (see module docstring).

    Caller must gate on resize_kernel_supported; numerics match the dense
    matmul form at input-dtype rounding (bf16: H pass fp32-accumulated on
    the MXU, W pass a 2-tap bf16 lerp).
    """
    B, h, w, c = x.shape
    wc, pc = w * c, out_w * c
    rb = _pick_rb(h, out_h, wc, pc, x.dtype.itemsize)
    starts, mats, rin = _row_plan(h, out_h, rb)
    nrb = out_h // rb

    lo_w, hi_w, frac_w = _interp_taps(out_w, w)
    p_taps = tuple(
        (int(lo_w[p]), int(hi_w[p]), float(frac_w[p])) for p in range(out_w)
    )

    out = pl.pallas_call(
        functools.partial(
            _resize_kern, nb=B, nrb=nrb, rb=rb, rin=rin, w=w, c=c,
            p_taps=p_taps, dtype=x.dtype),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((B, out_h, pc), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((NSLOTS, rin, wc), x.dtype),
            pltpu.VMEM((rb, wc), x.dtype),
            pltpu.VMEM((rb, pc), x.dtype),
            pltpu.VMEM((nrb, rb, rin), x.dtype),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(jnp.asarray(starts // 8), x.reshape(B, h, wc),
      jnp.asarray(mats, x.dtype))
    return out.reshape(B, out_h, out_w, c)


def _resize_fwd(x, out_h, out_w):
    return resize_bilinear_kernel(x, out_h, out_w), x.shape


def _resize_bwd(out_h, out_w, in_shape, g):
    # resize is linear: VJP = transposed interp matrices (exact transpose of
    # the forward taps; the dense-matrix path shares the tap math)
    from fast3r_tpu.ops.resize import _interp_matrix

    _, h, w, _ = in_shape
    dtype = g.dtype
    if w != out_w:
        mw = jnp.asarray(_interp_matrix(out_w, w), dtype)
        g = jnp.einsum("Ow,bhOc->bhwc", mw, g)
    if h != out_h:
        mh = jnp.asarray(_interp_matrix(out_h, h), dtype)
        g = jnp.einsum("Oh,bOwc->bhwc", mh, g)
    return (g,)


resize_bilinear_kernel.defvjp(_resize_fwd, _resize_bwd)
