"""Fused DPT regression-trunk kernel: conv1 -> bilinear resize -> conv2 -> ReLU.

The head's regression trunk (models/dpt_head.py:178-181, reference
croco/models/dpt_block.py:365-377) measured 5.07 ms per 4-view invocation at
the flagship shape vs a ~2.7 ms speed-of-light (BENCHMARKS.md r3 per-phase
table): the two 3x3 convs run ~0.9 ms slower in-context than isolated (XLA
fusion-boundary relayouts around the resize), and the standalone resize
kernel is DMA-wait-bound.  This kernel runs the whole trunk per output
row-block in one program, so the conv1 output, the resized grid and the
conv2 input never touch HBM:

  * x is viewed as a flat pixel matrix (B*Hh*Wc, C) — pixels on sublanes,
    channels on lanes.  A 3x3 conv is then 9 shifted (N, C) @ (C, C') MXU
    matmuls: the dy taps are row shifts by +-Wc (sublane-aligned since
    Wc % 8 == 0), and the dx taps read two pre-shifted MASKED copies of the
    window (built once per block: one misaligned-by-1 read + a column-wrap
    mask, after which every tap slice is 8-aligned);
  * image-edge zero padding falls out of zeroed VMEM margins around the
    DMA'd window: when the window clamps to the image top/bottom, the
    margin rows ARE the zero padding;
  * the W resize pass is one (out_w, Wc) interp-matrix matmul per coarse
    row (MXU, fp32 accumulate); the H pass is a 2-tap row-range lerp per
    fine row, with per-(block, row) window-local tap indices and fractions
    precomputed on the host (SMEM), multiplied by out_w in-kernel so Mosaic
    can prove sublane alignment of the dynamic slices;
  * conv2 (+bias, ReLU) runs on the fine grid in row chunks with fp32
    accumulators;
  * fused_regression_head additionally folds the 1x1 conv3 into each conv2
    chunk as a TRANSPOSED dot — (OUT3, c1) @ (chunk, c1)^T puts the 4 (padded
    to 8) output channels on sublanes and the pixels on lanes, so the result
    is DMA-able as a (B, OUT3, H*W) map and the full-res 128-channel trunk
    output never touches HBM (~400 MB less traffic per 4-view invocation);
    the conv3 bias + layout restore happen outside where XLA fuses them with
    postprocess.

Forward-only: the custom VJP recomputes through the plain
conv2d -> interp-matmul -> conv2d composition (remat semantics, gradient
numerics match the unfused path at bf16 rounding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fast3r_tpu.ops.flash_attention import _interpret
from fast3r_tpu.ops.resize import _interp_matrix, _interp_taps

NSLOTS = 4
LANE = 128
OUT3 = 8  # conv3 output channels padded to one sublane tile (num_channels=4)
# Scoped-VMEM ceiling for the fused program (v5e physical VMEM = 128 MiB).
# 100 MiB rejected the 12-view training shape (256x320 fine grid, rb=64
# plan): Mosaic's stack wants 104.07 MiB there — caught on hardware as a
# compile-time OOM in the train step's jvp (r3).  The headline 512-res shape
# (rb=48) compiles well under either limit; r4 probed NSLOTS=4 at this limit
# on hardware (scripts/bench_trunk_ns.py: ns=2 2.976 / ns=3 3.030 / ns=4
# 2.830 ms, outputs identical).
VMEM_LIMIT = 124 * 1024 * 1024
# Gap between _vmem_estimate's live-set model and what Mosaic's scoped-stack
# allocator actually asks for, anchored to the one hardware measurement we
# have: the 12-view training shape (hh=128, wc=160 -> 256x320 fine, rb=64)
# estimates 46.61 MiB but Mosaic wanted 104.07 MiB (r3 compile-time OOM on
# hardware).  The gate below requires estimate + margin <= VMEM_LIMIT so the
# support check tracks the REAL cap instead of an arbitrary threshold; both
# known-good shapes clear it (12-view 104.6, headline 115.6 <= 116 — the
# headline shape is known to compile at this limit).
MOSAIC_STACK_MARGIN = 58 * 1024 * 1024
CHUNK_FINE_ROWS = 8  # conv2 fp32-accumulator chunk, in fine image rows


@functools.lru_cache(maxsize=64)
def _trunk_plan(hh: int, out_h: int, rb: int):
    """Per-output-row-block coarse windows and H-pass taps.

    Block b covers fine rows [b*rb - 1, b*rb + rb + 1) (the +-1 halo rows
    feed conv2's dy taps).  Returns (cs (nrb,), lo_local (nrb, rb+2),
    frac (nrb, rb+2), rin_c) or (None,)*3 + (0,) if no plan exists.  Taps
    at hi == hh-1 are re-expressed as (lo-1, frac=1) so lo_local+1 always
    stays inside the window.
    """
    if out_h % rb or hh < 4:
        return None, None, None, 0
    lo_t, hi_t, frac_t = _interp_taps(out_h, hh)
    nrb = out_h // rb
    l_all = np.zeros((nrb, rb + 2), np.int64)
    f_all = np.zeros((nrb, rb + 2), np.float32)
    for b in range(nrb):
        for i in range(rb + 2):
            f = min(max(b * rb - 1 + i, 0), out_h - 1)
            l, fr = int(lo_t[f]), float(frac_t[f])
            if l >= hh - 1:  # keep l+1 in range (fr == 0 there)
                l, fr = hh - 2, 1.0 if fr == 0.0 else fr
            l_all[b, i], f_all[b, i] = l, fr
    spans = l_all.max(1) + 3 - (l_all.min(1) - 1)  # [min-1, max+2)
    rin_c = int(spans.max())
    if rin_c > hh:
        return None, None, None, 0
    cs = np.clip(l_all.min(1) - 1, 0, hh - rin_c).astype(np.int32)
    lo_local = (l_all - cs[:, None]).astype(np.int32)
    assert (lo_local >= 0).all() and (lo_local + 1 <= rin_c - 1).all()
    return cs, lo_local, f_all, rin_c


def _pick_rb(out_h: int, hh: int) -> int:
    """Largest block size with a valid coarse-window plan (whole-image
    blocks have no room for the conv halo, so nrb == 1 usually fails)."""
    for rb in (48, 64, 32, 24, 16, 8):
        if out_h % rb or rb % CHUNK_FINE_ROWS:
            continue
        *_, rin_c = _trunk_plan(hh, out_h, rb)
        if rin_c:
            return rb
    return 0


def _vmem_estimate(rin_c, wc, cin, c1, rb, out_w, itemsize, c3=0,
                   nslots=None):
    if nslots is None:
        nslots = NSLOTS
    lb = rin_c * wc + 2 * (wc + 8)
    lz = (rb + 2) * out_w + 16
    ring = nslots * lb * cin * itemsize
    copies1 = 2 * lb * cin * itemsize
    y1 = rin_c * wc * c1 * itemsize
    wide = rin_c * out_w * c1 * itemsize
    z = lz * c1 * itemsize
    copies2 = 2 * lz * c1 * itemsize
    acc = CHUNK_FINE_ROWS * out_w * c1 * 4 + rin_c * wc * c1 * 4
    out = nslots * rb * out_w * (OUT3 if c3 else c1) * itemsize
    w_res = (9 * cin * c1 + 9 * c1 * c1 + out_w * wc) * itemsize
    return ring + copies1 + y1 + wide + z + copies2 + acc + out + w_res


def trunk_kernel_supported(x_shape, out_h: int, out_w: int, dtype,
                           c1: int = 128, c3: int = 0) -> bool:
    """(B, Hh, Wc, C) -> fused trunk coverage check.

    c3 > 0 gates the conv3-folded variant (fused_regression_head): the final
    1x1 conv rides the conv2 chunks and the kernel emits a transposed
    (OUT3, H*W) map instead of the (H*W, c1) trunk output — the full-res
    128-channel tensor never touches HBM.
    """
    if len(x_shape) != 4 or jnp.dtype(dtype).itemsize != 2:
        return False
    B, hh, wc, cin = x_shape
    if cin % LANE or c1 % LANE or wc % 8 or out_w % 8 or c3 > OUT3:
        return False
    if hh * wc * cin < 96 * 128 * 256:  # only worth it at trunk scale
        return False
    rb = _pick_rb(out_h, hh)
    if rb == 0:
        return False
    *_, rin_c = _trunk_plan(hh, out_h, rb)
    est = _vmem_estimate(rin_c, wc, cin, c1, rb, out_w,
                         jnp.dtype(dtype).itemsize, c3=c3)
    return est + MOSAIC_STACK_MARGIN <= VMEM_LIMIT


def _trunk_kern(cs_smem, lo_smem, frac_smem,
                x_hbm, w1_vmem, b1_vmem, w2_vmem, b2_vmem, mw_vmem,
                w3_vmem,
                o_hbm,
                in_vmem, p1_vmem, m1_vmem, y1_vmem, wide_vmem, z_vmem,
                p2_vmem, m2_vmem, o_vmem,
                in_sem, out_sem,
                *, nb: int, nrb: int, rb: int, rin_c: int,
                wc: int, out_w: int, cin: int, c1: int, dtype,
                fused3: bool, ablate: str = ""):
    """One program; fori_loop over B*nrb output row-blocks.

    `ablate` (diagnostics only, scripts/bench_head.py trunk_* probes —
    outputs are WRONG under any non-empty value): "noconv1" zeroes y1
    instead of the 9 conv1 matmuls, "now" zeroes wide instead of the W-pass
    interp matmuls, "noh" zero-fills z instead of running the per-fine-row
    lerps (a zero-fill is cheaper than a row copy, so the full-minus-noh
    delta slightly OVERSTATES the H-pass cost — read it as an upper bound),
    "noconv2" skips conv2's matmul chunks, "dmaonly" skips all
    compute.  Each variant keeps every buffer shape and the DMA schedule
    identical so the timing difference isolates that stage's cost."""
    base1 = wc + 8                 # interior start in the input window buffer
    l1 = rin_c * wc                # conv1 output rows (pixel rows)
    lb = l1 + 2 * base1            # window buffer rows incl. zero margins
    base2 = 8                      # interior start in the z buffer
    lz = (rb + 2) * out_w + 16
    nu = nb * nrb

    # zero the margins once: DMA only ever writes the interior
    for s in range(NSLOTS):
        in_vmem[s, :base1] = jnp.zeros((base1, cin), dtype)
        in_vmem[s, base1 + l1:] = jnp.zeros((lb - base1 - l1, cin), dtype)
    z_vmem[:base2] = jnp.zeros((base2, c1), dtype)
    z_vmem[base2 + (rb + 2) * out_w:] = jnp.zeros((8, c1), dtype)

    # column-wrap masks: buffer row b holds pixel col (b - interior_base) mod
    # width, and copyX[i] = buf[i + shift], so the source col of copy row i
    # is (i + shift - base) mod width
    def colmask(length, width, shift, base, kill_col):
        idx = jax.lax.broadcasted_iota(jnp.int32, (length, 1), 0)
        return ((idx + (shift - base)) % width != kill_col).astype(dtype)

    mp1 = colmask(lb - 8, wc, 1, base1, 0)          # dx=+1: src col 0 invalid
    mm1 = colmask(lb - 8, wc, 7, base1, wc - 1)     # dx=-1: src col wc-1
    mp2 = colmask(lz - 8, out_w, 1, base2, 0)
    mm2 = colmask(lz - 8, out_w, 7, base2, out_w - 1)

    def in_dma(slot, u):
        bi = u // nrb
        rbi = jax.lax.rem(u, nrb)
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(cs_smem[rbi] * wc, l1)],
            in_vmem.at[slot, pl.ds(base1, l1)], in_sem.at[slot])

    def out_dma(slot, u):
        if fused3:
            dst = o_hbm.at[u // nrb, :,
                           pl.ds(jax.lax.rem(u, nrb) * (rb * out_w),
                                 rb * out_w)]
        else:
            dst = o_hbm.at[u // nrb,
                           pl.ds(jax.lax.rem(u, nrb) * (rb * out_w),
                                 rb * out_w)]
        return pltpu.make_async_copy(o_vmem.at[slot], dst, out_sem.at[slot])

    for u in range(NSLOTS - 1):
        in_dma(u % NSLOTS, u).start()

    do_conv1 = ablate not in ("noconv1", "dmaonly")
    do_w = ablate not in ("now", "dmaonly")
    do_h = ablate not in ("noh", "dmaonly")
    do_conv2 = ablate not in ("noconv2", "dmaonly")

    def body(u, _):
        slot = jax.lax.rem(u, NSLOTS)
        rbi = jax.lax.rem(u, nrb)
        pre = u + NSLOTS - 1

        @pl.when(pre < nu)
        def _prefetch():
            in_dma(jax.lax.rem(pre, NSLOTS), pre).start()

        in_dma(slot, u).wait()

        # conv1: shifted masked copies, then 9 aligned-tap MXU matmuls
        if do_conv1:
            p1_vmem[:] = in_vmem[slot, pl.ds(1, lb - 8)] * mp1   # buf[i+1]
            m1_vmem[:] = in_vmem[slot, pl.ds(7, lb - 8)] * mm1   # buf[i+7]
            acc = b1_vmem[:].astype(jnp.float32)
            for dy in (-1, 0, 1):
                taps = (
                    (in_vmem[slot, pl.ds(base1 + dy * wc, l1)], 1),   # dx=0
                    (p1_vmem[pl.ds(base1 + dy * wc, l1)], 2),          # dx=+1
                    (m1_vmem[pl.ds(base1 + dy * wc - 8, l1)], 0),      # dx=-1
                )
                for src, kx in taps:
                    acc = acc + jax.lax.dot_general(
                        src, w1_vmem[dy + 1, kx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            y1_vmem[:] = acc.astype(dtype)
        elif ablate == "noconv1":
            y1_vmem[:] = jnp.zeros((l1, c1), dtype)

        # W resize pass: one interp-matrix matmul per coarse row
        if do_w:
            for r in range(rin_c):
                wide_vmem[pl.ds(r * out_w, out_w)] = jax.lax.dot_general(
                    mw_vmem[:], y1_vmem[pl.ds(r * wc, wc)],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dtype)
        elif ablate == "now":
            wide_vmem[:] = jnp.zeros((rin_c * out_w, c1), dtype)

        # H resize pass: 2-tap row-range lerp per fine row (incl. halo rows)
        if do_h:
            for i in range(rb + 2):
                l = lo_smem[rbi * (rb + 2) + i]
                f = frac_smem[rbi * (rb + 2) + i]
                zlo = wide_vmem[pl.ds(l * out_w, out_w)].astype(jnp.float32)
                zhi = wide_vmem[pl.ds(l * out_w + out_w, out_w)].astype(
                    jnp.float32)
                z_vmem[pl.ds(base2 + i * out_w, out_w)] = (
                    zlo * (1.0 - f) + zhi * f).astype(dtype)
        elif ablate == "noh":
            z_vmem[pl.ds(base2, (rb + 2) * out_w)] = jnp.zeros(
                ((rb + 2) * out_w, c1), dtype)

        # fine halo rows outside the image are zero padding (torch conv pad)
        @pl.when(rbi == 0)
        def _top():
            z_vmem[pl.ds(base2, out_w)] = jnp.zeros((out_w, c1), dtype)

        @pl.when(rbi == nrb - 1)
        def _bot():
            z_vmem[pl.ds(base2 + (rb + 1) * out_w, out_w)] = jnp.zeros(
                (out_w, c1), dtype)

        @pl.when(u >= NSLOTS)
        def _reclaim():
            out_dma(slot, u - NSLOTS).wait()

        # conv2 + bias + ReLU on the fine grid, chunked fp32 accumulation;
        # when fused3, the 1x1 conv3 rides each chunk as a transposed MXU
        # dot (M = OUT3 sublanes, N = chunk pixels on lanes) so the
        # 128-channel trunk output never leaves VMEM
        if do_conv2:
            p2_vmem[:] = z_vmem[pl.ds(1, lz - 8)] * mp2
            m2_vmem[:] = z_vmem[pl.ds(7, lz - 8)] * mm2
            cr = CHUNK_FINE_ROWS * out_w
            for c0 in range(0, rb * out_w, cr):
                acc2 = b2_vmem[:].astype(jnp.float32)
                for dy in (-1, 0, 1):
                    o0 = base2 + out_w + c0 + dy * out_w
                    taps = (
                        (z_vmem[pl.ds(o0, cr)], 1),
                        (p2_vmem[pl.ds(o0, cr)], 2),
                        (m2_vmem[pl.ds(o0 - 8, cr)], 0),
                    )
                    for src, kx in taps:
                        acc2 = acc2 + jax.lax.dot_general(
                            src, w2_vmem[dy + 1, kx],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                zc = jnp.maximum(acc2, 0.0).astype(dtype)
                if fused3:
                    # (OUT3, c1) @ (cr, c1)^T — contraction on both minor
                    # dims; the MXU's operand-transpose path handles the
                    # N-major rhs
                    ot = jax.lax.dot_general(
                        w3_vmem[:], zc, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    o_vmem[slot, :, pl.ds(c0, cr)] = ot.astype(dtype)
                else:
                    o_vmem[slot, pl.ds(c0, cr)] = zc

        out_dma(slot, u).start()
        return 0

    jax.lax.fori_loop(0, nu, body, 0, unroll=False)

    for i in range(min(NSLOTS, nu)):
        u = nu - 1 - i
        out_dma(u % NSLOTS, u).wait()


def _trunk_call(x, w1, b1, w2, b2, out_h: int, out_w: int, w3=None,
                ablate: str = ""):
    B, hh, wc, cin = x.shape
    c1 = w1.shape[-1]
    rb = _pick_rb(out_h, hh)
    cs, lo_local, fracs, rin_c = _trunk_plan(hh, out_h, rb)
    nrb = out_h // rb
    dtype = x.dtype
    fused3 = w3 is not None

    mw = jnp.asarray(_interp_matrix(out_w, wc), dtype)
    lb = rin_c * wc + 2 * (wc + 8)
    lz = (rb + 2) * out_w + 16

    if fused3:
        # transposed + OUT3-padded 1x1 kernel: (c1, c3) -> (OUT3, c1)
        w3t = jnp.zeros((OUT3, c1), dtype).at[: w3.shape[-1]].set(
            w3.reshape(c1, -1).T.astype(dtype))
        out_shape = jax.ShapeDtypeStruct((B, OUT3, out_h * out_w), dtype)
        o_scratch = pltpu.VMEM((NSLOTS, OUT3, rb * out_w), dtype)
    else:
        w3t = jnp.zeros((OUT3, c1), dtype)
        out_shape = jax.ShapeDtypeStruct((B, out_h * out_w, c1), dtype)
        o_scratch = pltpu.VMEM((NSLOTS, rb * out_w, c1), dtype)

    out = pl.pallas_call(
        functools.partial(
            _trunk_kern, nb=B, nrb=nrb, rb=rb, rin_c=rin_c, wc=wc,
            out_w=out_w, cin=cin, c1=c1, dtype=dtype, fused3=fused3,
            ablate=ablate),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((NSLOTS, lb, cin), dtype),
            pltpu.VMEM((lb - 8, cin), dtype),
            pltpu.VMEM((lb - 8, cin), dtype),
            pltpu.VMEM((rin_c * wc, c1), dtype),
            pltpu.VMEM((rin_c * out_w, c1), dtype),
            pltpu.VMEM((lz, c1), dtype),
            pltpu.VMEM((lz - 8, c1), dtype),
            pltpu.VMEM((lz - 8, c1), dtype),
            o_scratch,
            pltpu.SemaphoreType.DMA((NSLOTS,)),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
        interpret=_interpret(),
    )(jnp.asarray(cs), jnp.asarray(lo_local.reshape(-1)),
      jnp.asarray(fracs.reshape(-1)),
      x.reshape(B, hh * wc, cin),
      w1.astype(dtype), b1.astype(dtype), w2.astype(dtype), b2.astype(dtype),
      mw, w3t)
    if fused3:
        return out  # (B, OUT3, out_h*out_w); caller transposes/slices
    return out.reshape(B, out_h, out_w, c1)


def _plain_trunk(x, w1, b1, w2, b2, out_h: int, out_w: int):
    from fast3r_tpu.nn.layers import conv2d
    from fast3r_tpu.ops.resize import _resize_matmul

    y = conv2d({"w": w1, "b": b1}, x, padding=[(1, 1), (1, 1)])
    y = _resize_matmul(y, out_h, out_w)
    y = conv2d({"w": w2, "b": b2}, y, padding=[(1, 1), (1, 1)])
    return jax.nn.relu(y)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_regression_trunk(x, w1, b1, w2, b2, out_h, out_w):
    """relu(conv2(resize(conv1(x)))) fused in one Pallas program (module
    docstring).  Caller must gate on trunk_kernel_supported.  Numerics match
    the plain composition at input-dtype rounding (fp32 MXU accumulation
    throughout; the H lerp runs in fp32)."""
    return _trunk_call(x, w1, b1, w2, b2, out_h, out_w)


def _trunk_fwd(x, w1, b1, w2, b2, out_h, out_w):
    return fused_regression_trunk(x, w1, b1, w2, b2, out_h, out_w), (
        x, w1, b1, w2, b2)


def _trunk_bwd(out_h, out_w, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _plain_trunk(*a, out_h, out_w), x, w1, b1, w2, b2)
    return vjp(g)


fused_regression_trunk.defvjp(_trunk_fwd, _trunk_bwd)


def _plain_head(x, w1, b1, w2, b2, w3, b3, out_h: int, out_w: int):
    from fast3r_tpu.nn.layers import conv2d

    y = _plain_trunk(x, w1, b1, w2, b2, out_h, out_w)
    return conv2d({"w": w3, "b": b3}, y, padding="VALID")


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_regression_head(x, w1, b1, w2, b2, w3, b3, out_h, out_w):
    """conv3(relu(conv2(resize(conv1(x))))) — the trunk kernel with the 1x1
    conv3 folded in (module docstring / trunk_kernel_supported c3 notes).

    The kernel emits a transposed (B, OUT3, H*W) map so the full-res
    128-channel trunk output never round-trips HBM (~400 MB of traffic per
    4-view invocation at the 512x384 flagship shape); this wrapper restores
    (B, H, W, c3) layout and adds the conv3 bias (XLA fuses both with
    postprocess).  Caller must gate on trunk_kernel_supported(..., c3=).
    Numerics match the plain composition at input-dtype rounding.
    """
    c3 = w3.shape[-1]
    o = _trunk_call(x, w1, b1, w2, b2, out_h, out_w, w3=w3)
    o = jnp.swapaxes(o, 1, 2)[..., :c3] + b3.astype(x.dtype)
    return o.reshape(x.shape[0], out_h, out_w, c3)


def _head_fwd(x, w1, b1, w2, b2, w3, b3, out_h, out_w):
    return fused_regression_head(x, w1, b1, w2, b2, w3, b3, out_h, out_w), (
        x, w1, b1, w2, b2, w3, b3)


def _head_bwd(out_h, out_w, res, g):
    _, vjp = jax.vjp(lambda *a: _plain_head(*a, out_h, out_w), *res)
    return vjp(g)


fused_regression_head.defvjp(_head_fwd, _head_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_regression_head_t(x, w1, b1, w2, b2, w3, b3, out_h, out_w):
    """fused_regression_head emitting the TRANSPOSED (B, c3, H*W) map — the
    layout the kernel already produces (channels on sublanes, pixels on
    lanes).  The postprocess exp-map then runs lane-major over full pixel
    rows (ops/postprocess.py:postprocess_transposed) and the wrapper's
    (B, H*W, c3) relayout disappears; only the 3-channel pts3d transpose at
    the very end remains.  Same gating and numerics as
    fused_regression_head (the bias add is the identical x.dtype op).
    """
    c3 = w3.shape[-1]
    o = _trunk_call(x, w1, b1, w2, b2, out_h, out_w, w3=w3)
    return o[:, :c3] + b3.astype(x.dtype)[None, :, None]


def _head_t_fwd(x, w1, b1, w2, b2, w3, b3, out_h, out_w):
    return fused_regression_head_t(x, w1, b1, w2, b2, w3, b3, out_h, out_w), (
        x, w1, b1, w2, b2, w3, b3)


def _head_t_bwd(out_h, out_w, res, g):
    B, c3, _ = g.shape
    g_nhwc = jnp.swapaxes(g, 1, 2).reshape(B, out_h, out_w, c3)
    _, vjp = jax.vjp(lambda *a: _plain_head(*a, out_h, out_w), *res)
    return vjp(g_nhwc)


fused_regression_head_t.defvjp(_head_t_fwd, _head_t_bwd)
