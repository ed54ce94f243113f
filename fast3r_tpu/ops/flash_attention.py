"""Pallas TPU flash attention — the hot kernel of the Fast3R fusion decoder.

The reference scales its all-view global attention with torch SDPA flash
kernels (croco/models/blocks.py:171-190).  On TPU, XLA's generic attention
materializes the full (H, S, S) logits (14 GB at 20 views x 768 patches), so
this kernel implements the online-softmax streaming algorithm directly:

  forward: for each q block, loop kv blocks; keep running row-max m, row-sum l
           and the output accumulator in VMEM scratch; one pass over K/V.
  backward: two kernels — dq (loop over kv) and dk/dv (loop over q) — using
           the saved logsumexp, the standard flash backward recurrence.

Workload characteristics this is tuned for (vs a generic kernel):
  * no masks, no causality (bidirectional all-view attention), no dropout
    (flagship attn_drop=0) — so no masking overhead in the inner loop;
  * head_dim 64, seq len S = V * patches (768..1.5M), batch 1-2000;
  * softmax scale is a runtime-constant float (supports the inference
    entropy-bias scale, blocks.py:118-124).

Grid layout: (B, H, q_blocks, kv_blocks) with the kv axis innermost — TPU
grids execute sequentially on a core, so VMEM scratch persists across the kv
loop and the output block is written once at the final kv step.

All matmuls accumulate in fp32 on the MXU (preferred_element_type); inputs may
be bf16.  Falls back to the naive einsum path for shapes the kernel does not
tile (S not a multiple of 128).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# exp2 trick: the VPU's native exponential is base-2; folding log2(e) into
# the softmax scale turns every exp() in the inner loop into exp2() and
# saves the x*log2e multiply per element.  At D=64 the (bq, bk) elementwise
# work is on the same order as the half-MXU matmuls, so this shows up
# directly in the kernel's TFLOP/s.  The interface lse stays natural-log.
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453
# Forward block sizes tuned on TPU v5e at D=64 (see BENCHMARKS.md):
# asymmetric small-q/large-kv wins (fewer kv-loop iterations, larger DMAs),
# and the kv block is processed as `split` independent partial-softmax
# sub-chains of <= MAX_SUB_KV columns (local max + exp2-weighted merge):
# the decoupled chains let Mosaic overlap sub-block j+1's QK matmul with
# sub-block j's exp2 passes, and halve the live score tile so bigger kv
# blocks fit VMEM.  r3 sweep (after the q-prescale removed the per-tile VPU
# multiply, which shifted the optimum to FEWER chains) at S=15360:
# (1024,3840)x2 90.5, (1024,3840)x3 89.9, (1024,3840)x4 70.8 TFLOP/s.
# r2 history (pre-prescale): x3 85.8, (1024,3072)x2 84.4, (1024,1536)x1
# 81.7, (512,1536)x1 72.9 (70.7 pre-MXU-row-sum, 57.7 r1 best);
# (1280,3840)x3 exceeds VMEM — bq=1024 is the ceiling.
# Backward keeps more live buffers -> smaller blocks.
MAX_BLOCK_Q = 1024
MAX_BLOCK_KV = 3840
MAX_SUB_KV = 1920
# Backward sweep r2 (S=15360, scripts/sweep_flash_bwd.py): (512,2560) 92.1
# TFLOP/s, (1024,1536) 91.7, (512,1536) 90.1, (512,1024) 87.3, (1024,512)
# 86.5, (512,512) 74.0 (the r1 default), (256,1024) 69.9.
MAX_BLOCK_Q_BWD = 512
MAX_BLOCK_KV_BWD = 2560
# Packed head-group kernel (r5): the 64 MiB scoped-VMEM limit admits a
# bigger kv block than the BHSD kernel's default budget, and the r5 hardware
# sweep (scripts/bench_flash_packed.py --sweep, S=15360) put the optimum at
# bk=5120 with 2560-column sub-chains: (1024,5120)@2 95.4 TFLOP/s,
# (768,5120)@2 95.5, (1280,5120)@2 95.2 vs (1024,3840)@2 93.0 — ABOVE the
# naive ~95 "half-MXU SOL" estimate; whole-row (1024,15360)@6 87.1 regresses
# (score tile too large).  split sweep: @1 93.2, @2 95.4, @4 92.6.
MAX_BLOCK_KV_PACKED = 5120
MAX_SUB_KV_PACKED = 2560


def _pick_split(bk: int, max_sub: int = None) -> int:
    """Smallest sub-chain count with bk/split <= MAX_SUB_KV, split | bk and
    the sub-block a sublane multiple."""
    assert bk % 8 == 0, f"bk={bk} must be a sublane multiple"
    max_sub = max_sub or MAX_SUB_KV
    split = -(-bk // max_sub)
    while bk % split or (bk // split) % 8:
        split += 1
    return split


def _recip_fast(a):
    """fp32 reciprocal via the VPU's approximate-reciprocal + one Newton
    step: relative error ~(2^-8)^2 = 1.5e-5, below the bf16 output rounding.
    The exact fp32 division stalls the VPU (r5 measurement on the fused-
    linear GELU: 1.079 -> 0.877 ms per fc1 row pass, nn/fused_block.py);
    the softmax normalizations here are the same pattern.

    Interpret mode (CPU tests) uses the exact division: reciprocal_p has no
    jit/grad-context eval rule in this jax version, and the CPU goldens
    should exercise exact math anyway (the TPU lowering's 1.5e-5 is covered
    by the hardware parity runs, BENCHMARKS.md)."""
    if _interpret():
        return 1.0 / a
    r = pl.reciprocal(a, approx=True)
    return r * (2.0 - a * r)


def _softmax_normalize(acc, l, out_dtype):
    """acc / l at the precision the OUTPUT dtype deserves: bf16 outputs ride
    the fast reciprocal (1.5e-5 ≪ the bf16 rounding they're about to get);
    fp32 outputs keep the exact division (the repo's fp32-inputs-get-fp32-
    math parity convention, cf. RoPE2D)."""
    if jnp.dtype(out_dtype) == jnp.bfloat16:
        return (acc * _recip_fast(l)).astype(out_dtype)
    return (acc / l).astype(out_dtype)


def _interpret() -> bool:
    """Run the kernels in interpreter mode off-TPU (tests on CPU)."""
    return jax.default_backend() != "tpu"


def _ones_width(d: int) -> int:
    """Width of the ones block appended to v for the in-matmul row sum: pad
    the PV output up to the next 128-lane boundary (free MXU lanes at D=64;
    at most one extra output tile otherwise)."""
    return 128 - (d % 128) if d % 128 else 128


def _pick_block(s: int, max_block: int) -> int:
    """Largest block size dividing s, preferring multiples of 128 (full lane
    tiles), falling back to multiples of 8 (legal: the block's last dim is the
    full head_dim, so only sublane divisibility applies).  0 if none."""
    for step in (128, 8):
        best = 0
        b = step
        while b <= max_block:
            if s % b == 0:
                best = b
            b += step
        if best:
            return best
    return 0


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *refs,
                kv_steps: int, d: int, split: int = 1,
                want_lse: bool = True, bnhd: bool = False,
                kt: bool = False, ablate: str = ""):
    """Online-softmax forward step with the row-sum folded into the PV matmul.

    At D < 128 the PV contraction's output uses only D of the MXU's 128
    output lanes; extending v with a ones block (v_ext = [v | 1]) makes the
    idle lanes accumulate the softmax row-sum l for free, removing the
    serial VPU cross-lane sum pass.  acc and l then share one accumulator
    (columns [:d] and [d:]) and one alpha rescale.  p is materialized once,
    already in v.dtype (for bf16 inputs this halves the p tile traffic and
    drops the separate cast pass; l is then accumulated from the SAME p the
    PV matmul consumes, so o = (p@v)/(p@1) stays self-consistent).

    split > 1 processes the kv block as `split` sub-blocks with INDEPENDENT
    partial-softmax chains (local max per sub-block, exp2-weighted merge at
    the end) — the classic two-level flash merge.  The chains share no data
    until the merge, giving Mosaic's scheduler freedom to overlap sub-block
    j+1's QK matmul (MXU) with sub-block j's exp2 passes (VPU), which a
    single online chain serializes (m_new couples every element).

    kt=True: k arrives PRE-TRANSPOSED as (B, H, D, Skv) blocks — the QK dot
    contracts q's lanes against kT's SUBLANES, the MXU's natural operand
    order.  Measured r4 at the decoder shape (S=15360, (1024,3840)x2):
    10.71 vs 10.54 ms — NO win; Mosaic's minor-dim contraction does not pay
    a per-tile transpose worth killing.  Kept for layout flexibility (a
    caller that already has kT avoids one relayout).  The r4 attribution
    that settled the hunt: nosoftmax (matmuls only) = 10.27 ms, exactly the
    2-matmul MXU floor — at D=64 the PV's ones-extension makes PV cost the
    SAME MXU time as QK (full-depth contraction into ONE 128-lane output
    tile), so the kernel ceiling is ~95 TFLOP/s in useful flops, not the
    4/(2/95+2/190) ~ 127 a naive accounting suggests, and 90.5 measured is
    ~96% of it.

    `ablate` (diagnostics only, scripts/bench_flash_ablate.py — outputs are
    WRONG under any non-empty value): "nomax" pins every local max to 0.0
    (isolates the cross-lane max-reduce), "nosoftmax" also skips the exp2
    (p = raw scores cast — leaves just the two matmuls + merges), "nopv"
    zeroes acc_j instead of the PV matmul.  Buffer shapes, grid and DMA
    schedule stay identical so timing deltas isolate each stage.
    """
    kv = pl.program_id(3)
    if want_lse:
        lse_ref, m_scr, acc_scr = refs
    else:
        # inference drops the lse output: at S=768k (the 512-res 1000-view
        # pass) a (B, H, S, 1) fp32 output pads 128x in the lane dim —
        # 6.3 GB of HBM for a buffer nobody reads (caught on hardware, r3)
        m_scr, acc_scr = refs

    @pl.when(kv == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # bnhd=True: blocks are (1, bq, 1, D) slices of (B, S, H, D) arrays —
    # no host-side BHSD transpose (r3; saves 4 materialized (B,S,H,D)
    # copies per decoder layer), the grid's h axis striding the head dim
    # directly.  [0, :, 0] collapses the unit dims either way.
    q = q_ref[0, :, 0] if bnhd else q_ref[0, 0]  # (bq, D)
    if kt:
        bk = k_ref.shape[3]
    else:
        bk = k_ref.shape[1] if bnhd else k_ref.shape[2]
    sub = bk // split
    ones = jnp.ones((sub, _ones_width(d)), v_ref.dtype)

    # independent partial chains per sub-block (scores in the log2 domain)
    parts = []
    for j in range(split):
        if kt:
            k = k_ref[0, 0, :, j * sub:(j + 1) * sub]  # (D, sub)
            v = v_ref[0, 0, j * sub:(j + 1) * sub]
        elif bnhd:
            k = k_ref[0, j * sub:(j + 1) * sub, 0]
            v = v_ref[0, j * sub:(j + 1) * sub, 0]
        else:
            k = k_ref[0, 0, j * sub:(j + 1) * sub]
            v = v_ref[0, 0, j * sub:(j + 1) * sub]
        # q arrives PRE-SCALED by scale*log2(e) (wrapper): scores come off
        # the MXU already in the log2 domain, saving a full VPU multiply
        # pass over the (bq, sub) tile per kv step
        s = jax.lax.dot_general(
            q, k,
            (((1,), (0 if kt else 1,)), ((), ())),
            preferred_element_type=jnp.float32
        )  # (bq, sub) fp32, log2 domain
        if ablate in ("nomax", "nosoftmax"):
            m_j = jnp.zeros((s.shape[0], 1), jnp.float32)
        else:
            m_j = jnp.max(s, axis=-1, keepdims=True)
        if ablate == "nosoftmax":
            p = s.astype(v.dtype)
        else:
            p = jnp.exp2(s - m_j).astype(v.dtype)
        v_ext = jnp.concatenate([v, ones], axis=-1)
        if ablate == "nopv":
            acc_j = jnp.zeros((s.shape[0], d + _ones_width(d)), jnp.float32)
        else:
            acc_j = jax.lax.dot_general(
                p, v_ext, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        parts.append((m_j, acc_j))

    # merge the partials with the running state
    m_prev = m_scr[:, :1]                      # (bq, 1)
    m_new = m_prev
    for m_j, _ in parts:
        m_new = jnp.maximum(m_new, m_j)
    acc = acc_scr[:] * jnp.exp2(m_prev - m_new)
    for m_j, acc_j in parts:
        acc = acc + acc_j * jnp.exp2(m_j - m_new)
    acc_scr[:] = acc
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(kv == kv_steps - 1)
    def _finish():
        l = acc_scr[:, d:d + 1]
        o = _softmax_normalize(acc_scr[:, :d], l, o_ref.dtype)
        if bnhd:
            o_ref[0, :, 0] = o
        else:
            o_ref[0, 0] = o
        if want_lse:
            # natural-log lse at the interface
            lse = (m_scr[:, :1] + jnp.log2(l)) * LN2
            if bnhd:
                lse_ref[0, :, 0] = lse
            else:
                lse_ref[0, 0] = lse


def _fwd_single_kernel(q_ref, k_ref, v_ref, o_ref, *refs,
                       inner: int, hc: int, want_lse: bool = True):
    """Whole-sequence-in-VMEM variant for short sequences: each program owns
    a (bb, hc, S, D) block and runs the bb*hc independent head-attentions in
    an inner fori_loop over one reused score tile.  Motivation (r2
    measurement): at the encoder's (B=20, H=16, S=768) a one-head-per-program
    grid is 320 tiny programs whose per-program overhead made the kernel
    SLOWER than XLA's HBM-materializing attention (0.186 vs 0.146 s/stack);
    fat blocks with an inner loop amortize the overhead while the logits
    never leave VMEM (XLA's alternative writes 0.8 GB of fp32 logits per
    encoder layer — cost_analysis: 2.95 GB, 3.6 ms, HBM-bound)."""
    d = v_ref.shape[-1]

    def body(t, _):
        bi = t // hc
        hj = jax.lax.rem(t, hc)
        q = q_ref[bi, hj]  # (S, D)
        k = k_ref[bi, hj]
        v = v_ref[bi, hj]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (S, Skv), log2 domain (q pre-scaled by scale*log2e, wrapper)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m).astype(v.dtype)
        # row-sum on the MXU via the ones-extended v (_fwd_kernel docstring)
        v_ext = jnp.concatenate(
            [v, jnp.ones((v.shape[0], _ones_width(d)), v.dtype)], axis=-1)
        acc = jax.lax.dot_general(
            p, v_ext, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        l = acc[:, d:d + 1]
        o_ref[bi, hj] = _softmax_normalize(acc[:, :d], l, o_ref.dtype)
        if want_lse:
            refs[0][bi, hj] = (m + jnp.log2(l)) * LN2
        return 0

    jax.lax.fori_loop(0, inner, body, 0)


SINGLE_KERNEL_BUDGET = 5 * 1024 * 1024


def _pick_single_blocks(b: int, h: int, s: int, skv: int, d: int,
                        itemsize: int = 2, vmem_budget=SINGLE_KERNEL_BUDGET):
    """(bb, hc): divisors of (B, H) maximizing the per-program block under a
    VMEM budget covering the fp32 score tile + the input-dtype p tile
    (reused across the inner loop) and the double-buffered q/k/v/o tiles.
    itemsize: q/k/v dtype size (fp32 inputs double everything but the
    scores).

    The budget is deliberately ~1/3 of the 16 MB scoped-vmem limit: Mosaic's
    actual stack (dot intermediates, relayouts, both output buffers) runs
    well past the nominal tile accounting — an 8 MB-modeled config compiled
    to an 18 MB stack and OOM'd."""
    fixed = (4 * s * skv             # fp32 scores
             + itemsize * s * skv    # p in input dtype
             + 4 * s * 128           # fp32 acc (+l lanes)
             + itemsize * skv * 128)  # ones-extended v
    per = 2 * itemsize * (2 * s + 2 * skv) * d       # q/o + k/v, dbl-buffered
    best, best_sz = (0, 0), 0
    for hc in (x for x in range(1, h + 1) if h % x == 0):
        for bb in (x for x in range(1, b + 1) if b % x == 0):
            if fixed + per * bb * hc > vmem_budget:
                continue
            if bb * hc > best_sz:
                best_sz, best = bb * hc, (bb, hc)
    return best


def _flash_forward_single(q, k, v, scale, want_lse=True):
    """q must arrive PRE-SCALED by scale*log2(e) (see _flash_forward)."""
    B, H, S, D = q.shape
    Skv = k.shape[2]
    bb, hc = _pick_single_blocks(B, H, S, Skv, D, q.dtype.itemsize)
    out_specs = [pl.BlockSpec((bb, hc, S, D), lambda b, h: (b, h, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((B, H, S, D), q.dtype)]
    if want_lse:
        out_specs.append(pl.BlockSpec((bb, hc, S, 1), lambda b, h: (b, h, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, H, S, 1), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_fwd_single_kernel, inner=bb * hc,
                          hc=hc, want_lse=want_lse),
        grid=(B // bb, H // hc),
        in_specs=[
            pl.BlockSpec((bb, hc, S, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((bb, hc, Skv, D), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((bb, hc, Skv, D), lambda b, h: (b, h, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(q, k, v)
    return (outs[0], outs[1]) if want_lse else (outs[0], None)


def _flash_forward(q, k, v, scale, bq, bk,
                   split=None, want_lse=True,
                   bnhd=False, kt=False, ablate="",
                   vmem_limit_mb=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """split=None is the production auto mode: consider the whole-sequence
    single kernel first, then the tiled kernel with an auto-picked
    partial-softmax sub-chain count (a single chain at bk=3840 is a 15.7 MB
    fp32 score tile -> VMEM OOM).  An explicit split int forces the tiled
    kernel with exactly the caller's (bq, bk, split) — sweeps depend on
    this (an earlier auto-dispatch silently routed every swept config to
    the same single kernel)."""
    auto = split is None
    if auto:
        split = _pick_split(bk)
    else:
        # caller-supplied split (sweeps): a non-dividing split would silently
        # drop kv columns (the loop covers only split*(bk//split) of them)
        assert bk % split == 0 and (bk // split) % 8 == 0, (
            f"split={split} must divide bk={bk} into sublane-multiple "
            "sub-blocks")
    if bnhd:
        assert not kt, "kt is a BHSD-path option"
        B, S, H, D = q.shape
        Skv = k.shape[1]
    else:
        B, H, S, D = q.shape
        Skv = k.shape[3] if kt else k.shape[2]  # kt: k is (B, H, D, Skv)
    # pre-scale q by scale*log2(e): scores come off the MXU already in the
    # log2 domain, removing a VPU multiply pass over every score tile.  For
    # bf16 inputs this rounds q once more (~2^-9 relative on logits — the
    # same order as the bf16 input rounding itself); backward still
    # recomputes from the ORIGINAL q with the in-kernel multiply.
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    if (not bnhd and not kt and auto
            and _pick_single_blocks(B, H, S, Skv, D, q.dtype.itemsize)[0]):
        return _flash_forward_single(q, k, v, scale, want_lse=want_lse)
    grid = (B, H, S // bq, Skv // bk)

    if bnhd:
        q_spec = pl.BlockSpec((1, bq, 1, D), lambda b, h, qi, ki: (b, qi, h, 0))
        kv_spec = pl.BlockSpec((1, bk, 1, D), lambda b, h, qi, ki: (b, ki, h, 0))
        o_spec, o_shape = q_spec, jax.ShapeDtypeStruct((B, S, H, D), q.dtype)
        lse_spec = pl.BlockSpec((1, bq, 1, 1), lambda b, h, qi, ki: (b, qi, h, 0))
        lse_shape = jax.ShapeDtypeStruct((B, S, H, 1), jnp.float32)
    else:
        q_spec = pl.BlockSpec((1, 1, bq, D), lambda b, h, qi, ki: (b, h, qi, 0))
        kv_spec = pl.BlockSpec((1, 1, bk, D), lambda b, h, qi, ki: (b, h, ki, 0))
        o_spec, o_shape = q_spec, jax.ShapeDtypeStruct((B, H, S, D), q.dtype)
        lse_spec = pl.BlockSpec((1, 1, bq, 1), lambda b, h, qi, ki: (b, h, qi, 0))
        lse_shape = jax.ShapeDtypeStruct((B, H, S, 1), jnp.float32)
    k_spec = kv_spec
    if kt:
        k_spec = pl.BlockSpec((1, 1, D, bk), lambda b, h, qi, ki: (b, h, 0, ki))
    out_specs = [o_spec]
    out_shape = [o_shape]
    if want_lse:
        out_specs.append(lse_spec)
        out_shape.append(lse_shape)
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, kv_steps=Skv // bk,
                          d=D, split=split, want_lse=want_lse, bnhd=bnhd,
                          kt=kt, ablate=ablate),
        grid=grid,
        in_specs=[q_spec, k_spec, kv_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D + _ones_width(D)), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            **({"vmem_limit_bytes": vmem_limit_mb * 1024 * 1024}
               if vmem_limit_mb else {}),
        ),
        interpret=_interpret(),
    )(q, k, v)
    return (outs[0], outs[1]) if want_lse else (outs[0], None)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------
# Precision note (deliberate, r2): the forward's row-sum l — and hence the
# saved lse — is accumulated from the bf16-rounded p via the ones-extended PV
# matmul, while these kernels recompute p in fp32 from that lse: a ~2^-9
# relative forward/backward inconsistency that did not exist when l was summed
# from fp32 p.  o = (p@v)/(p@1) stays self-consistent in the forward and
# gradient error stays at bf16-noise level (tests/test_flash_attention.py
# gradient-parity tolerances) — do not "fix" one side without the other.

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   dq_scr, *, scale: float, kv_steps: int,
                   bnhd: bool = False):
    """q arrives PRE-SCALED by c = scale*log2(e) (wrapper): scores come off
    the MXU in the log2 domain, and the per-tile ds*scale multiply is
    deferred to the (bq, D) output write (ds = scale*ds0, dq = ds@k =
    scale*(ds0@k)) — two full-score-tile VPU passes removed per kv step."""
    kv = pl.program_id(3)

    @pl.when(kv == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    rd = (lambda r: r[0, :, 0]) if bnhd else (lambda r: r[0, 0])
    q = rd(q_ref)          # pre-scaled by c
    k = rd(k_ref)
    v = rd(v_ref)
    do = rd(do_ref)
    lse = rd(lse_ref)      # (bq, 1)
    delta = rd(delta_ref)  # (bq, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # log2 domain
    p = jnp.exp2(s - lse * LOG2E)  # (bq, bk); lse is natural-log

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bk)
    ds0 = p * (dp - delta)

    dq_scr[:] += jax.lax.dot_general(
        ds0.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kv == kv_steps - 1)
    def _finish():
        dq = (dq_scr[:] * scale).astype(dq_ref.dtype)
        if bnhd:
            dq_ref[0, :, 0] = dq
        else:
            dq_ref[0, 0] = dq


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr,
                    *, scale: float, q_steps: int, bnhd: bool = False):
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    rd = (lambda r: r[0, :, 0]) if bnhd else (lambda r: r[0, 0])
    q = rd(q_ref)  # pre-scaled by c = scale*log2(e) (_bwd_dq_kernel note)
    k = rd(k_ref)
    v = rd(v_ref)
    do = rd(do_ref)
    lse = rd(lse_ref)
    delta = rd(delta_ref)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # log2 domain
    p = jnp.exp2(s - lse * LOG2E)  # (bq, bk); lse is natural-log

    # dv += p^T @ do
    dv_scr[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds0 = p * (dp - delta)  # (bq, bk); true ds = scale * ds0
    # dk += ds^T @ q = scale * ds0^T @ (q'/c) = LN2 * (ds0^T @ q')
    dk_scr[:] += jax.lax.dot_general(
        ds0.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == q_steps - 1)
    def _finish():
        dk = (dk_scr[:] * LN2).astype(dk_ref.dtype)
        dv = dv_scr[:].astype(dv_ref.dtype)
        if bnhd:
            dk_ref[0, :, 0] = dk
            dv_ref[0, :, 0] = dv
        else:
            dk_ref[0, 0] = dk
            dv_ref[0, 0] = dv


def _flash_backward(q, k, v, o, lse, do, scale, bq, bk, dlse=None,
                    bnhd=False):
    """Flash attention backward.

    dlse: optional (B, H, S, 1) fp32 cotangent of the returned logsumexp —
    used by ring attention, whose partial-merge weights depend on lse.  The
    math folds into delta: ds = p*(dp - delta) + p*dlse = p*(dp - (delta -
    dlse)), so the kernels are unchanged.
    """
    if bnhd:
        B, S, H, D = q.shape
        Skv = k.shape[1]
    else:
        B, H, S, D = q.shape
        Skv = k.shape[2]
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
                    keepdims=True)  # (..., 1), layout of q
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)
    # pre-scale q into the log2 domain (kernel docstrings); the deferred
    # scale/LN2 factors are applied at the kernels' output writes
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)

    if bnhd:
        def _q4(d_):
            return pl.BlockSpec((1, bq, 1, d_),
                                lambda b, h, qi, ki: (b, qi, h, 0))
        def _k4(d_):
            return pl.BlockSpec((1, bk, 1, d_),
                                lambda b, h, qi, ki: (b, ki, h, 0))
        def _q4r(d_):
            return pl.BlockSpec((1, bq, 1, d_),
                                lambda b, h, ki, qi: (b, qi, h, 0))
        def _k4r(d_):
            return pl.BlockSpec((1, bk, 1, d_),
                                lambda b, h, ki, qi: (b, ki, h, 0))
        dq_shape = jax.ShapeDtypeStruct((B, S, H, D), q.dtype)
        dkv_shapes = [jax.ShapeDtypeStruct((B, Skv, H, D), k.dtype),
                      jax.ShapeDtypeStruct((B, Skv, H, D), v.dtype)]
    else:
        def _q4(d_):
            return pl.BlockSpec((1, 1, bq, d_),
                                lambda b, h, qi, ki: (b, h, qi, 0))
        def _k4(d_):
            return pl.BlockSpec((1, 1, bk, d_),
                                lambda b, h, qi, ki: (b, h, ki, 0))
        def _q4r(d_):
            return pl.BlockSpec((1, 1, bq, d_),
                                lambda b, h, ki, qi: (b, h, qi, 0))
        def _k4r(d_):
            return pl.BlockSpec((1, 1, bk, d_),
                                lambda b, h, ki, qi: (b, h, ki, 0))
        dq_shape = jax.ShapeDtypeStruct((B, H, S, D), q.dtype)
        dkv_shapes = [jax.ShapeDtypeStruct((B, H, Skv, D), k.dtype),
                      jax.ShapeDtypeStruct((B, H, Skv, D), v.dtype)]

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_steps=Skv // bk,
                          bnhd=bnhd),
        grid=(B, H, S // bq, Skv // bk),
        in_specs=[
            _q4(D), _k4(D), _k4(D), _q4(D), _q4(1), _q4(1),
        ],
        out_specs=_q4(D),
        out_shape=dq_shape,
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, q_steps=S // bq,
                          bnhd=bnhd),
        grid=(B, H, Skv // bk, S // bq),
        in_specs=[
            _q4r(D), _k4r(D), _k4r(D), _q4r(D), _q4r(1), _q4r(1),
        ],
        out_specs=[_k4r(D), _k4r(D)],
        out_shape=dkv_shapes,
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public op (B, N, H, D) with custom vjp
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_bhsd(q, k, v, scale):
    bq = _pick_block(q.shape[2], MAX_BLOCK_Q)
    bk = _pick_block(k.shape[2], MAX_BLOCK_KV)
    # primal (no-grad) path: skip the lse output entirely (want_lse
    # docstring in _fwd_kernel) — under jax.grad the vjp fwd below runs
    # instead and keeps it
    o, _ = _flash_forward(q, k, v, scale, bq, bk, want_lse=False)
    return o


def _flash_bhsd_fwd(q, k, v, scale):
    bq = _pick_block(q.shape[2], MAX_BLOCK_Q)
    bk = _pick_block(k.shape[2], MAX_BLOCK_KV)
    o, lse = _flash_forward(q, k, v, scale, bq, bk)
    return o, (q, k, v, o, lse)


def _flash_bhsd_bwd(scale, res, do):
    q, k, v, o, lse = res
    bq = _pick_block(q.shape[2], MAX_BLOCK_Q_BWD)
    bk = _pick_block(k.shape[2], MAX_BLOCK_KV_BWD)
    return _flash_backward(q, k, v, o, lse, do, scale, bq, bk)


_flash_bhsd.defvjp(_flash_bhsd_fwd, _flash_bhsd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_bnhd(q, k, v, scale):
    """BNHD-native flash: kernels block the head axis directly out of
    (B, S, H, D) arrays — zero layout copies around the op (r3; the previous
    swapaxes wrapper materialized 4 full (B,S,H,D) transposes per forward
    and 7 more across the backward)."""
    bq = _pick_block(q.shape[1], MAX_BLOCK_Q)
    bk = _pick_block(k.shape[1], MAX_BLOCK_KV)
    o, _ = _flash_forward(q, k, v, scale, bq, bk, want_lse=False, bnhd=True)
    return o


def _flash_bnhd_fwd(q, k, v, scale):
    bq = _pick_block(q.shape[1], MAX_BLOCK_Q)
    bk = _pick_block(k.shape[1], MAX_BLOCK_KV)
    o, lse = _flash_forward(q, k, v, scale, bq, bk, bnhd=True)
    return o, (q, k, v, o, lse)


def _flash_bnhd_bwd(scale, res, do):
    q, k, v, o, lse = res
    bq = _pick_block(q.shape[1], MAX_BLOCK_Q_BWD)
    bk = _pick_block(k.shape[1], MAX_BLOCK_KV_BWD)
    return _flash_backward(q, k, v, o, lse, do, scale, bq, bk, bnhd=True)


_flash_bnhd.defvjp(_flash_bnhd_fwd, _flash_bnhd_bwd)


# ---------------------------------------------------------------------------
# packed (B, N, C) head-group forward — zero-relayout decoder road (r5)
# ---------------------------------------------------------------------------
# The fused decoder block's qkv kernel (nn/fused_block.ln_qkv) emits q/k/v as
# (M, C) arrays with each head's D lanes packed side by side — exactly the
# layout the out-projection consumes again after attention, and a free
# reshape of the (B, N, H, D) interface layout.  The BHSD wrapper therefore
# paid 4 materialized (B, S, H, D) <-> (B, H, S, D) XLA transposes per
# decoder layer (~63 MB of HBM r+w each at the 20-view headline shape,
# ~8 ms/forward over 24 layers).  This kernel blocks the C axis in 128-lane
# GROUPS straight out of the packed layout — a group holds 128/D whole heads
# (2 at D=64; manual lane slices inside a 128-lane tile are the safe subset:
# the encoder's packed kernel uses the same 64-offset slices, while >=512-
# lane offsets miscompile, ops/batched_attention.py _pick_gv notes) — so no
# relayout ever materializes.  Per-head math is identical to _fwd_kernel
# (log2-domain prescaled q, SPLIT partial-softmax sub-chains, ones-extended-v
# MXU row sum); the group's heads share no state, which also hands Mosaic a
# second independent MXU/VPU stream to overlap softmax exposure with.

def _fwd_kernel_packed(q_ref, k_ref, v_ref, o_ref, *refs,
                       kv_steps: int, d: int, hpd: int, split: int,
                       want_lse: bool = False):
    """One program = one (q block, 128-lane head group); grid kv innermost.

    Scratch: m_scr (bq, hpd*128) running max, head h broadcast over lanes
    [h*128, (h+1)*128); acc_scr (bq, hpd*128) fp32 accumulator, head h's
    [p@v | row-sum] in lanes [h*aw, h*aw+aw) with aw = d + _ones_width(d)
    (= 128 for every d < 128, so segments stay lane-aligned).

    want_lse: also emit natural-log logsumexp as (1, 1, bq, hpd) blocks of a
    (B, HP, N, hpd) array — the packed backward kernels read the same
    layout, so training never leaves the packed world either."""
    kv = pl.program_id(3)
    if want_lse:
        lse_ref, m_scr, acc_scr = refs
    else:
        m_scr, acc_scr = refs

    @pl.when(kv == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    bk = k_ref.shape[1]
    sub = bk // split
    aw = d + _ones_width(d)
    ones = jnp.ones((sub, _ones_width(d)), v_ref.dtype)
    qp = q_ref[0]  # (bq, hpd*d), pre-scaled by scale*log2(e)

    for h in range(hpd):
        qh = qp[:, h * d:(h + 1) * d]
        parts = []
        for j in range(split):
            kh = k_ref[0, j * sub:(j + 1) * sub, h * d:(h + 1) * d]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bq, sub) fp32, log2 domain
            m_j = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s - m_j).astype(v_ref.dtype)
            vh = v_ref[0, j * sub:(j + 1) * sub, h * d:(h + 1) * d]
            v_ext = jnp.concatenate([vh, ones], axis=-1)
            acc_j = jax.lax.dot_general(
                p, v_ext, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bq, aw): [:, :d] = p@v, [:, d:] = row-sum replicated
            parts.append((m_j, acc_j))

        m_prev = m_scr[:, h * 128:h * 128 + 1]
        m_new = m_prev
        for m_j, _ in parts:
            m_new = jnp.maximum(m_new, m_j)
        acc = acc_scr[:, h * aw:(h + 1) * aw] * jnp.exp2(m_prev - m_new)
        for m_j, acc_j in parts:
            acc = acc + acc_j * jnp.exp2(m_j - m_new)
        acc_scr[:, h * aw:(h + 1) * aw] = acc
        m_scr[:, h * 128:(h + 1) * 128] = jnp.broadcast_to(
            m_new, (m_new.shape[0], 128))

    @pl.when(kv == kv_steps - 1)
    def _finish():
        outs = []
        lses = []
        for h in range(hpd):
            a = acc_scr[:, h * aw:(h + 1) * aw]
            outs.append(
                _softmax_normalize(a[:, :d], a[:, d:d + 1], o_ref.dtype))
            if want_lse:
                lses.append((m_scr[:, h * 128:h * 128 + 1]
                             + jnp.log2(a[:, d:d + 1])) * LN2)
        o_ref[0] = jnp.concatenate(outs, axis=-1)
        if want_lse:
            lse_ref[0, 0] = jnp.concatenate(lses, axis=-1)


def _flash_forward_packed(q, k, v, scale, bq, bk, d, split=None,
                          want_lse=False):
    """Forward over packed (B, N, C) q/k/v (heads along lanes); (B, N, C) out.

    want_lse=False is the inference/primal path; with want_lse the kernel
    also returns natural-log lse as (B, HP, N, hpd) fp32 for the packed
    backward kernels."""
    B, N, C = q.shape
    Skv = k.shape[1]
    if split is None:
        split = _pick_split(bk, MAX_SUB_KV_PACKED)
    hpd = 128 // d
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    q_spec = pl.BlockSpec((1, bq, 128), lambda b, hp, qi, ki: (b, qi, hp))
    kv_spec = pl.BlockSpec((1, bk, 128), lambda b, hp, qi, ki: (b, ki, hp))
    out_specs = [q_spec]
    out_shape = [jax.ShapeDtypeStruct((B, N, C), q.dtype)]
    if want_lse:
        out_specs.append(pl.BlockSpec(
            (1, 1, bq, hpd), lambda b, hp, qi, ki: (b, hp, qi, 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((B, C // 128, N, hpd), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel_packed, kv_steps=Skv // bk, d=d,
                          hpd=hpd, split=split, want_lse=want_lse),
        grid=(B, C // 128, N // bq, Skv // bk),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=out_specs if want_lse else q_spec,
        out_shape=out_shape if want_lse else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((bq, hpd * 128), jnp.float32),
            pltpu.VMEM((bq, hpd * (d + _ones_width(d))), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(q, k, v)
    return outs if want_lse else (outs, None)


def _to_bhsd(t, d):
    B, N, C = t.shape
    return jnp.swapaxes(t.reshape(B, N, C // d, d), 1, 2)


def _to_packed(t):
    B, H, S, D = t.shape
    return jnp.swapaxes(t, 1, 2).reshape(B, S, H * D)


def _bwd_dq_kernel_packed(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dq_ref, dq_scr, *, scale: float, kv_steps: int,
                          d: int, hpd: int):
    """Packed-layout mirror of _bwd_dq_kernel: one program per (q block,
    128-lane head group), per-head 64-offset lane slices, dq assembled back
    into the (B, N, C) layout.  q arrives pre-scaled by scale*log2(e); the
    per-tile ds*scale multiply is deferred to the output write."""
    kv = pl.program_id(3)

    @pl.when(kv == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    qp = q_ref[0]
    dop = do_ref[0]
    for h in range(hpd):
        q = qp[:, h * d:(h + 1) * d]
        k = k_ref[0, :, h * d:(h + 1) * d]
        v = v_ref[0, :, h * d:(h + 1) * d]
        do = dop[:, h * d:(h + 1) * d]
        lse = lse_ref[0, 0, :, h:h + 1]      # (bq, 1), natural log
        delta = delta_ref[0, 0, :, h:h + 1]  # (bq, 1)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # log2 domain
        p = jnp.exp2(s - lse * LOG2E)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds0 = p * (dp - delta)
        dq_scr[:, h * d:(h + 1) * d] += jax.lax.dot_general(
            ds0.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kv == kv_steps - 1)
    def _finish():
        dq_ref[0] = (dq_scr[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel_packed(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                           dk_ref, dv_ref, dk_scr, dv_scr,
                           *, scale: float, q_steps: int, d: int, hpd: int):
    """Packed-layout mirror of _bwd_dkv_kernel (see _bwd_dq_kernel_packed)."""
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    qp = q_ref[0]
    dop = do_ref[0]
    for h in range(hpd):
        q = qp[:, h * d:(h + 1) * d]
        k = k_ref[0, :, h * d:(h + 1) * d]
        v = v_ref[0, :, h * d:(h + 1) * d]
        do = dop[:, h * d:(h + 1) * d]
        lse = lse_ref[0, 0, :, h:h + 1]
        delta = delta_ref[0, 0, :, h:h + 1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # log2 domain
        p = jnp.exp2(s - lse * LOG2E)
        dv_scr[:, h * d:(h + 1) * d] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds0 = p * (dp - delta)  # true ds = scale * ds0
        dk_scr[:, h * d:(h + 1) * d] += jax.lax.dot_general(
            ds0.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(qi == q_steps - 1)
    def _finish():
        dk_ref[0] = (dk_scr[:] * LN2).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_backward_packed(q, k, v, o, lse, do, scale, bq, bk, d):
    """Backward over packed (B, N, C) tensors; lse is (B, HP, N, hpd) from
    the packed forward.  Same recurrences and precision contract as
    _flash_backward (fp32 p recomputed from the bf16-accumulated lse)."""
    B, N, C = q.shape
    Skv = k.shape[1]
    hpd = 128 // d
    hp = C // 128
    # delta = rowsum(do * o) per head, laid out (B, HP, N, hpd) like lse
    delta = jnp.sum(
        (do.astype(jnp.float32) * o.astype(jnp.float32))
        .reshape(B, N, hp, hpd, d), axis=-1).transpose(0, 2, 1, 3)
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)

    q_spec = pl.BlockSpec((1, bq, 128), lambda b, h, qi, ki: (b, qi, h))
    kv_spec = pl.BlockSpec((1, bk, 128), lambda b, h, qi, ki: (b, ki, h))
    row_spec = pl.BlockSpec((1, 1, bq, hpd), lambda b, h, qi, ki: (b, h, qi, 0))
    qr_spec = pl.BlockSpec((1, bq, 128), lambda b, h, ki, qi: (b, qi, h))
    kvr_spec = pl.BlockSpec((1, bk, 128), lambda b, h, ki, qi: (b, ki, h))
    rowr_spec = pl.BlockSpec((1, 1, bq, hpd),
                             lambda b, h, ki, qi: (b, h, qi, 0))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_packed, scale=scale,
                          kv_steps=Skv // bk, d=d, hpd=hpd),
        grid=(B, C // 128, N // bq, Skv // bk),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_packed, scale=scale,
                          q_steps=N // bq, d=d, hpd=hpd),
        grid=(B, C // 128, Skv // bk, N // bq),
        in_specs=[qr_spec, kvr_spec, kvr_spec, qr_spec, rowr_spec, rowr_spec],
        out_specs=[kvr_spec, kvr_spec],
        out_shape=[jax.ShapeDtypeStruct((B, Skv, C), k.dtype),
                   jax.ShapeDtypeStruct((B, Skv, C), v.dtype)],
        scratch_shapes=[
            pltpu.VMEM((bk, 128), jnp.float32),
            pltpu.VMEM((bk, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_packed(q, k, v, scale, d):
    B, N, C = q.shape
    bq = _pick_block(N, MAX_BLOCK_Q)
    bk = _pick_block(k.shape[1], MAX_BLOCK_KV_PACKED)
    o, _ = _flash_forward_packed(q, k, v, scale, bq, bk, d)
    return o


def _flash_packed_fwd(q, k, v, scale, d):
    # training stays in the packed world end to end (r5): the lse-emitting
    # packed forward + packed backward kernels — no BHSD transposes anywhere
    bq = _pick_block(q.shape[1], MAX_BLOCK_Q)
    bk = _pick_block(k.shape[1], MAX_BLOCK_KV_PACKED)
    o, lse = _flash_forward_packed(q, k, v, scale, bq, bk, d, want_lse=True)
    return o, (q, k, v, o, lse)


def _flash_packed_bwd(scale, d, res, do):
    q, k, v, o, lse = res
    bq = _pick_block(q.shape[1], MAX_BLOCK_Q_BWD)
    bk = _pick_block(k.shape[1], MAX_BLOCK_KV_BWD)
    return _flash_backward_packed(q, k, v, o, lse, do, scale, bq, bk, d)


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


def packed_flash_supported(q_shape, k_shape, itemsize: int = 2) -> bool:
    """(B, N, H, D) shapes the packed head-group road takes: whole heads per
    128-lane group, tileable blocks, and NOT the short-sequence regime where
    the whole-sequence single kernel wins (that path amortizes per-program
    overhead across many heads; the packed kernel would pay it per tile)."""
    B, N, H, D = q_shape
    Skv = k_shape[1]
    return (
        128 % D == 0
        and (H * D) % 128 == 0
        and _pick_block(N, MAX_BLOCK_Q) > 0
        and _pick_block(Skv, MAX_BLOCK_KV_PACKED) > 0
        and not _pick_single_blocks(B, H, N, Skv, D, itemsize)[0]
    )


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float) -> jnp.ndarray:
    """Flash attention over (B, N, H, D) inputs (fast3r_tpu layout).

    Falls back to the naive path when N is not a multiple of 128 (tiny tests).
    All supported shapes go through the BHSD transpose wrapper: Mosaic
    requires the last two BLOCK dims to be (8, 128)-divisible or equal to the
    array dims, so per-head blocks of a (B, S, H, D) array — H blocked to 1
    in the second-minor slot — do not lower (caught on hardware, r3; the
    `bnhd=True` kernel paths remain for interpreter-mode use and as the base
    of a future head-folded variant)."""
    S, Skv = q.shape[1], k.shape[1]
    if _pick_block(S, MAX_BLOCK_Q) == 0 or _pick_block(Skv, MAX_BLOCK_KV) == 0:
        from fast3r_tpu.ops.attention import dot_product_attention

        return dot_product_attention(q, k, v, scale, impl="naive")
    B, N, H, D = q.shape
    if packed_flash_supported(q.shape, k.shape, q.dtype.itemsize):
        # zero-relayout road: (B, N, H, D) -> (B, N, C) is a FREE reshape
        # (heads are already lane-adjacent), and the producing qkv kernel /
        # consuming projection use that exact layout — XLA cancels the
        # reshapes end to end, so no transpose ever materializes
        o = _flash_packed(q.reshape(B, N, H * D), k.reshape(B, Skv, H * D),
                          v.reshape(B, Skv, H * D), float(scale), D)
        return o.reshape(B, N, H, D)
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    o = _flash_bhsd(qt, kt, vt, float(scale))
    return jnp.swapaxes(o, 1, 2)
