"""Fused ViT-block kernels: LayerNorm / bias / GELU / residual folded into the
matmuls' HBM pass.

Motivation (BENCHMARKS.md "Known headroom"): the encoder runs at 0.141 s for
20 views vs an ~0.075 s matmul+attention floor, and the decoder carries
~0.1 s of non-attention time — both gaps are HBM-side elementwise passes
between MXU calls (LN materializations, GELU, residual adds, qkv reshapes).
XLA cannot fuse an elementwise producer INTO a dot operand (dot inputs are
materialized), so every pre-LN and every GELU costs a full activation
round-trip.  These kernels keep the weight matrix resident in VMEM (its block
index is constant across the token grid), stream token tiles, and do the
normalization / activation / residual arithmetic in VMEM between the HBM read
and the MXU call:

  ln_matmul          y = act(LN(x) @ W + b)          (pre-LN -> projection)
  ln_qkv             q, k, v = split(LN(x) @ Wqkv + b)  (three outputs, no
                     (M, 3C) intermediate in HBM)
  matmul_residual    y = r + x @ W + b               (proj / fc2 epilogue)

`fused_vit_block` composes them into the pre-LN ViT block of
fast3r/croco/models/blocks.py:197-239 with a block-level custom VJP whose
backward recomputes through the plain (unfused) composition — gradient
numerics identical to nn/layers.vit_block, and the recompute mirrors the
jax.checkpoint policy the training step already uses.

LayerNorm statistics are two-pass fp32 (bit-comparable to ops/fused_layernorm
and the reference's fp32-autocast LN); GELU is the exact erf formulation
(torch nn.GELU default); matmuls accumulate fp32 on the MXU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fast3r_tpu.nn import layers as _layers

# Live-set ceiling for the resident-weight kernels (v5e physical VMEM is
# 128 MiB; pallas calls that can exceed the ~16 MiB default scoped limit
# pass VMEM_LIMIT_MB explicitly).  r4: raised from 12 MiB — the 12 MiB
# budget capped row tiles at bm=128 for the fc1 shape (48 for fc2), leaving
# the matmuls at 114 TFLOP/s; measured sweep (scripts/bench_fused_linears.py)
# puts bm=512-768 at 120-168 TFLOP/s (within-run orderings; run-to-run
# medians swing ~10%).
VMEM_BUDGET = 64 * 1024 * 1024
VMEM_LIMIT_MB = 100
# Preferred row-tile size by shape (measured, bench_fused_linears.py):
# wide projections (n > 3k, the fc1 GELU shape) peak at 512; everything else
# (qkv, fc2, proj) at 768.
def _bm_target(k: int, n: int) -> int:
    return 512 if n > 3 * k else 768


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Whole-MLP fusion (see _fused_block_impl): the (M, hidden) GELU activation
# never touches HBM and the MLP transient caps at one row tile.  Default ON
# since r5: with the fast-reciprocal GELU the in-tile fc1 -> fc2 chain now
# BEATS the two-kernel road at the headline shape (bench.py A/B under the
# honest all-outputs checksum: fused 46.52 vs two-kernel 45.97 img/s —
# the r4 measurement that left it off was taken with the exact-division
# GELU, whose VPU stall serialized the in-tile chain).  Set False to get
# the two-kernel pipeline back for A/Bs.
PREFER_FUSED_MLP = True

def _cparams():
    return pltpu.CompilerParams(
        vmem_limit_bytes=VMEM_LIMIT_MB * 1024 * 1024)



def _erf(x):
    """fp32 erf for the in-kernel exact GELU — Mosaic has no erf/erfc
    lowering (NotImplementedError: erfc).  Abramowitz & Stegun 7.1.26
    (max abs error 1.5e-7 with an exact division), with the t-substitution
    division replaced by the VPU's approximate reciprocal + one Newton step
    (_recip_fast, r5): dt/t ~1.5e-5 -> d(erf) <~ 1.5e-5 * exp(-z^2), still
    far below the bf16 output ulp and the fp32 golden-test tolerances.  The
    exact division stalled the VPU enough that GELU cost 0.115 ms per fc1
    row-pass on top of the matmul; with the fast reciprocal the whole
    activation hides under the MXU (scripts/bench_fused_linears.py r5
    ladder: act=gelu 1.079 ms / gelu_recip 0.877 / act=none 0.964 at the
    (15360, 1024, 4096) fc1 shape, bm=512)."""
    sign = jnp.sign(x)
    z = jnp.abs(x)
    t = _recip_fast(1.0 + 0.3275911 * z)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-z * z))


def _gelu_exact(x):
    """x * Phi(x) with the erf formulation (torch nn.GELU default)."""
    return x * 0.5 * (1.0 + _erf(x * 0.7071067811865476))


def _recip_fast(a):
    """fp32 reciprocal via the VPU's approximate-reciprocal + one Newton
    step (r * (2 - a*r)): relative error ~(2^-8)^2 = 1.5e-5, vs the exact
    division's multi-op lowering.  Pallas-only (pl.reciprocal); interpret
    mode (CPU tests) keeps the exact division — reciprocal_p has no
    jit/grad-context eval rule in this jax version, and the CPU goldens
    should exercise exact math anyway (TPU parity covered on hardware)."""
    if _interpret():
        return 1.0 / a
    r = pl.reciprocal(a, approx=True)
    return r * (2.0 - a * r)


# Power-basis coefficients of the degree-7 Chebyshev fit of
# q(z) = log(0.5 * erfc(z)) on z in [0, 5.9] (max |dq| = 1.0e-4, i.e. the
# RELATIVE error of exp(q) — 1/40 of a bf16 ulp; fit recipe in the r5 dev
# notes).  The -z^2 tail behaviour is inside the polynomial, so one exp and
# no division reproduces erfc's exponentially small tail to bf16 exactness.
_LOGW_COEFS = (
    -0.6932386656382212, -1.12740659844404, -0.6387020988562326,
    -0.10218836353356493, 0.021548640532825746, -0.0030444244221412304,
    0.00025187827124418345, -9.118356423410375e-06,
)


def _gelu_logw(x):
    """Exact-class GELU with ONE transcendental and NO division:
    0.5*erfc(z) = exp(poly(z)); gelu = x * (x>0 ? 1-c : c).  Max relative
    error vs the erf formulation 9.1e-5 (fp32-validated over [-16, 16]) —
    well inside the bf16 output rounding the fused kernels already carry."""
    z = jnp.minimum(jnp.abs(x) * 0.7071067811865476, 5.9)
    q = jnp.float32(_LOGW_COEFS[-1])
    for c in _LOGW_COEFS[-2::-1]:
        q = q * z + jnp.float32(c)
    c = jnp.exp(q)
    return x * jnp.where(x > 0, 1.0 - c, c)


def _gelu_div(x):
    """The pre-r5 GELU with an EXACT division in the A&S t-substitution —
    kept as the A/B reference probe for scripts/bench_fused_linears.py
    (the division stalls the VPU: 1.079 vs 0.877 ms at the fc1 shape)."""
    xs = x * 0.7071067811865476
    sign = jnp.sign(xs)
    z = jnp.abs(xs)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    e = sign * (1.0 - poly * jnp.exp(-z * z))
    return x * 0.5 * (1.0 + e)


def _gelu_sig(x):
    """Logistic-fit GELU floor probe (x * sigmoid(1.5976x + 0.07056x^3),
    max abs err 3.8e-4 — NOT reference-exact in the negative tail; used
    only to measure the VPU-cost floor of the activation, never shipped."""
    t = x * (1.5976 + 0.07056 * x * x)
    return x * _recip_fast(1.0 + jnp.exp(-t))


_GELU_VARIANTS = {
    "gelu": _gelu_exact,       # shipped: A&S erf with _recip_fast (r5)
    "gelu_div": _gelu_div,     # pre-r5 exact-division A/B reference
    "gelu_logw": _gelu_logw,
    "gelu_recip": _gelu_exact,  # alias — "gelu" IS the recip variant now
    "gelu_sig": _gelu_sig,
}


def _silu(z, out_dtype):
    """z * sigmoid(z) at the precision the output dtype deserves: bf16
    outputs ride the fast reciprocal (same pattern as the GELU above);
    fp32 outputs keep the exact sigmoid."""
    if jnp.dtype(out_dtype) == jnp.bfloat16:
        return z * _recip_fast(1.0 + jnp.exp(-z))
    return z * jax.nn.sigmoid(z)


_INV_SQRT_2PI = 0.3989422804014327


def _gelu_grad(z):
    """d/dz [z * Phi(z)] = Phi(z) + z * phi(z).  This runs in the PURE-XLA
    backward (_ln_backward_xla), never inside a pallas kernel, so it uses
    XLA's native erf (exact — and pl.reciprocal, which _erf now rides,
    has no lowering outside Mosaic)."""
    cdf = 0.5 * (1.0 + jax.lax.erf(z * 0.7071067811865476))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * z * z)
    return cdf + z * pdf


def _ln_f32(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    return y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)


def _rms_f32(x, gamma, eps):
    """RMSNorm matching llama_decoder.rmsnorm bit-for-bit: fp32 statistics,
    cast to x.dtype BEFORE the gamma multiply (the reference's cast order)."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return y.astype(x.dtype) * gamma.astype(x.dtype)


def _pick_bm(m: int, k: int, n: int, w_bytes: int, itemsize: int,
             extra_row_bytes: int = 0) -> int:
    """Rows per program such that W (resident) + double-buffered x/out tiles +
    fp32 LN intermediates stay inside the VMEM budget.  `extra_row_bytes`
    models additional per-row streamed inputs (the rope tables of
    ln_qkv_rope: 2 double-buffered (bm, k) tiles).  Prefers the largest tile
    at or below the measured per-shape optimum (_bm_target); beyond it the
    rate falls again (fc1 sweep: 512 > 768 > 960 > 1536)."""
    target = _bm_target(k, n)
    fits = []
    bm = 8
    while bm <= 1024:
        if m % bm == 0:
            need = (w_bytes + 2 * bm * k * itemsize + 2 * bm * n * itemsize
                    + 3 * bm * k * 4 + bm * extra_row_bytes)
            if need <= VMEM_BUDGET:
                fits.append(bm)
        bm += 8
    if not fits:
        return 0
    below = [b for b in fits if b <= target]
    return max(below) if below else min(fits)


def _pick_bm_replay(m: int, k: int, n: int, w_bytes: int,
                    itemsize: int) -> int:
    """Row tile for the residual-emitting REPLAY kernels (training backward
    path): the forward streams plus the extra u / z / stat output tiles.
    Capped at 512 rows — the replay's live set is ~2x the plain forward's
    (u/z/stat output tiles), so the measured forward optima don't transfer
    and the conservative tile keeps Mosaic's scoped stack well inside the
    limit."""
    fits = []
    bm = 8
    while bm <= 1024:
        if m % bm == 0:
            need = (w_bytes
                    + 2 * itemsize * bm * (2 * k + 2 * n)   # x,u in/out + y,z
                    + 3 * bm * k * 4)                       # fp32 LN live set
            if need <= VMEM_BUDGET:
                fits.append(bm)
        bm += 8
    if not fits:
        return 0
    below = [b for b in fits if b <= 512]
    return max(below) if below else min(fits)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _ln_matmul_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref,
                      *, eps: float, act: Optional[str]):
    y = _ln_f32(x_ref[:], g_ref[:], b_ref[:], eps).astype(x_ref.dtype)
    out = jax.lax.dot_general(
        y, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:].astype(jnp.float32)
    if act is not None:
        out = _GELU_VARIANTS[act](out)
    o_ref[:] = out.astype(o_ref.dtype)


def _ln_qkv_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref,
                   q_ref, k_ref, v_ref, *, eps: float, c: int):
    y = _ln_f32(x_ref[:], g_ref[:], b_ref[:], eps).astype(x_ref.dtype)
    out = jax.lax.dot_general(
        y, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:].astype(jnp.float32)
    q_ref[:] = out[:, :c].astype(q_ref.dtype)
    k_ref[:] = out[:, c:2 * c].astype(k_ref.dtype)
    v_ref[:] = out[:, 2 * c:].astype(v_ref.dtype)


def _rms_matmul_kernel(x_ref, g_ref, w_ref, o_ref, *, eps: float,
                       act: Optional[str]):
    y = _rms_f32(x_ref[:], g_ref[:], eps)
    out = jax.lax.dot_general(
        y, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if act == "silu":
        out = _silu(out, o_ref.dtype)
    o_ref[:] = out.astype(o_ref.dtype)


def _rms_qkv3_kernel(x_ref, g_ref, wq_ref, wk_ref, wv_ref,
                     q_ref, k_ref, v_ref, *, eps: float):
    y = _rms_f32(x_ref[:], g_ref[:], eps)
    for w_ref, o_ref in ((wq_ref, q_ref), (wk_ref, k_ref), (wv_ref, v_ref)):
        o_ref[:] = jax.lax.dot_general(
            y, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _matmul_res_kernel(x_ref, w_ref, bias_ref, r_ref, o_ref):
    out = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:].astype(jnp.float32)
    o_ref[:] = (r_ref[:].astype(jnp.float32) + out).astype(o_ref.dtype)


def _ln_mlp_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   o_ref, *, eps: float):
    """Whole pre-LN MLP sublayer per row tile: y = x + GELU(LN(x)W1+b1)W2+b2.

    Fusing fc1 -> gelu -> fc2 keeps the (bm, hidden) activation in VMEM —
    the two-kernel road writes the full (M, hidden) GELU output to HBM and
    immediately re-reads it (252 MB per layer at the headline M=15360,
    6.3 GB at the 1000-view 512-res shape — the transient that forces the
    staged pass to spill decoder hooks to host)."""
    u = _ln_f32(x_ref[:], g_ref[:], b_ref[:], eps).astype(x_ref.dtype)
    z = jax.lax.dot_general(
        u, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)
    h = _gelu_exact(z).astype(x_ref.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:].astype(jnp.float32)
    o_ref[:] = (x_ref[:].astype(jnp.float32) + y).astype(o_ref.dtype)


def _ln_matmul_replay_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref,
                             o_ref, u_ref, mean_ref, rstd_ref, *refs,
                             eps: float, act: Optional[str]):
    """Forward replay for the training backward: same math as
    _ln_matmul_kernel, additionally EMITTING the intermediates the backward
    needs (u = LN output, per-row mean/rstd, and pre-activation z when an
    activation is set).  Emitting them from inside the kernel costs one HBM
    write each — the r3 first-cut fused backward kernel instead RECOMPUTED
    z with W resident at bm~32 row tiles and measured SLOWER than XLA's
    backward (0.367 vs 0.351 s on the 12-view train step); with residuals
    saved, the backward is pure XLA (full-efficiency matmuls + fused
    elementwise) while the replay keeps the fused-forward win."""
    xf = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    u = ((xc * rstd) * g_ref[:].astype(jnp.float32)
         + b_ref[:].astype(jnp.float32))
    u_cast = u.astype(u_ref.dtype)
    u_ref[:] = u_cast
    mean_ref[:] = mean
    rstd_ref[:] = rstd
    z = jax.lax.dot_general(
        u_cast, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:].astype(jnp.float32)
    if act == "gelu":
        refs[0][:] = z.astype(refs[0].dtype)  # z_ref: only needed for act'
        out = _gelu_exact(z)
    else:
        out = z  # y IS z — the backward needs no separate copy
    o_ref[:] = out.astype(o_ref.dtype)


def _ln_matmul_replay(x, gamma, beta, w, bias, eps: float,
                      act: Optional[str]):
    """(y, u, mean, rstd[, z]) via the replay kernel (z only when act)."""
    m, k = x.shape
    n = w.shape[1]
    bm = _pick_bm_replay(m, k, n, w.size * w.dtype.itemsize,
                         x.dtype.itemsize)
    assert bm, f"untileable fused replay: {(m, k, n)}"
    out_specs = [
        pl.BlockSpec((bm, n), lambda i: (i, 0)),
        pl.BlockSpec((bm, k), lambda i: (i, 0)),
        pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        pl.BlockSpec((bm, 1), lambda i: (i, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((m, n), x.dtype),
        jax.ShapeDtypeStruct((m, k), x.dtype),
        jax.ShapeDtypeStruct((m, 1), jnp.float32),
        jax.ShapeDtypeStruct((m, 1), jnp.float32),
    ]
    if act is not None:
        out_specs.append(pl.BlockSpec((bm, n), lambda i: (i, 0)))
        out_shape.append(jax.ShapeDtypeStruct((m, n), x.dtype))
    return pl.pallas_call(
        functools.partial(_ln_matmul_replay_kernel, eps=eps, act=act),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k,), lambda i: (0,)),
            pl.BlockSpec((k,), lambda i: (0,)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((n,), lambda i: (0,)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(x, gamma, beta, w, bias)


def _ln_backward_xla(x, gamma, beta, w, bias, u, mean, rstd, z, g,
                     act: Optional[str]):
    """Pure-XLA backward over the saved replay residuals: full-efficiency
    du/dW matmuls, act'/LN-backward as fused elementwise chains.

    Returns (dx, dgamma, dbeta, dw, dbias) in the primal dtypes."""
    gf = g.astype(jnp.float32)
    if act == "gelu":
        dz = gf * _gelu_grad(z.astype(jnp.float32))
    else:
        dz = gf
    dzc = dz.astype(x.dtype)
    du = jax.lax.dot_general(
        dzc, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw = jax.lax.dot_general(
        u, dzc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w.dtype)
    dbias = jnp.sum(dz, axis=0).astype(bias.dtype)
    xf = x.astype(jnp.float32)
    xhat = (xf - mean) * rstd
    dgamma = jnp.sum(du * xhat, axis=0).astype(gamma.dtype)
    dbeta = jnp.sum(du, axis=0).astype(beta.dtype)
    dxhat = du * gamma.astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (rstd * (dxhat - m1 - xhat * m2)).astype(x.dtype)
    return dx, dgamma, dbeta, dw, dbias


# ---------------------------------------------------------------------------
# pallas_call wrappers ((M, K) x (K, N), weights resident)
# ---------------------------------------------------------------------------

def _ln_matmul_call(x, gamma, beta, w, bias, eps: float,
                    act: Optional[str], bm: int, vmem_limit_mb=None):
    m, k = x.shape
    n = w.shape[1]
    return pl.pallas_call(
        functools.partial(_ln_matmul_kernel, eps=eps, act=act),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k,), lambda i: (0,)),
            pl.BlockSpec((k,), lambda i: (0,)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((n,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(vmem_limit_mb or VMEM_LIMIT_MB) * 1024 * 1024),
        interpret=_interpret(),
    )(x, gamma, beta, w, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _ln_matmul_p(x, gamma, beta, w, bias, eps, act):
    m, k = x.shape
    bm = _pick_bm(m, k, w.shape[1], w.size * w.dtype.itemsize,
                  x.dtype.itemsize)
    return _ln_matmul_call(x, gamma, beta, w, bias, eps, act, bm)


def _ln_matmul_p_fwd(x, gamma, beta, w, bias, eps, act):
    outs = _ln_matmul_replay(x, gamma, beta, w, bias, eps, act)
    y, u, mean, rstd = outs[:4]
    z = outs[4] if act is not None else None
    return y, (x, gamma, beta, w, bias, u, mean, rstd, z)


def _ln_matmul_p_bwd(eps, act, res, g):
    x, gamma, beta, w, bias, u, mean, rstd, z = res
    return _ln_backward_xla(x, gamma, beta, w, bias, u, mean, rstd, z, g,
                            act)


_ln_matmul_p.defvjp(_ln_matmul_p_fwd, _ln_matmul_p_bwd)


def _ln_tileable(x, w, need_bwd: bool = True) -> bool:
    m, k = x.shape
    n = w.shape[1]
    wb = w.size * w.dtype.itemsize
    if _pick_bm(m, k, n, wb, x.dtype.itemsize) == 0:
        return False
    return not need_bwd or _pick_bm_replay(m, k, n, wb, x.dtype.itemsize) > 0


def ln_matmul(x, gamma, beta, w, bias, eps: float, act: Optional[str] = None):
    """act(LN(x) @ w + bias); x (M, K), w (K, N).  Returns (M, N) in x.dtype.
    Differentiable (fused backward kernel, _ln_matmul_bwd).  Returns None if
    the shapes don't tile (caller falls back)."""
    k = x.shape[1]
    n = w.shape[1]
    if k % 128 or n % 128 or not _ln_tileable(x, w):
        return None
    return _ln_matmul_p(x, gamma, beta, w, bias, eps, act)


def _ln_qkv_call(x, gamma, beta, w, bias, eps: float, bm: int):
    m, k = x.shape
    n = w.shape[1]
    c = n // 3
    return pl.pallas_call(
        functools.partial(_ln_qkv_kernel, eps=eps, c=c),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k,), lambda i: (0,)),
            pl.BlockSpec((k,), lambda i: (0,)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((n,), lambda i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((m, c), x.dtype)] * 3,
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(x, gamma, beta, w, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _ln_qkv_p(x, gamma, beta, w, bias, eps):
    m, k = x.shape
    bm = _pick_bm(m, k, w.shape[1], w.size * w.dtype.itemsize,
                  x.dtype.itemsize)
    return _ln_qkv_call(x, gamma, beta, w, bias, eps, bm)


def _ln_qkv_p_fwd(x, gamma, beta, w, bias, eps):
    y, u, mean, rstd = _ln_matmul_replay(x, gamma, beta, w, bias, eps, None)
    c = w.shape[1] // 3
    return ((y[:, :c], y[:, c:2 * c], y[:, 2 * c:]),
            (x, gamma, beta, w, bias, u, mean, rstd))


def _ln_qkv_p_bwd(eps, res, g):
    x, gamma, beta, w, bias, u, mean, rstd = res
    # the three head grads re-concatenate into the (M, 3C) projection grad —
    # one HBM materialization; the machinery is then ln_matmul with act=None
    gcat = jnp.concatenate(g, axis=1)
    return _ln_backward_xla(x, gamma, beta, w, bias, u, mean, rstd, None,
                            gcat, None)


_ln_qkv_p.defvjp(_ln_qkv_p_fwd, _ln_qkv_p_bwd)


def ln_qkv(x, gamma, beta, w, bias, eps: float):
    """LN(x) @ Wqkv split into q, k, v (each (M, C)) without materializing the
    (M, 3C) intermediate.  Differentiable (fused backward kernel).  Returns
    None if the shapes don't tile."""
    k = x.shape[1]
    n = w.shape[1]
    if k % 128 or (n // 3) % 128 or not _ln_tileable(x, w):
        return None
    return _ln_qkv_p(x, gamma, beta, w, bias, eps)


# ---------------------------------------------------------------------------
# fused qkv + rope, packed (3, M, C) output (single-DMA attention feed)
# ---------------------------------------------------------------------------

def _rot_lanes(x, half: int):
    """In-kernel rotate-half on flat lanes (see rope2d.rotate_half_lanes):
    within every `half`-lane group [a | b] -> [-b | a], via two lane rotates
    + a select (pltpu.roll takes non-negative shifts only).  x must be fp32:
    Mosaic's tpu.dynamic_rotate has no sub-32-bit lowering (hardware-caught;
    the callers rotate in fp32 post-matmul and round once at the end)."""
    q = half // 2
    L = x.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1) % half
    return jnp.where(lane < q, -pltpu.roll(x, L - q, x.ndim - 1),
                     pltpu.roll(x, q, x.ndim - 1))


def _ln_qkv_rope_kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, ct_ref, st_ref,
                        o_ref, *, eps: float, c: int, half: int):
    """LN -> qkv projection -> RoPE2D on q/k, emitting ONE packed (3, bm, C)
    tile.  The rotation runs on the post-matmul values still in registers
    (q/k are first rounded to the activation dtype, matching the plain
    composition's ln_qkv -> apply_rope2d_bnhd rounding order), so the rope
    costs no extra HBM pass and the packed layout feeds the attention
    kernel's single strided DMA per unit (ops/batched_attention.py
    packed_qkv_attention)."""
    y = _ln_f32(x_ref[:], g_ref[:], b_ref[:], eps).astype(x_ref.dtype)
    out = jax.lax.dot_general(
        y, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[:].astype(jnp.float32)
    ct = ct_ref[:].astype(jnp.float32)
    st = st_ref[:].astype(jnp.float32)
    # round q/k to the activation dtype first (the plain composition's
    # ln_qkv -> rope rounding point), then rotate in fp32 (_rot_lanes)
    q = out[:, :c].astype(o_ref.dtype).astype(jnp.float32)
    k = out[:, c:2 * c].astype(o_ref.dtype).astype(jnp.float32)
    o_ref[0] = (q * ct + _rot_lanes(q, half) * st).astype(o_ref.dtype)
    o_ref[1] = (k * ct + _rot_lanes(k, half) * st).astype(o_ref.dtype)
    o_ref[2] = out[:, 2 * c:].astype(o_ref.dtype)


def _ln_qkv_rope_call(x, gamma, beta, w, bias, ct, st, eps: float, half: int,
                      bm: int):
    m, k = x.shape
    n = w.shape[1]
    c = n // 3
    return pl.pallas_call(
        functools.partial(_ln_qkv_rope_kernel, eps=eps, c=c, half=half),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k,), lambda i: (0,)),
            pl.BlockSpec((k,), lambda i: (0,)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((n,), lambda i: (0,)),
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((3, bm, c), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((3, m, c), x.dtype),
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(x, gamma, beta, w, bias, ct, st)


def _rope_flat(t, ct, st, half: int):
    from fast3r_tpu.ops.rope2d import rotate_half_lanes

    return t * ct + rotate_half_lanes(t, half) * st


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _ln_qkv_rope_p(x, gamma, beta, w, bias, ct, st, eps, half):
    m, k = x.shape
    bm = _pick_bm(m, k, w.shape[1], w.size * w.dtype.itemsize,
                  x.dtype.itemsize,
                  extra_row_bytes=4 * k * ct.dtype.itemsize)
    return _ln_qkv_rope_call(x, gamma, beta, w, bias, ct, st, eps, half, bm)


def _ln_qkv_rope_p_fwd(x, gamma, beta, w, bias, ct, st, eps, half):
    y, u, mean, rstd = _ln_matmul_replay(x, gamma, beta, w, bias, eps, None)
    c = w.shape[1] // 3
    out = jnp.stack([
        _rope_flat(y[:, :c], ct, st, half),
        _rope_flat(y[:, c:2 * c], ct, st, half),
        y[:, 2 * c:],
    ])
    return out, (x, gamma, beta, w, bias, u, mean, rstd, ct, st)


def _ln_qkv_rope_p_bwd(eps, half, res, g):
    x, gamma, beta, w, bias, u, mean, rstd, ct, st = res
    # rope backward: P^T = -P and the quarter-periodic tables commute with P,
    # so d/dq rope(q) applied to a cotangent is rope with negated sin
    # (ops/rope2d.rotate_half_lanes docstring)
    dq = _rope_flat(g[0], ct, -st, half)
    dk = _rope_flat(g[1], ct, -st, half)
    gcat = jnp.concatenate([dq, dk, g[2]], axis=1)
    dx, dgamma, dbeta, dw, dbias = _ln_backward_xla(
        x, gamma, beta, w, bias, u, mean, rstd, None, gcat, None)
    return (dx, dgamma, dbeta, dw, dbias,
            jnp.zeros_like(ct), jnp.zeros_like(st))


_ln_qkv_rope_p.defvjp(_ln_qkv_rope_p_fwd, _ln_qkv_rope_p_bwd)


def ln_qkv_rope(x, gamma, beta, w, bias, ct, st, num_heads: int, eps: float):
    """LN(x) @ Wqkv with RoPE2D applied to q/k in-kernel, emitted as ONE
    packed (3, M, C) array — the zero-relayout feed for
    packed_qkv_attention's single strided DMA per unit.  ct/st are the flat
    (M, C) lane tables from rope2d.expand_rope_tables (activation dtype).
    Differentiable.  Returns None if the shapes don't tile."""
    k = x.shape[1]
    n = w.shape[1]
    c = n // 3
    if k % 128 or c % 128 or c != k or c % num_heads:
        return None
    half = (c // num_heads) // 2
    if half % 2 or half > 128:
        return None
    if x.shape[0] != ct.shape[0] or ct.shape[1] != c:
        return None
    it = x.dtype.itemsize
    if (_pick_bm(x.shape[0], k, n, w.size * w.dtype.itemsize, it,
                 extra_row_bytes=4 * k * ct.dtype.itemsize) == 0
            or _pick_bm_replay(x.shape[0], k, n, w.size * w.dtype.itemsize,
                               it) == 0):
        return None
    return _ln_qkv_rope_p(x, gamma, beta, w, bias, ct, st, eps, half)


def _rms_matmul_replay_kernel(x_ref, g_ref, w_ref,
                              o_ref, u_ref, rstd_ref, *refs,
                              eps: float, act: Optional[str]):
    """RMSNorm analogue of _ln_matmul_replay_kernel (llama blocks: bias-free
    linears, silu activation, cast-before-gamma RMS forward); emits u and
    rstd (plus z for silu) for the pure-XLA backward."""
    xf = x_ref[:].astype(jnp.float32)
    rstd = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    # forward casts xhat to x.dtype BEFORE the gamma multiply (_rms_f32)
    xhat = (xf * rstd).astype(x_ref.dtype).astype(jnp.float32)
    u = xhat * g_ref[:].astype(jnp.float32)
    u_cast = u.astype(u_ref.dtype)
    u_ref[:] = u_cast
    rstd_ref[:] = rstd
    z = jax.lax.dot_general(
        u_cast, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if act == "silu":
        refs[0][:] = z.astype(refs[0].dtype)
        out = _silu(z, o_ref.dtype)
    else:
        out = z
    o_ref[:] = out.astype(o_ref.dtype)


def _rms_matmul_replay(x, gamma, w, eps: float, act: Optional[str]):
    m, k = x.shape
    n = w.shape[1]
    bm = _pick_bm_replay(m, k, n, w.size * w.dtype.itemsize,
                         x.dtype.itemsize)
    assert bm, f"untileable fused RMS replay: {(m, k, n)}"
    out_specs = [
        pl.BlockSpec((bm, n), lambda i: (i, 0)),
        pl.BlockSpec((bm, k), lambda i: (i, 0)),
        pl.BlockSpec((bm, 1), lambda i: (i, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((m, n), x.dtype),
        jax.ShapeDtypeStruct((m, k), x.dtype),
        jax.ShapeDtypeStruct((m, 1), jnp.float32),
    ]
    if act is not None:
        out_specs.append(pl.BlockSpec((bm, n), lambda i: (i, 0)))
        out_shape.append(jax.ShapeDtypeStruct((m, n), x.dtype))
    return pl.pallas_call(
        functools.partial(_rms_matmul_replay_kernel, eps=eps, act=act),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k,), lambda i: (0,)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(x, gamma, w)


def _rms_backward_xla(x, gamma, w, u, rstd, z, g, act: Optional[str]):
    """Pure-XLA RMS backward over the saved replay residuals.
    Returns (dx, dgamma, dw)."""
    gf = g.astype(jnp.float32)
    if act == "silu":
        zf = z.astype(jnp.float32)
        sig = jax.nn.sigmoid(zf)
        dz = gf * sig * (1.0 + zf * (1.0 - sig))
    else:
        dz = gf
    dzc = dz.astype(x.dtype)
    du = jax.lax.dot_general(
        dzc, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw = jax.lax.dot_general(
        u, dzc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w.dtype)
    xf = x.astype(jnp.float32)
    xhat = (xf * rstd).astype(x.dtype).astype(jnp.float32)
    dgamma = jnp.sum(du * xhat, axis=0).astype(gamma.dtype)
    dxhat = du * gamma.astype(jnp.float32)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = (rstd * (dxhat - xhat * m2)).astype(x.dtype)
    return dx, dgamma, dw


def _rms_matmul_call(x, gamma, w, eps: float, act: Optional[str], bm: int):
    m, k = x.shape
    n = w.shape[1]
    return pl.pallas_call(
        functools.partial(_rms_matmul_kernel, eps=eps, act=act),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k,), lambda i: (0,)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(x, gamma, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _rms_matmul_p(x, gamma, w, eps, act):
    m, k = x.shape
    bm = _pick_bm(m, k, w.shape[1], w.size * w.dtype.itemsize,
                  x.dtype.itemsize)
    return _rms_matmul_call(x, gamma, w, eps, act, bm)


def _rms_matmul_p_fwd(x, gamma, w, eps, act):
    outs = _rms_matmul_replay(x, gamma, w, eps, act)
    y, u, rstd = outs[:3]
    z = outs[3] if act is not None else None
    return y, (x, gamma, w, u, rstd, z)


def _rms_matmul_p_bwd(eps, act, res, g):
    x, gamma, w, u, rstd, z = res
    return _rms_backward_xla(x, gamma, w, u, rstd, z, g, act)


_rms_matmul_p.defvjp(_rms_matmul_p_fwd, _rms_matmul_p_bwd)


def rms_matmul(x, gamma, w, eps: float, act: Optional[str] = None):
    """act(RMSNorm(x) @ w); x (M, K), w (K, N), no bias (llama linears).
    Differentiable (fused RMS backward kernel).  Returns None if the shapes
    don't tile."""
    k = x.shape[1]
    n = w.shape[1]
    if k % 128 or n % 128 or not _ln_tileable(x, w):
        return None
    return _rms_matmul_p(x, gamma, w, eps, act)


def _rms_qkv3_call(x, gamma, wq, wk, wv, eps: float, bm: int):
    m, k = x.shape
    nq, nk, nv = wq.shape[1], wk.shape[1], wv.shape[1]
    return pl.pallas_call(
        functools.partial(_rms_qkv3_kernel, eps=eps),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k,), lambda i: (0,)),
            pl.BlockSpec((k, nq), lambda i: (0, 0)),
            pl.BlockSpec((k, nk), lambda i: (0, 0)),
            pl.BlockSpec((k, nv), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, nq), lambda i: (i, 0)),
            pl.BlockSpec((bm, nk), lambda i: (i, 0)),
            pl.BlockSpec((bm, nv), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, nq), x.dtype),
            jax.ShapeDtypeStruct((m, nk), x.dtype),
            jax.ShapeDtypeStruct((m, nv), x.dtype),
        ],
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(x, gamma, wq, wk, wv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _rms_qkv3_p(x, gamma, wq, wk, wv, eps):
    m, k = x.shape
    w_bytes = (wq.size + wk.size + wv.size) * wq.dtype.itemsize
    bm = _pick_bm(m, k, wq.shape[1] + wk.shape[1] + wv.shape[1], w_bytes,
                  x.dtype.itemsize)
    return _rms_qkv3_call(x, gamma, wq, wk, wv, eps, bm)


def _rms_qkv3_p_fwd(x, gamma, wq, wk, wv, eps):
    # replay through one wide matmul over the concatenated weights (a few
    # MB, one HBM pass), split the projections for the primal outputs
    wcat = jnp.concatenate([wq, wk, wv], axis=1)
    y, u, rstd = _rms_matmul_replay(x, gamma, wcat, eps, None)
    nq, nk = wq.shape[1], wk.shape[1]
    return ((y[:, :nq], y[:, nq:nq + nk], y[:, nq + nk:]),
            (x, gamma, wq, wk, wv, u, rstd))


def _rms_qkv3_p_bwd(eps, res, g):
    x, gamma, wq, wk, wv, u, rstd = res
    wcat = jnp.concatenate([wq, wk, wv], axis=1)
    gcat = jnp.concatenate(g, axis=1)
    dx, dgamma, dw = _rms_backward_xla(x, gamma, wcat, u, rstd, None, gcat,
                                       None)
    nq, nk = wq.shape[1], wk.shape[1]
    return (dx, dgamma, dw[:, :nq], dw[:, nq:nq + nk], dw[:, nq + nk:])


_rms_qkv3_p.defvjp(_rms_qkv3_p_fwd, _rms_qkv3_p_bwd)


def rms_qkv3(x, gamma, wq, wk, wv, eps: float):
    """RMSNorm(x) projected through three separate (bias-free) weights —
    llama GQA attention, where wk/wv may be narrower than wq.
    Differentiable.  Returns None if the shapes don't tile."""
    m, k = x.shape
    nq, nk, nv = wq.shape[1], wk.shape[1], wv.shape[1]
    w_bytes = (wq.size + wk.size + wv.size) * wq.dtype.itemsize
    it = x.dtype.itemsize
    if (k % 128 or nq % 128 or nk % 128 or nv % 128
            or _pick_bm(m, k, nq + nk + nv, w_bytes, it) == 0
            or _pick_bm_replay(m, k, nq + nk + nv, w_bytes, it) == 0):
        return None
    return _rms_qkv3_p(x, gamma, wq, wk, wv, eps)


def _matmul_res_call(x, w, bias, residual, bm: int):
    m, k = x.shape
    n = w.shape[1]
    return pl.pallas_call(
        _matmul_res_kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((n,), lambda i: (0,)),
            pl.BlockSpec((bm, n), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(x, w, bias, residual)


@jax.custom_vjp
def _matmul_res_p(x, w, bias, residual):
    m, k = x.shape
    bm = _pick_bm(m, k, w.shape[1], w.size * w.dtype.itemsize,
                  x.dtype.itemsize)
    return _matmul_res_call(x, w, bias, residual, bm)


def _matmul_res_p_fwd(x, w, bias, residual):
    return _matmul_res_p(x, w, bias, residual), (x, w, bias)


def _matmul_res_p_bwd(res, g):
    # y = r + x @ W + b is matmul-only in backward (no elementwise to fuse):
    # plain XLA dots, with the dW/dx contractions on the untransposed W/x
    x, w, bias = res
    bias_dtype = bias.dtype
    dx = jax.lax.dot_general(
        g, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    dw = jax.lax.dot_general(
        x, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=0).astype(bias_dtype)
    return dx, dw, db, g


_matmul_res_p.defvjp(_matmul_res_p_fwd, _matmul_res_p_bwd)


def matmul_residual(x, w, bias, residual):
    """residual + x @ w + bias; x (M, K), w (K, N), residual (M, N).
    Differentiable.  Returns None if the shapes don't tile."""
    m, k = x.shape
    n = w.shape[1]
    bm = _pick_bm(m, k, n, w.size * w.dtype.itemsize, x.dtype.itemsize)
    if bm == 0 or k % 128 or n % 128:
        return None
    return _matmul_res_p(x, w, bias, residual)


# ---------------------------------------------------------------------------
# fully-fused MLP sublayer (LN -> fc1 -> GELU -> fc2 -> +residual)
# ---------------------------------------------------------------------------

def _pick_bm_mlp(m: int, k: int, n: int, itemsize: int) -> int:
    """Row tile for the whole-MLP kernel: BOTH weights resident plus the
    (bm, n) fp32 pre-activation and its bf16 cast live in VMEM."""
    w_bytes = (2 * k * n + n + k) * itemsize
    fits = []
    bm = 8
    while bm <= 1024:
        if m % bm == 0:
            need = (w_bytes
                    + 4 * bm * k * itemsize     # x in + o out, double-buffered
                    + bm * n * (4 + itemsize)   # z fp32 + h cast
                    + 3 * bm * k * 4)           # fp32 LN live set
            if need <= VMEM_BUDGET:
                fits.append(bm)
        bm += 8
    if not fits:
        return 0
    below = [b for b in fits if b <= 512]
    return max(below) if below else min(fits)


def _ln_mlp_call(x, gamma, beta, w1, b1, w2, b2, eps: float, bm: int):
    m, k = x.shape
    n = w1.shape[1]
    return pl.pallas_call(
        functools.partial(_ln_mlp_kernel, eps=eps),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k,), lambda i: (0,)),
            pl.BlockSpec((k,), lambda i: (0,)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((n,), lambda i: (0,)),
            pl.BlockSpec((n, k), lambda i: (0, 0)),
            pl.BlockSpec((k,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((bm, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, k), x.dtype),
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(x, gamma, beta, w1, b1, w2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _ln_mlp_p(x, gamma, beta, w1, b1, w2, b2, eps):
    m, k = x.shape
    bm = _pick_bm_mlp(m, k, w1.shape[1], x.dtype.itemsize)
    return _ln_mlp_call(x, gamma, beta, w1, b1, w2, b2, eps, bm)


def _ln_mlp_ref(x, gamma, beta, w1, b1, w2, b2, eps):
    """Two-kernel composition the backward replays through (their custom
    VJPs run the fused replay/backward kernels)."""
    h = _ln_matmul_p(x, gamma, beta, w1, b1, eps, "gelu")
    return _matmul_res_p(h, w2, b2, x)


def _ln_mlp_p_fwd(x, gamma, beta, w1, b1, w2, b2, eps):
    out = _ln_mlp_p(x, gamma, beta, w1, b1, w2, b2, eps)
    return out, (x, gamma, beta, w1, b1, w2, b2)


def _ln_mlp_p_bwd(eps, res, g):
    x, gamma, beta, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _ln_mlp_ref(*a, eps), x, gamma, beta, w1, b1, w2, b2)
    return vjp(g)


_ln_mlp_p.defvjp(_ln_mlp_p_fwd, _ln_mlp_p_bwd)


def ln_mlp(x, gamma, beta, w1, b1, w2, b2, eps: float):
    """x + GELU(LN(x) @ w1 + b1) @ w2 + b2 in ONE kernel — the (M, hidden)
    GELU activation never touches HBM.  Returns None if untileable (caller
    falls back to ln_matmul + matmul_residual)."""
    m, k = x.shape
    n = w1.shape[1]
    if k % 128 or n % 128 or w2.shape != (n, k):
        return None
    if _pick_bm_mlp(m, k, n, x.dtype.itemsize) == 0:
        return None
    # backward replays through the two-kernel road — both must tile
    wb1 = w1.size * w1.dtype.itemsize
    if _pick_bm(m, k, n, wb1, x.dtype.itemsize) == 0 or \
            _pick_bm_replay(m, k, n, wb1, x.dtype.itemsize) == 0 or \
            _pick_bm(m, n, k, w2.size * w2.dtype.itemsize,
                     x.dtype.itemsize) == 0:
        return None
    return _ln_mlp_p(x, gamma, beta, w1, b1, w2, b2, eps)


# ---------------------------------------------------------------------------
# fused pre-LN ViT block
# ---------------------------------------------------------------------------

def _fused_block_impl(p, x, rope_cos_sin, num_heads, scale, attn_impl,
                      ln_eps):
    B, N, C = x.shape
    hd = C // num_heads
    x2 = x.reshape(B * N, C)

    o = None
    if (attn_impl == "batched" and rope_cos_sin is not None
            and len(rope_cos_sin) == 4):
        # single-DMA road: rope folded into the qkv kernel, packed (3, M, C)
        # output, one strided DMA per attention unit (run_vit_stack attaches
        # the flat ct/st tables when this road is viable)
        from fast3r_tpu.ops.batched_attention import (
            packed_attention_supported, packed_qkv_attention)

        if packed_attention_supported((B, N, num_heads, hd), x.dtype):
            ct, st = rope_cos_sin[2], rope_cos_sin[3]
            qkv3 = ln_qkv_rope(x2, p["norm1"]["scale"], p["norm1"]["bias"],
                               p["attn"]["qkv"]["w"].astype(x.dtype),
                               p["attn"]["qkv"]["b"].astype(x.dtype),
                               ct, st, num_heads, ln_eps)
            if qkv3 is not None:
                o = packed_qkv_attention(qkv3.reshape(3, B, N, C), num_heads,
                                         scale)  # (B, N, C)

    if o is None:
        qkv = ln_qkv(x2, p["norm1"]["scale"], p["norm1"]["bias"],
                     p["attn"]["qkv"]["w"].astype(x.dtype),
                     p["attn"]["qkv"]["b"].astype(x.dtype), ln_eps)
        if qkv is None:
            return None
        q, k, v = (t.reshape(B, N, num_heads, hd) for t in qkv)
        if rope_cos_sin is not None:
            cos, sin = rope_cos_sin[0], rope_cos_sin[1]
            q = _layers.apply_rope2d_bnhd(q, cos, sin)
            k = _layers.apply_rope2d_bnhd(k, cos, sin)
        if callable(attn_impl):
            o = attn_impl(q, k, v, scale)
        else:
            o = _layers.dot_product_attention(q, k, v, scale=scale,
                                              impl=attn_impl)

    x2 = matmul_residual(o.reshape(B * N, C),
                         p["attn"]["proj"]["w"].astype(x.dtype),
                         p["attn"]["proj"]["b"].astype(x.dtype), x2)
    if x2 is None:
        return None

    if PREFER_FUSED_MLP:
        # memory-lean road: the (M, hidden) GELU activation never touches
        # HBM.  NOT the default — at the headline shape it measured ~0.3
        # ms/layer SLOWER than the two-kernel pipeline (45.31 vs 46.78
        # img/s, r4: the in-tile fc1 -> fc2 dependency serializes what the
        # two-kernel road overlaps); it exists for transient-bound shapes
        # (1000 views @ 512-res: the 6.3 GB fc1 transient forces host hook
        # spill without it).
        mlp_out = ln_mlp(x2, p["norm2"]["scale"], p["norm2"]["bias"],
                         p["mlp"]["fc1"]["w"].astype(x.dtype),
                         p["mlp"]["fc1"]["b"].astype(x.dtype),
                         p["mlp"]["fc2"]["w"].astype(x.dtype),
                         p["mlp"]["fc2"]["b"].astype(x.dtype), ln_eps)
        if mlp_out is not None:
            return mlp_out.reshape(B, N, C)

    h = ln_matmul(x2, p["norm2"]["scale"], p["norm2"]["bias"],
                  p["mlp"]["fc1"]["w"].astype(x.dtype),
                  p["mlp"]["fc1"]["b"].astype(x.dtype), ln_eps, act="gelu")
    if h is None:
        return None
    x2 = matmul_residual(h, p["mlp"]["fc2"]["w"].astype(x.dtype),
                         p["mlp"]["fc2"]["b"].astype(x.dtype), x2)
    if x2 is None:
        return None
    return x2.reshape(B, N, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_vit_block(p, x, rope_cos_sin, num_heads, scale, attn_impl, ln_eps):
    """Pre-LN ViT block with the elementwise work fused into the matmul
    kernels.  Forward numerics match nn/layers.vit_block at bf16 rounding;
    backward recomputes through the plain composition (remat-equivalent).

    rope_cos_sin is a primal argument (a (cos, sin) tuple or None) so the
    tables can be traced values; its cotangent is zero (positions are
    integers upstream).  Requires tileable shapes — check
    `fused_block_supported` first.
    """
    out = _fused_block_impl(p, x, rope_cos_sin, num_heads, scale, attn_impl,
                            ln_eps)
    assert out is not None, "fused_vit_block: untileable shapes"
    return out


def _plain_block(p, x, rope_cos_sin, num_heads, scale, attn_impl, ln_eps):
    return _layers.vit_block(p, x, num_heads, scale, rope_cos_sin=rope_cos_sin,
                             attn_impl=attn_impl, ln_eps=ln_eps, fused=False)


def _fused_block_fwd(p, x, rope_cos_sin, num_heads, scale, attn_impl, ln_eps):
    out = fused_vit_block(p, x, rope_cos_sin, num_heads, scale, attn_impl,
                          ln_eps)
    return out, (p, x, rope_cos_sin)


def _fused_block_bwd(num_heads, scale, attn_impl, ln_eps, res, g):
    """Backward = recompute the FUSED forward (remat semantics: residuals
    are just (p, x)) and differentiate through the fused primitives, whose
    custom VJPs run the fused backward kernels (_ln_matmul_bwd) — so
    training inherits the VMEM-residency wins instead of recomputing through
    the plain composition (r2's placeholder, VERDICT r2 item 3).  Gradient
    numerics match the plain path at bf16 rounding
    (tests/test_fused_block.py)."""
    p, x, rope_cos_sin = res
    _, vjp = jax.vjp(
        lambda p_, x_: _fused_block_impl(p_, x_, rope_cos_sin, num_heads,
                                         scale, attn_impl, ln_eps), p, x)
    dp, dx = vjp(g)
    drope = (None if rope_cos_sin is None
             else jax.tree.map(jnp.zeros_like, rope_cos_sin))
    return dp, dx, drope


fused_vit_block.defvjp(_fused_block_fwd, _fused_block_bwd)


def fused_block_supported(x_shape, dim: int, mlp_hidden: int,
                          itemsize: int = 2) -> bool:
    """Static check that every kernel in the fused block tiles — the SAME
    _pick_bm the wrappers use, with the activation dtype's itemsize (weights
    are cast to x.dtype before entering the kernels, so fp32 inference
    doubles every resident-weight footprint: the fc1 weight alone is 16.8 MB
    at fp32 vs the 12 MB budget, and a 2-byte-modeled gate would admit
    shapes whose kernels then refuse to tile)."""
    m = x_shape[0] * x_shape[1]
    c = dim
    if c % 128 or mlp_hidden % 128:
        return False
    it = itemsize
    return (
        _pick_bm(m, c, 3 * c, 3 * c * c * it, it) > 0
        and _pick_bm(m, c, c, c * c * it, it) > 0
        and _pick_bm(m, c, mlp_hidden, c * mlp_hidden * it, it) > 0
        and _pick_bm(m, mlp_hidden, c, c * mlp_hidden * it, it) > 0
        # the fused BACKWARD kernels must tile too (ln_qkv + ln_matmul bwd)
        and _pick_bm_replay(m, c, 3 * c, 3 * c * c * it, it) > 0
        and _pick_bm_replay(m, c, mlp_hidden, c * mlp_hidden * it, it) > 0
    )


# ---------------------------------------------------------------------------
# fused llama block (RMSNorm / SwiGLU variant — models/llama_decoder.py)
# ---------------------------------------------------------------------------

def _fused_llama_impl(p, x, cos, sin, cfg):
    from fast3r_tpu.models.llama_decoder import apply_rotary_pairs

    B, S, D = x.shape
    x2 = x.reshape(B * S, D)
    dt = x.dtype

    qkv = rms_qkv3(x2, p["attention_norm"]["scale"],
                   p["attn"]["wq"]["w"].astype(dt),
                   p["attn"]["wk"]["w"].astype(dt),
                   p["attn"]["wv"]["w"].astype(dt), cfg.norm_eps)
    if qkv is None:
        return None
    q = qkv[0].reshape(B, S, cfg.n_heads, cfg.head_dim)
    k = qkv[1].reshape(B, S, cfg.kv_heads, cfg.head_dim)
    v = qkv[2].reshape(B, S, cfg.kv_heads, cfg.head_dim)
    q = apply_rotary_pairs(q, cos, sin)
    k = apply_rotary_pairs(k, cos, sin)
    n_rep = cfg.n_heads // cfg.kv_heads
    if n_rep > 1:  # GQA: repeat kv heads (llama.py:125-134)
        k = jnp.repeat(k, n_rep, axis=2)
        v = jnp.repeat(v, n_rep, axis=2)
    o = _layers.dot_product_attention(q, k, v, scale=cfg.head_dim ** -0.5,
                                      impl=cfg.attn_impl)

    zero_d = jnp.zeros((D,), dt)
    x2 = matmul_residual(o.reshape(B * S, D),
                         p["attn"]["wo"]["w"].astype(dt), zero_d, x2)
    if x2 is None:
        return None

    # SwiGLU deliberately runs as TWO rms_matmul kernels (x read twice, RMS
    # recomputed): keeping w1 AND w3 resident together (11.5 MB bf16) would
    # leave <0.5 MB for token tiles -> bm ~16 rows, i.e. 16/128 of the MXU's
    # sublanes — far costlier than the ~30 MB/layer of extra HBM traffic.
    g = p["ffn_norm"]["scale"]
    h1 = rms_matmul(x2, g, p["ffn"]["w1"]["w"].astype(dt), cfg.norm_eps,
                    act="silu")
    h3 = rms_matmul(x2, g, p["ffn"]["w3"]["w"].astype(dt), cfg.norm_eps)
    if h1 is None or h3 is None:
        return None
    x2 = matmul_residual(h1 * h3, p["ffn"]["w2"]["w"].astype(dt), zero_d, x2)
    if x2 is None:
        return None
    return x2.reshape(B, S, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_llama_block(p, x, cos, sin, cfg):
    """Llama block (RMSNorm -> GQA attention -> RMSNorm -> SwiGLU) with the
    norm/silu/residual elementwise work fused into the matmul kernels.
    Backward recomputes through models/llama_decoder.llama_block (plain)."""
    out = _fused_llama_impl(p, x, cos, sin, cfg)
    assert out is not None, "fused_llama_block: untileable shapes"
    return out


def _fused_llama_fwd(p, x, cos, sin, cfg):
    return fused_llama_block(p, x, cos, sin, cfg), (p, x, cos, sin)


def _fused_llama_bwd(cfg, res, g):
    """Recompute the FUSED forward and differentiate through the fused
    primitives (custom VJPs -> fused RMS backward kernels); see
    _fused_block_bwd."""
    p, x, cos, sin = res
    _, vjp = jax.vjp(lambda p_, x_: _fused_llama_impl(p_, x_, cos, sin, cfg),
                     p, x)
    dp, dx = vjp(g)
    return dp, dx, jnp.zeros_like(cos), jnp.zeros_like(sin)


fused_llama_block.defvjp(_fused_llama_fwd, _fused_llama_bwd)


def fused_llama_supported(x_shape, cfg, itemsize: int = 2) -> bool:
    """Static tiling check for the fused llama block (see
    fused_block_supported for the itemsize contract)."""
    m = x_shape[0] * x_shape[1]
    d = cfg.embed_dim
    kvd = cfg.kv_heads * cfg.head_dim
    if d % 128 or kvd % 128 or cfg.ffn_hidden % 128:
        return False
    it = itemsize
    return (
        _pick_bm(m, d, d + 2 * kvd, (d * d + 2 * d * kvd) * it, it) > 0
        and _pick_bm(m, d, d, d * d * it, it) > 0
        and _pick_bm(m, d, cfg.ffn_hidden, d * cfg.ffn_hidden * it, it) > 0
        and _pick_bm(m, cfg.ffn_hidden, d, d * cfg.ffn_hidden * it, it) > 0
        # fused backward kernels (rms_qkv3 + the two swiglu rms_matmuls)
        and _pick_bm_replay(m, d, d + 2 * kvd, (d * d + 2 * d * kvd) * it,
                         it) > 0
        and _pick_bm_replay(m, d, cfg.ffn_hidden, d * cfg.ffn_hidden * it,
                         it) > 0
    )
