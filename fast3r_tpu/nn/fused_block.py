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

VMEM_BUDGET = 12 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _erf(x):
    """fp32 erf for the in-kernel exact GELU — Mosaic has no erf/erfc
    lowering (NotImplementedError: erfc).  Abramowitz & Stegun 7.1.26
    (max abs error 1.5e-7, far below the bf16 output ulp and the fp32
    golden-test tolerances)."""
    sign = jnp.sign(x)
    z = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-z * z))


def _gelu_exact(x):
    """x * Phi(x) with the erf formulation (torch nn.GELU default)."""
    return x * 0.5 * (1.0 + _erf(x * 0.7071067811865476))


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


def _pick_bm(m: int, k: int, n: int, w_bytes: int, itemsize: int) -> int:
    """Rows per program such that W (resident) + double-buffered x/out tiles +
    fp32 LN intermediates stay inside the VMEM budget."""
    best = 0
    bm = 8
    while bm <= 1024:
        if m % bm == 0:
            need = (w_bytes + 2 * bm * k * itemsize + 2 * bm * n * itemsize
                    + 3 * bm * k * 4)
            if need <= VMEM_BUDGET:
                best = bm
        bm += 8
    return best


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
    if act == "gelu":
        out = _gelu_exact(out)
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
        out = out * jax.nn.sigmoid(out)
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


# ---------------------------------------------------------------------------
# pallas_call wrappers ((M, K) x (K, N), weights resident)
# ---------------------------------------------------------------------------

def ln_matmul(x, gamma, beta, w, bias, eps: float, act: Optional[str] = None):
    """act(LN(x) @ w + bias); x (M, K), w (K, N).  Returns (M, N) in x.dtype.
    Returns None if the shapes don't tile (caller falls back)."""
    m, k = x.shape
    n = w.shape[1]
    bm = _pick_bm(m, k, n, w.size * w.dtype.itemsize, x.dtype.itemsize)
    if bm == 0 or k % 128 or n % 128:
        return None
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
        interpret=_interpret(),
    )(x, gamma, beta, w, bias)


def ln_qkv(x, gamma, beta, w, bias, eps: float):
    """LN(x) @ Wqkv split into q, k, v (each (M, C)) without materializing the
    (M, 3C) intermediate.  Returns None if the shapes don't tile."""
    m, k = x.shape
    n = w.shape[1]
    c = n // 3
    bm = _pick_bm(m, k, n, w.size * w.dtype.itemsize, x.dtype.itemsize)
    if bm == 0 or k % 128 or c % 128:
        return None
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
        interpret=_interpret(),
    )(x, gamma, beta, w, bias)


def rms_matmul(x, gamma, w, eps: float, act: Optional[str] = None):
    """act(RMSNorm(x) @ w); x (M, K), w (K, N), no bias (llama linears)."""
    m, k = x.shape
    n = w.shape[1]
    bm = _pick_bm(m, k, n, w.size * w.dtype.itemsize, x.dtype.itemsize)
    if bm == 0 or k % 128 or n % 128:
        return None
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
        interpret=_interpret(),
    )(x, gamma, w)


def rms_qkv3(x, gamma, wq, wk, wv, eps: float):
    """RMSNorm(x) projected through three separate (bias-free) weights —
    llama GQA attention, where wk/wv may be narrower than wq."""
    m, k = x.shape
    nq, nk, nv = wq.shape[1], wk.shape[1], wv.shape[1]
    w_bytes = (wq.size + wk.size + wv.size) * wq.dtype.itemsize
    bm = _pick_bm(m, k, nq + nk + nv, w_bytes, x.dtype.itemsize)
    if bm == 0 or k % 128 or nq % 128 or nk % 128 or nv % 128:
        return None
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
        interpret=_interpret(),
    )(x, gamma, wq, wk, wv)


def matmul_residual(x, w, bias, residual):
    """residual + x @ w + bias; x (M, K), w (K, N), residual (M, N)."""
    m, k = x.shape
    n = w.shape[1]
    bm = _pick_bm(m, k, n, w.size * w.dtype.itemsize, x.dtype.itemsize)
    if bm == 0 or k % 128 or n % 128:
        return None
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
        interpret=_interpret(),
    )(x, w, bias, residual)


# ---------------------------------------------------------------------------
# fused pre-LN ViT block
# ---------------------------------------------------------------------------

def _fused_block_impl(p, x, rope_cos_sin, num_heads, scale, attn_impl,
                      ln_eps):
    B, N, C = x.shape
    hd = C // num_heads
    x2 = x.reshape(B * N, C)

    qkv = ln_qkv(x2, p["norm1"]["scale"], p["norm1"]["bias"],
                 p["attn"]["qkv"]["w"].astype(x.dtype),
                 p["attn"]["qkv"]["b"].astype(x.dtype), ln_eps)
    if qkv is None:
        return None
    q, k, v = (t.reshape(B, N, num_heads, hd) for t in qkv)
    if rope_cos_sin is not None:
        cos, sin = rope_cos_sin
        q = _layers.apply_rope2d_bnhd(q, cos, sin)
        k = _layers.apply_rope2d_bnhd(k, cos, sin)
    if callable(attn_impl):
        o = attn_impl(q, k, v, scale)
    else:
        o = _layers.dot_product_attention(q, k, v, scale=scale, impl=attn_impl)

    x2 = matmul_residual(o.reshape(B * N, C),
                         p["attn"]["proj"]["w"].astype(x.dtype),
                         p["attn"]["proj"]["b"].astype(x.dtype), x2)
    if x2 is None:
        return None

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
    p, x, rope_cos_sin = res
    _, vjp = jax.vjp(
        lambda p_, x_: _plain_block(p_, x_, rope_cos_sin, num_heads, scale,
                                    attn_impl, ln_eps), p, x)
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
    from fast3r_tpu.models.llama_decoder import llama_block

    p, x, cos, sin = res
    _, vjp = jax.vjp(lambda p_, x_: llama_block(p_, x_, cos, sin, cfg,
                                                fused=False), p, x)
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
    )
