"""Functional NN layers: explicit param pytrees + pure apply functions.

Design: every layer is a pair ``init_*(key, ...) -> params`` / ``apply(params, x)``
where params are plain nested dicts of jnp arrays.  This keeps the torch->JAX
checkpoint mapping transparent (fast3r_tpu/utils/checkpoint.py) and composes
directly with jit / scan / shard_map without framework indirection.

Parameter shape conventions:
  Linear     {"w": (in, out), "b": (out,)}            y = x @ w + b
  LayerNorm  {"scale": (d,), "bias": (d,)}
  Conv (NHWC/HWIO)  {"w": (kh, kw, cin, cout), "b": (cout,)}

Transformer blocks follow the pre-LN ViT block of
fast3r/croco/models/blocks.py:197-239 (Block = LN -> MHA -> res, LN -> MLP(GELU) -> res).
Stacks of identical blocks store params stacked on a leading layer axis and run
under ``jax.lax.scan`` so XLA traces one layer regardless of depth.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from fast3r_tpu.ops.attention import dot_product_attention
from fast3r_tpu.ops.rope2d import apply_rope2d, apply_rope2d_bnhd

Params = Dict[str, Any]


# ----------------------------------------------------------------------------
# initializers (torch-default-compatible where it matters for training parity)
# ----------------------------------------------------------------------------

def _kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    # torch nn.Linear / nn.Conv2d default: kaiming_uniform(a=sqrt(5)) ==
    # U(-1/sqrt(fan_in), 1/sqrt(fan_in)) * sqrt(3) ... simplifies to
    # bound = sqrt(6 / ((1 + 5) * fan_in)) = 1/sqrt(fan_in)
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_linear(key, d_in: int, d_out: int, bias: bool = True, dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    p = {"w": _kaiming_uniform(kw, (d_in, d_out), d_in, dtype)}
    if bias:
        p["b"] = _kaiming_uniform(kb, (d_out,), d_in, dtype)
    return p


def init_layernorm(d: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def init_conv(key, kh: int, kw_: int, cin: int, cout: int, bias: bool = True,
              dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw_ * cin
    p = {"w": _kaiming_uniform(k1, (kh, kw_, cin, cout), fan_in, dtype)}
    if bias:
        p["b"] = _kaiming_uniform(k2, (cout,), fan_in, dtype)
    return p


# ----------------------------------------------------------------------------
# apply fns
# ----------------------------------------------------------------------------

def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def layernorm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm with fp32 statistics (torch computes LN in fp32 under
    autocast).  On TPU this dispatches to the fused Pallas kernel
    (ops/fused_layernorm.py — one HBM read+write instead of several fp32
    materializations); numerics are identical (two-pass fp32 stats)."""
    if jax.default_backend() == "tpu" and x.shape[-1] % 128 == 0:
        from fast3r_tpu.ops.fused_layernorm import fused_layernorm

        return fused_layernorm(x, p["scale"], p["bias"], eps)
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    # torch nn.GELU default is the exact (erf) formulation
    return jax.nn.gelu(x, approximate=False)


def dropout(x: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    """Inverted dropout (torch nn.Dropout train-mode semantics).  Identity
    when rate == 0 or rng is None (inference)."""
    if rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def drop_path(x: jnp.ndarray, rate: float, rng) -> jnp.ndarray:
    """Stochastic depth per SAMPLE (reference blocks.py:45-73): one
    bernoulli per batch row, scaled by 1/keep (scale_by_keep=True; at
    rate == 1.0 the branch is zeroed unscaled, matching the reference's
    keep_prob > 0 guard)."""
    if rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    if keep > 0.0:
        mask = mask / keep
    return x * mask


def mlp(p: Params, x: jnp.ndarray, drop: float = 0.0, rng=None) -> jnp.ndarray:
    if drop > 0.0 and rng is not None:
        k1, k2 = jax.random.split(rng)
        h = dropout(gelu(linear(p["fc1"], x)), drop, k1)
        return dropout(linear(p["fc2"], h), drop, k2)
    return linear(p["fc2"], gelu(linear(p["fc1"], x)))


def conv2d(p: Params, x: jnp.ndarray, stride: int = 1, padding="SAME",
           transpose_kernel_spatial: bool = False) -> jnp.ndarray:
    """NHWC conv with HWIO kernel."""
    w = p["w"].astype(x.dtype)
    if transpose_kernel_spatial:
        w = jnp.swapaxes(w, 0, 1)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv_transpose2d(p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """NHWC transposed conv with kernel_size == stride (the only case the DPT
    head uses: its act_postprocess upsamplers, dpt_block.py:424-453).

    With non-overlapping kernels, torch's ConvTranspose2d
    ``out[si+a, sj+b, co] = sum_ci x[i, j, ci] * W[a, b, ci, co]`` is exactly a
    single einsum + reshape — one MXU matmul, no scatter.
    """
    b_, h, w, cin = x.shape
    kh, kw_, _, cout = p["w"].shape
    assert kh == stride and kw_ == stride
    y = jnp.einsum("bijc,xyco->bixjyo", x, p["w"].astype(x.dtype))
    y = y.reshape(b_, h * stride, w * stride, cout)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ----------------------------------------------------------------------------
# ViT block (reference blocks.py:109-239)
# ----------------------------------------------------------------------------

def init_vit_block(key, dim: int, num_heads: int, mlp_ratio: float = 4.0,
                   qkv_bias: bool = True, dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    hidden = int(dim * mlp_ratio)
    return {
        "norm1": init_layernorm(dim, dtype),
        "attn": {
            "qkv": init_linear(k1, dim, 3 * dim, bias=qkv_bias, dtype=dtype),
            "proj": init_linear(k2, dim, dim, bias=True, dtype=dtype),
        },
        "norm2": init_layernorm(dim, dtype),
        "mlp": {
            "fc1": init_linear(k3, dim, hidden, dtype=dtype),
            "fc2": init_linear(k4, hidden, dim, dtype=dtype),
        },
    }


def attention_layer(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
    scale: float,
    rope_cos_sin: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    attn_impl: str = "xla",
    attn_drop: float = 0.0,
    proj_drop: float = 0.0,
    rng=None,
) -> jnp.ndarray:
    """Self-attention sublayer (reference blocks.py:135-194).

    x: (B, N, C).  RoPE (if given) is applied to q and k in fp32
    (blocks.py:146-149 applies rope under fp32 autocast).  With a non-zero
    attn_drop and an rng (train mode) the softmax weights are dropped like
    the reference's pytorch_naive path (blocks.py:163-170: softmax ->
    Dropout -> @v); proj_drop follows the output projection.
    """
    B, N, C = x.shape
    hd = C // num_heads
    qkv = linear(p["qkv"], x).reshape(B, N, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, hd)
    if rope_cos_sin is not None:
        cos, sin = rope_cos_sin[0], rope_cos_sin[1]  # tolerate the 4-tuple
        q = apply_rope2d_bnhd(q, cos, sin)
        k = apply_rope2d_bnhd(k, cos, sin)
    k_attn = k_proj = None
    if rng is not None:
        k_attn, k_proj = jax.random.split(rng)
    if attn_drop > 0.0 and k_attn is not None:
        # weight-level dropout forces the naive (materialized-logits) path
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        w = dropout(jax.nn.softmax(logits, axis=-1).astype(q.dtype),
                    attn_drop, k_attn)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, v)
    elif callable(attn_impl):
        o = attn_impl(q, k, v, scale)
    else:
        o = dot_product_attention(q, k, v, scale=scale, impl=attn_impl)
    o = linear(p["proj"], o.reshape(B, N, C))
    return dropout(o, proj_drop, k_proj)


def vit_block(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
    scale: float,
    rope_cos_sin=None,
    attn_impl: str = "xla",
    ln_eps: float = 1e-6,
    fused: bool = False,
    drop: float = 0.0,
    attn_drop: float = 0.0,
    droppath: float = 0.0,
    rng=None,
) -> jnp.ndarray:
    """Pre-LN ViT block.  With ``fused=True`` the LN/GELU/residual elementwise
    work runs inside the matmul kernels (nn/fused_block.py, TPU hot path);
    numerics match the plain composition at input-dtype rounding and the
    backward pass recomputes through the plain path.

    drop / attn_drop / droppath mirror the reference Block's knobs
    (blocks.py:196-239: drop = proj + MLP dropout, attn_drop = softmax-weight
    dropout, droppath = per-sample stochastic depth on both residual
    branches).  They act only when an ``rng`` is provided (train mode) and
    force the plain (unfused) path — every shipped reference config sets
    them to 0.0, so the fused TPU kernels never see them."""
    drops_active = rng is not None and (drop > 0.0 or attn_drop > 0.0
                                        or droppath > 0.0)
    if fused and not drops_active:
        from fast3r_tpu.nn.fused_block import fused_vit_block

        return fused_vit_block(p, x, rope_cos_sin, num_heads, scale,
                               attn_impl, ln_eps)
    k_attn = k_mlp = k_dp1 = k_dp2 = None
    if drops_active:
        k_attn, k_mlp, k_dp1, k_dp2 = jax.random.split(rng, 4)
    a = attention_layer(
        p["attn"], layernorm(p["norm1"], x, ln_eps), num_heads, scale,
        rope_cos_sin, attn_impl, attn_drop=attn_drop, proj_drop=drop,
        rng=k_attn,
    )
    x = x + drop_path(a, droppath, k_dp1)
    m = mlp(p["mlp"], layernorm(p["norm2"], x, ln_eps), drop=drop, rng=k_mlp)
    return x + drop_path(m, droppath, k_dp2)


# ----------------------------------------------------------------------------
# stacked blocks under lax.scan
# ----------------------------------------------------------------------------

def init_vit_stack(key, depth: int, dim: int, num_heads: int,
                   mlp_ratio: float = 4.0, qkv_bias: bool = True,
                   dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, depth)
    per_layer = [init_vit_block(k, dim, num_heads, mlp_ratio, qkv_bias, dtype)
                 for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)


def _slice_stack(stacked: Params, start: int, end: int) -> Params:
    return jax.tree.map(lambda a: a[start:end], stacked)


def run_vit_stack(
    stacked: Params,
    x: jnp.ndarray,
    num_heads: int,
    scale: float,
    rope_cos_sin=None,
    attn_impl: str = "xla",
    ln_eps: float = 1e-6,
    hooks: Sequence[int] = (),
    depth: Optional[int] = None,
    remat: bool = False,
    fused: bool = False,
    drop: float = 0.0,
    attn_drop: float = 0.0,
    droppath: float = 0.0,
    rng=None,
) -> Tuple[jnp.ndarray, Dict[int, jnp.ndarray]]:
    """Run a stack of identical ViT blocks via lax.scan.

    Args:
      stacked: params stacked on leading axis (depth).
      hooks: layer indices (1-based: hook i = output after block i) whose
        outputs must be returned, e.g. the DPT hook layers.  The scan is split
        into segments at the hook boundaries so only the hooked activations are
        materialized (a full per-layer output stack for 1000-view sequences
        would not fit HBM).
      remat: rematerialize each block on the backward pass (jax.checkpoint).

    Returns:
      (final output [after `depth` blocks, pre final-norm], {hook: activation}).
    """
    if depth is None:
        depth = jax.tree.leaves(stacked)[0].shape[0]

    if (fused and attn_impl == "batched" and rope_cos_sin is not None
            and len(rope_cos_sin) == 2
            and jax.default_backend() == "tpu"):
        # viable single-DMA fused-qkv+rope road (nn/fused_block.py): expand
        # the flat (M, C) rope lane tables ONCE for the whole stack (every
        # block shares them) and pass the 4-tuple down
        from fast3r_tpu.ops.batched_attention import (
            packed_attention_supported)

        B, N, C = x.shape
        if packed_attention_supported((B, N, num_heads, C // num_heads),
                                      x.dtype):
            from fast3r_tpu.ops.rope2d import expand_rope_tables

            ct, st = expand_rope_tables(rope_cos_sin[0], rope_cos_sin[1], C,
                                        x.dtype)
            rope_cos_sin = (rope_cos_sin[0], rope_cos_sin[1], ct, st)

    drops_active = rng is not None and (drop > 0.0 or attn_drop > 0.0
                                        or droppath > 0.0)
    block = partial(
        vit_block, num_heads=num_heads, scale=scale, rope_cos_sin=rope_cos_sin,
        attn_impl=attn_impl, ln_eps=ln_eps, fused=fused,
        drop=drop, attn_drop=attn_drop, droppath=droppath,
    )
    if remat and not fused:
        # the fused block's custom VJP already saves only (params, x) and
        # recomputes on backward — checkpoint would just add a second replay
        block = jax.checkpoint(block)

    if drops_active:
        layer_rngs = jax.random.split(rng, depth)

        def scan_fn(carry, xs):
            layer_params, layer_rng = xs
            return block(layer_params, carry, rng=layer_rng), None

        def seg(x, lo, hi):
            return jax.lax.scan(
                scan_fn, x, (_slice_stack(stacked, lo, hi),
                             layer_rngs[lo:hi]))[0]
    else:
        def scan_fn(carry, layer_params):
            return block(layer_params, carry), None

        def seg(x, lo, hi):
            return jax.lax.scan(scan_fn, x, _slice_stack(stacked, lo, hi))[0]

    boundaries = sorted({h for h in hooks if 0 < h <= depth})
    outputs: Dict[int, jnp.ndarray] = {}
    pos = 0
    for b in boundaries:
        x = seg(x, pos, b)
        outputs[b] = x
        pos = b
    if pos < depth:
        x = seg(x, pos, depth)
    return x, outputs
