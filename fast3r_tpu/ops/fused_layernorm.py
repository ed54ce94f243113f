"""Fused Pallas LayerNorm (fp32 statistics, one HBM read + one write).

The jnp LayerNorm in nn/layers.py casts to fp32 and lets XLA schedule the
mean/var reductions — measured ~1.3 ms per (15360, 1024) application on v5e
(multiple fp32 materializations), with ~98 LN applications per flagship
forward.  This kernel keeps the block in VMEM, computes two-pass fp32
statistics there (bit-comparable to the reference's fp32 LN), and touches HBM
once each way — ~8x less memory traffic.

Backward (custom VJP): dx = (g - mean(g) - xhat * mean(g * xhat)) / std with
g = dy * scale; partial dscale/dbias row-block sums are emitted per program
and reduced outside the kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_rows(n: int, d: int = 1024, live_tiles: int = 5) -> int:
    """Rows per program such that `live_tiles` fp32 (bn, d) tiles fit a
    10 MB budget (Mosaic stacks every chained intermediate; the backward
    holds ~8 — x, dy, g, xhat, two mean terms, dx, partials — and a
    bn=960/d=1024 pick compiled to a 19.5 MB stack and OOM'd)."""
    cap = (10 * 1024 * 1024) // (4 * max(d, 1) * live_tiles)
    target = max(8, min(1024, cap))
    best = 0
    b = 8
    while b <= target:
        if n % b == 0:
            best = b
        b += 8
    return best


def _fwd_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    xhat = xc * jax.lax.rsqrt(var + eps)
    y = xhat * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def _bwd_kernel(x_ref, scale_ref, dy_ref, dx_ref, dscale_ref, dbias_ref,
                *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    scale = scale_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    g = dy * scale
    dx = (g - jnp.mean(g, axis=-1, keepdims=True)
          - xhat * jnp.mean(g * xhat, axis=-1, keepdims=True)) * rstd
    dx_ref[:] = dx.astype(dx_ref.dtype)
    # the FULL (nblocks, d) partial arrays stay resident (constant index
    # map); each program writes its own row.  A (1, d) per-block output
    # spec is illegal on TPU when 1 < nblocks < 8 (sublane rule).
    i = pl.program_id(0)
    dscale_ref[i, :] = jnp.sum(dy * xhat, axis=0)
    dbias_ref[i, :] = jnp.sum(dy, axis=0)


def _run_fwd(x2d, scale, bias, eps, bn):
    n, d = x2d.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, d), lambda i: (i, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((d,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((bn, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, d), x2d.dtype),
        interpret=_interpret(),
    )(x2d, scale, bias)


def _run_bwd(x2d, scale, dy2d, eps, bn):
    n, d = x2d.shape
    nblocks = n // bn
    dx, dscale_p, dbias_p = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((bn, d), lambda i: (i, 0)),
            pl.BlockSpec((d,), lambda i: (0,)),
            pl.BlockSpec((bn, d), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bn, d), lambda i: (i, 0)),
            pl.BlockSpec((nblocks, d), lambda i: (0, 0)),
            pl.BlockSpec((nblocks, d), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x2d.dtype),
            jax.ShapeDtypeStruct((nblocks, d), jnp.float32),
            jax.ShapeDtypeStruct((nblocks, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(x2d, scale, dy2d)
    return dx, dscale_p.sum(0), dbias_p.sum(0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layernorm(x, scale, bias, eps: float = 1e-6):
    """LayerNorm over the last axis; x (..., D); scale/bias (D,)."""
    return _fused_ln_fwd(x, scale, bias, eps)[0]


def _fused_ln_fwd(x, scale, bias, eps):
    shape = x.shape
    d = shape[-1]
    x2d = x.reshape(-1, d)
    bn = _pick_rows(x2d.shape[0], d)
    if bn == 0:
        # ragged row count: jnp fallback
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype).reshape(shape), (x, scale)
    y = _run_fwd(x2d, scale, bias, eps, bn).reshape(shape)
    return y, (x, scale)


def _fused_ln_bwd(eps, res, dy):
    x, scale = res
    shape = x.shape
    d = shape[-1]
    x2d = x.reshape(-1, d)
    dy2d = dy.reshape(-1, d)
    bn = _pick_rows(x2d.shape[0], d, live_tiles=8)
    # the bwd keeps the full (nblocks, d) fp32 partial arrays resident in
    # VMEM (see _bwd_kernel); guard their size
    if bn and 2 * (x2d.shape[0] // bn) * d * 4 > 2 * 1024 * 1024:
        bn = 0
    if bn == 0:
        xf = x2d.astype(jnp.float32)
        dyf = dy2d.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = xc * rstd
        g = dyf * scale.astype(jnp.float32)
        dx = (g - jnp.mean(g, -1, keepdims=True)
              - xhat * jnp.mean(g * xhat, -1, keepdims=True)) * rstd
        return (dx.astype(x.dtype).reshape(shape),
                jnp.sum(dyf * xhat, 0).astype(scale.dtype),
                jnp.sum(dyf, 0).astype(scale.dtype))
    dx, dscale, dbias = _run_bwd(x2d, scale, dy2d, eps, bn)
    return (dx.reshape(shape), dscale.astype(scale.dtype),
            dbias.astype(scale.dtype))


fused_layernorm.defvjp(_fused_ln_fwd, _fused_ln_bwd)
