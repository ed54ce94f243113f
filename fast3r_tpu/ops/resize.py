"""Bilinear resize with torch ``align_corners=True`` semantics, as matmuls.

The DPT head's fusion blocks and output head use
``F.interpolate(mode="bilinear", align_corners=True)``
(fast3r/croco/models/dpt_block.py:238-243, 374).  ``jax.image.resize`` implements
half-pixel-center sampling (align_corners=False), so we build the interpolation
explicitly.  Because shapes are static under jit, the 1D interpolation weights are
dense (out, in) matrices computed at trace time, and the 2D resize becomes two
matmuls — which puts this op on the MXU instead of a gather pipeline, the natural
TPU formulation.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out, in) matrix M with ``y = M @ x`` = align_corners=True linear interp."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        m[0, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1) if in_size > 1 else 0.0
    src = np.arange(out_size, dtype=np.float64) * scale
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, max(in_size - 1, 0))
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    m[np.arange(out_size), lo] += 1.0 - frac
    m[np.arange(out_size), hi] += frac
    return m


@functools.lru_cache(maxsize=256)
def _interp_taps(out_size: int, in_size: int):
    """(lo, hi, frac) 2-tap form of _interp_matrix (same lo/hi/frac math)."""
    if out_size == 1 or in_size == 1:
        z = np.zeros(out_size, dtype=np.int32)
        return z, z, np.zeros(out_size, dtype=np.float32)
    scale = (in_size - 1) / (out_size - 1)
    src = np.arange(out_size, dtype=np.float64) * scale
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    return lo.astype(np.int32), hi.astype(np.int32), frac


def _resize_matmul(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Dense-matrix formulation (two MXU matmuls).  1.85 ms for
    (4,192,256,128)->(384,512) where pure bandwidth is ~0.3 ms — but still
    3x FASTER than a static-index gather+lerp formulation (5.97 ms: TPU
    gathers along non-minor axes lower to a serial row pipeline); both
    measured in scripts/bench_head.py, r3."""
    _, h, w, _ = x.shape
    dtype = x.dtype
    if h != out_h:
        mh = jnp.asarray(_interp_matrix(out_h, h), dtype=dtype)
        x = jnp.einsum("Oh,bhwc->bOwc", mh, x)
    if w != out_w:
        mw = jnp.asarray(_interp_matrix(out_w, w), dtype=dtype)
        x = jnp.einsum("Ow,bhwc->bhOc", mw, x)
    return x


def resize_bilinear_align_corners(
    x: jnp.ndarray, out_h: int, out_w: int
) -> jnp.ndarray:
    """Resize (B, H, W, C) -> (B, out_h, out_w, C), align_corners=True bilinear.

    On TPU, bf16 4D shapes route to the manual-DMA pallas kernel
    (ops/resize_kernel.py — the XLA formulations all pay relayout passes;
    see _resize_matmul note); everything else uses the dense interp-matrix
    matmuls (fastest XLA form — a static-index gather+lerp variant,
    _resize_gather, is 3x slower: non-minor-axis gathers lower badly)."""
    import jax

    if jax.default_backend() == "tpu":
        from fast3r_tpu.ops.resize_kernel import (
            resize_bilinear_kernel,
            resize_kernel_supported,
        )

        if resize_kernel_supported(x.shape, out_h, out_w, x.dtype):
            return resize_bilinear_kernel(x, out_h, out_w)
    return _resize_matmul(x, out_h, out_w)


def _resize_gather(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Static 2-tap gather+lerp formulation.  Kept for measurement: LOSES to
    the matmul form on TPU (5.97 vs 1.81 ms at (4,192,256,128)->(384,512),
    scripts/bench_head.py r3) because jnp.take along a non-minor axis
    lowers to a serial gather pipeline, not a fused elementwise kernel."""
    _, h, w, _ = x.shape
    dtype = x.dtype
    if h != out_h:
        lo, hi, frac = _interp_taps(out_h, h)
        f = jnp.asarray(frac, dtype)[:, None, None]
        x = jnp.take(x, jnp.asarray(lo), axis=1) * (1 - f) \
            + jnp.take(x, jnp.asarray(hi), axis=1) * f
    if w != out_w:
        lo, hi, frac = _interp_taps(out_w, w)
        f = jnp.asarray(frac, dtype)[:, None]
        x = jnp.take(x, jnp.asarray(lo), axis=2) * (1 - f) \
            + jnp.take(x, jnp.asarray(hi), axis=2) * f
    return x


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """scale_factor=2 shortcut (output size = 2*input, torch floor(I*2))."""
    _, h, w, _ = x.shape
    return resize_bilinear_align_corners(x, 2 * h, 2 * w)


# ---------------------------------------------------------------------------
# torch-parity bicubic (A = -0.75), align_corners=False
# ---------------------------------------------------------------------------

def _cubic(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """torch's bicubic convolution kernel (Keys, A=-0.75 — NOT the A=-0.5 of
    jax.image.resize; the two produce visibly different weights)."""
    x = np.abs(x)
    w = np.where(
        x <= 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, ((x - 5.0) * x + 8.0) * x - 4.0, 0.0) * a,
    )
    return w


@functools.lru_cache(maxsize=256)
def _bicubic_matrix(out_size: int, in_size: int,
                    scale: float | None = None) -> np.ndarray:
    """(out, in) matrix for torch ``F.interpolate(mode="bicubic",
    align_corners=False, antialias=False)``.

    scale: the torch ``scale_factor`` if given (src = (dst+0.5)/scale - 0.5;
    hub DINOv2 passes (grid + 0.1)/M — pos_embed.py interpolate_offset), else
    out/in (the ``size=`` form).
    """
    s = float(scale) if scale is not None else out_size / in_size
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) / s - 0.5
    lo = np.floor(src).astype(np.int64)
    frac = src - lo
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in range(-1, 3):
        w = _cubic(frac - tap)
        idx = np.clip(lo + tap, 0, in_size - 1)
        np.add.at(m, (np.arange(out_size), idx), w)
    return m.astype(np.float32)


def resize_bicubic_torch(
    x: jnp.ndarray, out_h: int, out_w: int,
    scale_factors: tuple[float, float] | None = None,
) -> jnp.ndarray:
    """Resize (B, H, W, C) with torch bicubic numerics (A=-0.75,
    align_corners=False, no antialias), as two MXU matmuls.

    scale_factors: optional (sh, sw) replicating torch's ``scale_factor=``
    coordinate mapping (used by hub DINOv2's interpolate_pos_encoding with
    its +0.1 offset); None means the ``size=`` mapping.
    """
    _, h, w, _ = x.shape
    dtype = x.dtype
    sh, sw = scale_factors if scale_factors is not None else (None, None)
    if h != out_h or sh is not None:
        mh = jnp.asarray(_bicubic_matrix(out_h, h, sh), dtype=dtype)
        x = jnp.einsum("Oh,bhwc->bOwc", mh, x)
    if w != out_w or sw is not None:
        mw = jnp.asarray(_bicubic_matrix(out_w, w, sw), dtype=dtype)
        x = jnp.einsum("Ow,bhwc->bhOc", mw, x)
    return x
