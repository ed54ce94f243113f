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


def resize_bilinear_align_corners(
    x: jnp.ndarray, out_h: int, out_w: int
) -> jnp.ndarray:
    """Resize (B, H, W, C) -> (B, out_h, out_w, C), align_corners=True bilinear."""
    _, h, w, _ = x.shape
    dtype = x.dtype
    if h != out_h:
        mh = jnp.asarray(_interp_matrix(out_h, h), dtype=dtype)
        x = jnp.einsum("Oh,bhwc->bOwc", mh, x)
    if w != out_w:
        mw = jnp.asarray(_interp_matrix(out_w, w), dtype=dtype)
        x = jnp.einsum("Ow,bhwc->bhOc", mw, x)
    return x


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """scale_factor=2 shortcut (output size = 2*input, torch floor(I*2))."""
    _, h, w, _ = x.shape
    return resize_bilinear_align_corners(x, 2 * h, 2 * w)
