"""Sine-cosine positional embedding tables.

Behavioral reference: fast3r/croco/models/pos_embed.py:27-76 (get_2d_sincos_pos_embed,
get_1d_sincos_pos_embed_from_grid).  The fusion decoder's image-index embedding is a
1D sincos table over indices 0..999 (fast3r/models/fast3r.py:691-697).

Implemented here as pure jnp functions so the tables can be built inside a jitted
program (static shapes) or precomputed on the host.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sincos_1d(embed_dim: int, pos: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """1D sincos embedding: ``[sin(pos*omega), cos(pos*omega)]``.

    ``omega[i] = 1 / 10000**(i / (embed_dim/2))`` for i in [0, embed_dim/2).

    Args:
      embed_dim: output embedding dimension (must be even).
      pos: any-shape array of positions (will be flattened).

    Returns:
      (pos.size, embed_dim) array.
    """
    assert embed_dim % 2 == 0, "embed_dim must be even"
    half = embed_dim // 2
    # float64 in the numpy reference; use float32 consistently (difference < 1e-7
    # for indices < 1000, verified in tests/test_sincos.py).
    omega = jnp.arange(half, dtype=jnp.float32) / float(half)
    omega = 1.0 / (10000.0 ** omega)
    pos = pos.reshape(-1).astype(jnp.float32)
    out = jnp.einsum("m,d->md", pos, omega)
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1).astype(dtype)


def sincos_1d_table_np(embed_dim: int, n: int) -> np.ndarray:
    """Host-side float64 table matching the reference exactly (then cast to f32).

    Used for the decoder image-index embedding table (indices 0..n-1).
    """
    assert embed_dim % 2 == 0
    half = embed_dim // 2
    omega = np.arange(half, dtype=float) / float(half)
    omega = 1.0 / 10000.0 ** omega
    pos = np.arange(n, dtype=float)
    out = np.einsum("m,d->md", pos, omega)
    emb = np.concatenate([np.sin(out), np.cos(out)], axis=1)
    return emb.astype(np.float32)


def sincos_2d(embed_dim: int, grid_size: int, dtype=jnp.float32) -> jnp.ndarray:
    """2D sincos embedding over a square grid (reference pos_embed.py:27-55).

    Half the dims encode the row (h) coordinate, half the column (w).
    Returns (grid_size*grid_size, embed_dim).
    """
    assert embed_dim % 2 == 0
    gh = jnp.arange(grid_size, dtype=jnp.float32)
    gw = jnp.arange(grid_size, dtype=jnp.float32)
    # reference: meshgrid(w, h) with w first -> grid[0] is w varying along axis 1
    ww, hh = jnp.meshgrid(gw, gh)
    emb_h = sincos_1d(embed_dim // 2, ww, dtype)  # reference passes grid[0]=w to h-half
    emb_w = sincos_1d(embed_dim // 2, hh, dtype)
    return jnp.concatenate([emb_h, emb_w], axis=1)
