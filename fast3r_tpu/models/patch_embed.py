"""Patch embedding with mixed landscape/portrait batches.

Behavioral reference: fast3r/dust3r/patch_embed.py:24-105 (PatchEmbedDust3R and
ManyAR_PatchEmbed) and the PositionGetter of croco/models/blocks.py:376-388.

Contract (inherited from the reference data pipeline): every image tensor is
stored in landscape layout (W >= H); a portrait image arrives pre-transposed and
its ``true_shape`` (h, w) records the real orientation.  ManyAR semantics: for a
portrait sample the projection must run on the *un-transposed* (portrait) pixels
and the patch grid is (W_tok, H_tok) raster order with positions from a
(W_tok x H_tok) cartesian grid.

TPU formulation: instead of boolean gather/scatter over a dynamic subset of the
batch (reference patch_embed.py:83-102, shape-dynamic), we use the identity
``conv(img^T, K) == conv(img, K^T)^T`` — one extra cheap stride-16 conv with the
spatially-transposed kernel computes the portrait branch for the whole batch,
and a per-sample ``where`` selects.  Both branches are static-shaped, XLA fuses
the select, and the cost is ~0.3% of encoder FLOPs.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from fast3r_tpu.nn.layers import Params, conv2d, init_conv


def init_patch_embed(key, patch_size: int, embed_dim: int, in_chans: int = 3,
                     dtype=jnp.float32) -> Params:
    return init_conv(key, patch_size, patch_size, in_chans, embed_dim, dtype=dtype)


def position_grid(h: int, w: int) -> jnp.ndarray:
    """(h*w, 2) cartesian product of (arange(h), arange(w)), y-major.

    Matches torch.cartesian_prod(arange(h), arange(w)) (blocks.py:386).
    """
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)


def patch_embed_simple(p: Params, img: jnp.ndarray, patch_size: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """PatchEmbedDust3R: plain conv patchify (reference patch_embed.py:24-38).

    img: (B, H, W, 3) -> tokens (B, H/ps*W/ps, D), positions (B, N, 2).
    """
    B, H, W, _ = img.shape
    assert H % patch_size == 0 and W % patch_size == 0
    x = conv2d(p, img, stride=patch_size, padding="VALID")
    _, h, w, D = x.shape
    tokens = x.reshape(B, h * w, D)
    pos = jnp.broadcast_to(position_grid(h, w)[None], (B, h * w, 2))
    return tokens, pos


def patch_embed_manyar(p: Params, img: jnp.ndarray, true_shape: jnp.ndarray,
                       patch_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ManyAR_PatchEmbed (reference patch_embed.py:41-105).

    Args:
      img: (B, H, W, 3) in landscape storage layout (W >= H); portrait images
        are pre-transposed by the data pipeline.
      true_shape: (B, 2) int (height, width) true orientation per sample.

    Returns:
      tokens (B, n_tokens, D), positions (B, n_tokens, 2) int32.
    """
    B, H, W, _ = img.shape
    assert W >= H, f"img must be in landscape storage layout, got H={H} W={W}"
    assert H % patch_size == 0 and W % patch_size == 0
    h, w = H // patch_size, W // patch_size
    n_tokens = h * w

    height, width = true_shape[:, 0], true_shape[:, 1]
    is_portrait = width < height  # (B,)

    # landscape branch: conv on the stored layout, raster (h, w)
    land = conv2d(p, img, stride=patch_size, padding="VALID")  # (B, h, w, D)
    land_tokens = land.reshape(B, n_tokens, -1)

    # portrait branch: conv(img^T, K) = conv(img, K^T)^T, raster (w, h)
    port = conv2d(p, img, stride=patch_size, padding="VALID",
                  transpose_kernel_spatial=True)  # (B, h, w, D)
    port_tokens = jnp.swapaxes(port, 1, 2).reshape(B, n_tokens, -1)

    sel = is_portrait[:, None, None]
    tokens = jnp.where(sel, port_tokens, land_tokens)

    pos_land = jnp.broadcast_to(position_grid(h, w)[None], (B, n_tokens, 2))
    pos_port = jnp.broadcast_to(position_grid(w, h)[None], (B, n_tokens, 2))
    pos = jnp.where(sel, pos_port, pos_land)
    return tokens, pos
