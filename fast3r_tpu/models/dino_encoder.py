"""DINOv2-style alternative image encoder.

Behavioral reference: fast3r/models/fast3r.py:561-651 (DinoEncoder): a frozen
torch.hub DINOv2 ViT-L/14 producing x_norm_patchtokens; portrait images are
transposed to their true orientation before encoding and the patch grid is
un-transposed after (:601-632).

The reference pulls weights from torch.hub at construction — unavailable in
closed environments, so here the architecture is implemented natively
(ViT-L/14: patch embed + cls token + learned pos embeds with bicubic
interpolation + pre-LN blocks with LayerScale) and weights load from a local
DINOv2 state_dict when provided (`load_dinov2_state_dict`).  Construction
with random weights works for architecture tests.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fast3r_tpu.models.patch_embed import position_grid
from fast3r_tpu.nn.layers import (
    Params,
    attention_layer,
    init_conv,
    init_layernorm,
    init_linear,
    init_vit_stack,
    layernorm,
    linear,
    mlp,
)
from fast3r_tpu.ops.attention import dot_product_attention
from fast3r_tpu.ops.resize import resize_bicubic_torch


@dataclasses.dataclass(frozen=True)
class DinoEncoderConfig:
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    pos_embed_size: int = 37  # 518/14 grid of the pretrained model
    ln_eps: float = 1e-6
    attn_impl: str = "xla"


def init_dino_encoder(key, cfg: DinoEncoderConfig, dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n = cfg.pos_embed_size
    params = {
        "patch_embed": init_conv(k1, cfg.patch_size, cfg.patch_size, 3,
                                 cfg.embed_dim, dtype=dtype),
        "cls_token": jnp.zeros((1, 1, cfg.embed_dim), dtype),
        "pos_embed": jax.random.normal(k3, (1, n * n + 1, cfg.embed_dim),
                                       dtype) * 0.02,
        "blocks": init_vit_stack(k2, cfg.depth, cfg.embed_dim, cfg.num_heads,
                                 cfg.mlp_ratio, qkv_bias=True, dtype=dtype),
        # DINOv2 LayerScale gammas (init 1e-5 in the pretrained model; ones
        # here so random init behaves like a plain ViT)
        "ls1": jnp.ones((cfg.depth, cfg.embed_dim), dtype),
        "ls2": jnp.ones((cfg.depth, cfg.embed_dim), dtype),
        "norm": init_layernorm(cfg.embed_dim, dtype),
    }
    return params


def _interp_pos_embed(pos_embed: jnp.ndarray, grid_hw: Tuple[int, int],
                      src_size: int) -> jnp.ndarray:
    """Bicubic-interpolate the learned patch pos embeds to the target grid
    with hub-DINOv2 numerics (vision_transformer.py interpolate_pos_encoding):
    torch bicubic A=-0.75, align_corners=False, no antialias, and the
    ``scale_factor=(n_out + 0.1)/M`` coordinate mapping (interpolate_offset).
    jax.image.resize would diverge (it uses the A=-0.5 cubic kernel)."""
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:].reshape(1, src_size, src_size, -1)
    h, w = grid_hw
    if (h, w) != (src_size, src_size):
        patch_pe = resize_bicubic_torch(
            patch_pe, h, w,
            scale_factors=((h + 0.1) / src_size, (w + 0.1) / src_size))
    return jnp.concatenate([cls_pe, patch_pe.reshape(1, h * w, -1)], axis=1)


def _dino_block(p, x, gamma1, gamma2, num_heads, scale, attn_impl, ln_eps):
    x = x + gamma1 * attention_layer(
        p["attn"], layernorm(p["norm1"], x, ln_eps), num_heads, scale,
        None, attn_impl)
    x = x + gamma2 * mlp(p["mlp"], layernorm(p["norm2"], x, ln_eps))
    return x


def dino_encoder_forward(
    params: Params, cfg: DinoEncoderConfig, img: jnp.ndarray,
    true_shape: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode (B, H, W, 3); portrait samples (per true_shape) are transposed
    before encoding and their patch grid un-transposed after
    (reference fast3r.py:601-632) — implemented with the static dual-branch
    select (see patch_embed.patch_embed_manyar).

    Returns (x_norm_patchtokens (B, P, D), positions (B, P, 2)).
    """
    B, H, W, _ = img.shape
    ps = cfg.patch_size
    assert H % ps == 0 and W % ps == 0, (H, W, ps)
    h, w = H // ps, W // ps

    if true_shape is None:
        true_shape = jnp.broadcast_to(jnp.array([H, W], jnp.int32)[None],
                                      (B, 2))
    is_portrait = true_shape[:, 1] < true_shape[:, 0]

    def embed(images, gh, gw):
        """Patch conv + cls + interpolated pos embed (orientation-specific)."""
        x = jax.lax.conv_general_dilated(
            images, params["patch_embed"]["w"].astype(images.dtype),
            (ps, ps), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params["patch_embed"]["b"].astype(images.dtype)
        x = x.reshape(B, gh * gw, -1)
        cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                               (B, 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
        return x + _interp_pos_embed(params["pos_embed"], (gh, gw),
                                     cfg.pos_embed_size).astype(x.dtype)

    # the transformer stack is position-free (no RoPE), so only the cheap
    # patch-embed stage is computed per orientation and selected per sample;
    # the 24-block stack then runs ONCE on the selected tokens
    land = embed(img, h, w)                               # (B, 1+h*w, D)
    port = embed(jnp.swapaxes(img, 1, 2), w, h)           # (B, 1+w*h, D)
    # un-transpose the portrait patch grid to STORAGE order — the reference
    # returns portrait features re-transposed (fast3r.py:617-632); doing it
    # before the stack is equivalent (per-token ops + full attention are
    # permutation-equivariant) and lets one stack serve both branches
    tok_p = port[:, 1:].reshape(B, w, h, -1)
    tok_p = jnp.swapaxes(tok_p, 1, 2).reshape(B, h * w, -1)
    port = jnp.concatenate([port[:, :1], tok_p], axis=1)
    sel3 = is_portrait[:, None, None]
    x = jnp.where(sel3, port, land)

    scale = (cfg.embed_dim // cfg.num_heads) ** -0.5

    def body(carry, layer):
        lp, g1, g2 = layer
        return _dino_block(lp, carry, g1, g2, cfg.num_heads, scale,
                           cfg.attn_impl, cfg.ln_eps), None

    x, _ = jax.lax.scan(
        body, x, (params["blocks"], params["ls1"], params["ls2"]))
    x = layernorm(params["norm"], x, cfg.ln_eps)
    tokens = x[:, 1:]  # x_norm_patchtokens
    sel = sel3

    pos_land = jnp.broadcast_to(position_grid(h, w)[None], (B, h * w, 2))
    # portrait positions: true-orientation (y, x) values, storage sequence
    # order (matching the token un-transpose above / reference :627-632)
    pp = position_grid(w, h).reshape(w, h, 2)
    pos_port = jnp.broadcast_to(
        jnp.swapaxes(pp, 0, 1).reshape(h * w, 2)[None], (B, h * w, 2))
    pos = jnp.where(sel, pos_port, pos_land)
    return tokens, pos


def load_dinov2_state_dict(state_dict, cfg: DinoEncoderConfig) -> Params:
    """Convert a torch DINOv2 ViT state dict (torch.hub dinov2_vitl14 layout)
    into the param pytree."""
    def t(name):
        v = state_dict[name]
        return np.asarray(getattr(v, "numpy", lambda: v)()
                          if hasattr(v, "numpy") else v)

    def layer(i):
        p = f"blocks.{i}."
        return {
            "norm1": {"scale": t(p + "norm1.weight"), "bias": t(p + "norm1.bias")},
            "attn": {
                "qkv": {"w": t(p + "attn.qkv.weight").T,
                        "b": t(p + "attn.qkv.bias")},
                "proj": {"w": t(p + "attn.proj.weight").T,
                         "b": t(p + "attn.proj.bias")},
            },
            "norm2": {"scale": t(p + "norm2.weight"), "bias": t(p + "norm2.bias")},
            "mlp": {
                "fc1": {"w": t(p + "mlp.fc1.weight").T, "b": t(p + "mlp.fc1.bias")},
                "fc2": {"w": t(p + "mlp.fc2.weight").T, "b": t(p + "mlp.fc2.bias")},
            },
        }

    layers = [layer(i) for i in range(cfg.depth)]
    stacked = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *layers)
    return {
        "patch_embed": {
            "w": jnp.asarray(t("patch_embed.proj.weight").transpose(2, 3, 1, 0)),
            "b": jnp.asarray(t("patch_embed.proj.bias")),
        },
        "cls_token": jnp.asarray(t("cls_token")),
        "pos_embed": jnp.asarray(t("pos_embed")),
        "blocks": stacked,
        "ls1": jnp.asarray(np.stack(
            [t(f"blocks.{i}.ls1.gamma") for i in range(cfg.depth)])),
        "ls2": jnp.asarray(np.stack(
            [t(f"blocks.{i}.ls2.gamma") for i in range(cfg.depth)])),
        "norm": {"scale": jnp.asarray(t("norm.weight")),
                 "bias": jnp.asarray(t("norm.bias"))},
    }
