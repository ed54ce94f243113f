"""CroCo ViT image encoder.

Behavioral reference: fast3r/models/fast3r.py:499-559 (CroCoEncoder):
ManyAR patch embed -> depth x pre-LN ViT Block with 2D RoPE (base 100) ->
final LayerNorm(eps=1e-6).  Flagship config (configs/model/fast3r.yaml):
ViT-L/16, embed_dim=1024, depth=24, num_heads=16, qkv_bias=True, mlp_ratio=4.

TPU design notes:
  * all `depth` blocks run under one lax.scan (single trace regardless of depth);
  * RoPE cos/sin are computed once per forward from the patch positions and
    reused by every layer (the reference recomputes per layer from a host cache);
  * images are NHWC.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fast3r_tpu.models.patch_embed import (
    init_patch_embed,
    patch_embed_manyar,
    patch_embed_simple,
)
from fast3r_tpu.nn.layers import (
    Params,
    init_layernorm,
    init_vit_stack,
    layernorm,
    run_vit_stack,
)
from fast3r_tpu.ops.rope2d import rope2d_cos_sin


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Mirrors the reference's encoder_args (configs/model/fast3r.yaml)."""

    img_size: int = 512
    patch_size: int = 16
    patch_embed_cls: str = "ManyAR_PatchEmbed"  # or "PatchEmbedDust3R"
    embed_dim: int = 1024
    num_heads: int = 16
    depth: int = 24
    mlp_ratio: float = 4.0
    rope_base: float = 100.0  # pos_embed="RoPE100"
    # "batched" = the single-program manual-DMA kernel for the per-view
    # heads (ops/batched_attention.py) — beats XLA's HBM-materializing
    # attention in the fused stack on TPU (0.1119 vs 0.124 s/24-block stack,
    # r3); dispatches to "xla" off-TPU and for untileable shapes
    attn_impl: str = "batched"
    ln_eps: float = 1e-6
    # run blocks with LN/GELU/residual fused into the matmul kernels on TPU
    # (nn/fused_block.py); falls back automatically off-TPU / untileable shapes
    fused_blocks: bool = True
    # reference Block dropout knobs (blocks.py:196-239); every shipped
    # reference config sets them to 0.0.  Active only in the training
    # forward (needs the step rng); non-zero rates force the plain block path
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0


def init_encoder(key, cfg: EncoderConfig, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "patch_embed": init_patch_embed(k1, cfg.patch_size, cfg.embed_dim, dtype=dtype),
        "blocks": init_vit_stack(
            k2, cfg.depth, cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
            qkv_bias=True, dtype=dtype,
        ),
        "norm": init_layernorm(cfg.embed_dim, dtype),
    }


def encoder_forward(
    params: Params,
    cfg: EncoderConfig,
    img: jnp.ndarray,
    true_shape: Optional[jnp.ndarray] = None,
    remat: bool = False,
    rng=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Encode a batch of images.

    Args:
      img: (B, H, W, 3), landscape storage layout, values normalized to [-1, 1]
        (the reference ImgNorm transform).
      true_shape: (B, 2) int (height, width); defaults to the storage shape.

    Returns:
      feats (B, P, embed_dim), positions (B, P, 2) int32.
    """
    B, H, W, _ = img.shape
    if true_shape is None:
        true_shape = jnp.broadcast_to(
            jnp.array([H, W], jnp.int32)[None], (B, 2)
        )
    if cfg.patch_embed_cls == "ManyAR_PatchEmbed":
        x, pos = patch_embed_manyar(params["patch_embed"], img, true_shape,
                                    cfg.patch_size)
    else:
        x, pos = patch_embed_simple(params["patch_embed"], img, cfg.patch_size)

    head_dim = cfg.embed_dim // cfg.num_heads
    cos, sin = rope2d_cos_sin(pos, head_dim, cfg.rope_base)
    scale = head_dim ** -0.5
    from fast3r_tpu.nn.fused_block import fused_block_supported

    fused = (cfg.fused_blocks and jax.default_backend() == "tpu"
             and fused_block_supported(
                 x.shape[:2], cfg.embed_dim,
                 int(cfg.embed_dim * cfg.mlp_ratio),
                 itemsize=x.dtype.itemsize))
    x, _ = run_vit_stack(
        params["blocks"], x, cfg.num_heads, scale,
        rope_cos_sin=(cos, sin), attn_impl=cfg.attn_impl, ln_eps=cfg.ln_eps,
        depth=cfg.depth, remat=remat, fused=fused,
        drop=cfg.drop, attn_drop=cfg.attn_drop, droppath=cfg.drop_path,
        rng=rng,
    )
    return layernorm(params["norm"], x, cfg.ln_eps), pos
