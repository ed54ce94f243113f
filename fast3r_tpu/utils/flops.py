"""Analytic forward-FLOP accounting for the Fast3R model.

One authoritative counter used by bench.py, BENCHMARKS.md, and the profiling
scripts, so throughput / MFU claims always reconcile against the same model.
Counts every matmul and conv as 2*M*N*K multiply-adds; elementwise work
(softmax, LN, RoPE, activations, postprocess) is excluded — it is HBM-bound,
not MXU-bound, and contributes <1% of arithmetic.

Reference anchors for the architecture being counted:
  encoder  fast3r/models/fast3r.py:499-559 (ViT blocks, RoPE2D)
  decoder  fast3r/models/fast3r.py:654-808 (fused-sequence global attention)
  heads    fast3r/dust3r/heads/dpt_head.py:93, croco/models/dpt_block.py:299
"""

from __future__ import annotations

from typing import Dict

from fast3r_tpu.models.dpt_head import DPTHeadConfig
from fast3r_tpu.models.fast3r import Fast3RConfig


def _vit_block_flops(seq: int, dim: int, mlp_ratio: float = 4.0) -> float:
    """One pre-LN transformer block on a sequence of `seq` tokens.

    qkv (6*S*D^2) + attn out proj (2*S*D^2) + mlp (2 * 2*S*D*rD)
    + attention matmuls QK^T and PV (2 * 2*S^2*D).
    """
    linears = (6 + 2 + 4 * mlp_ratio) * seq * dim * dim
    attn = 4 * seq * seq * dim
    return linears + attn


def encoder_flops_per_image(cfg: Fast3RConfig, height: int, width: int) -> float:
    """CroCo ViT encoder forward FLOPs for one image."""
    e = cfg.encoder
    p = e.patch_size
    seq = (height // p) * (width // p)
    # conv patchify: one (p*p*3 -> D) matmul per patch
    patchify = 2 * seq * (p * p * 3) * e.embed_dim
    blocks = e.depth * _vit_block_flops(seq, e.embed_dim, e.mlp_ratio)
    return patchify + blocks


def decoder_flops(cfg: Fast3RConfig, num_views: int, height: int,
                  width: int) -> Dict[str, float]:
    """Fusion decoder FLOPs over the fused sequence of all views' tokens.

    Returns {"linears", "attention"}: the attention term is quadratic in
    num_views (S = V * patches_per_view), the linears are linear in it.
    """
    d = cfg.decoder
    p = cfg.encoder.patch_size
    seq = num_views * (height // p) * (width // p)
    embed = 2 * seq * d.enc_embed_dim * d.embed_dim  # decoder_embed projection
    linears = embed + d.depth * (6 + 2 + 4 * d.mlp_ratio) * seq * d.embed_dim ** 2
    attention = d.depth * 4 * seq * seq * d.embed_dim
    return {"linears": linears, "attention": attention}


def dpt_head_flops_per_image(cfg: DPTHeadConfig, height: int,
                             width: int) -> float:
    """One DPT head (adapter + refinenet cascade + regression) for one image."""
    p = cfg.patch_size
    nh, nw = height // p, width // p
    npatch = nh * nw
    ld, fd, last = cfg.layer_dims, cfg.feature_dim, cfg.last_dim
    dt = cfg.dim_tokens

    def conv(pixels, kh, kw, cin, cout):
        return 2.0 * pixels * kh * kw * cin * cout

    total = 0.0
    # act_postprocess: 1x1 proj + resample per hook
    total += conv(npatch, 1, 1, dt[0], ld[0])
    total += conv(npatch, 4, 4, ld[0], ld[0])          # x4 transposed conv
    total += conv(npatch, 1, 1, dt[1], ld[1])
    total += conv(npatch, 2, 2, ld[1], ld[1])          # x2 transposed conv
    total += conv(npatch, 1, 1, dt[2], ld[2])
    total += conv(npatch, 1, 1, dt[3], ld[3])
    total += conv(npatch / 4, 3, 3, ld[3], ld[3])      # stride-2 down conv
    # scratch.layerN_rn 3x3 -> feature_dim at {x4, x2, x1, x0.5} grids
    for scale, dim in zip((16, 4, 1, 0.25), ld):
        total += conv(npatch * scale, 3, 3, dim, fd)
    # refinenet cascade: RCU = 2 3x3 convs at fd; out_conv 1x1 after 2x upsample
    rcu = lambda pixels: 2 * conv(pixels, 3, 3, fd, fd)  # noqa: E731
    total += rcu(npatch / 4) + conv(npatch, 1, 1, fd, fd)              # refinenet4
    total += 2 * rcu(npatch) + conv(npatch * 4, 1, 1, fd, fd)          # refinenet3
    total += 2 * rcu(npatch * 4) + conv(npatch * 16, 1, 1, fd, fd)     # refinenet2
    total += 2 * rcu(npatch * 16) + conv(npatch * 64, 1, 1, fd, fd)    # refinenet1
    # regression head at H/2 then H
    half, full = (height // 2) * (width // 2), height * width
    total += conv(half, 3, 3, fd, fd // 2)
    total += conv(full, 3, 3, fd // 2, last)
    total += conv(full, 1, 1, last, cfg.num_channels)
    return total


def fast3r_forward_flops(cfg: Fast3RConfig, num_views: int, height: int,
                         width: int) -> Dict[str, float]:
    """Full-model forward FLOPs for (1, num_views, H, W) input.

    Returns a breakdown dict plus "total" and "per_image"; all values in
    FLOPs (not TFLOPs).
    """
    enc = encoder_flops_per_image(cfg, height, width) * num_views
    dec = decoder_flops(cfg, num_views, height, width)
    n_heads = 2 if cfg.with_local_head else 1
    heads = n_heads * dpt_head_flops_per_image(cfg.head, height, width) * num_views
    total = enc + dec["linears"] + dec["attention"] + heads
    return {
        "encoder": enc,
        "decoder_linears": dec["linears"],
        "decoder_attention": dec["attention"],
        "heads": heads,
        "total": total,
        "per_image": total / num_views,
    }
