"""DPT pixelwise regression head (pointmap + confidence).

Behavioral reference:
  * fast3r/dust3r/heads/dpt_head.py:28-129 (DPTOutputAdapter_fix /
    PixelwiseTaskWithDPT),
  * fast3r/croco/models/dpt_block.py:29-534 (make_scratch,
    ResidualConvUnit_custom, FeatureFusionBlock_custom, DPTOutputAdapter),
  * head factory dims: fast3r/models/fast3r.py:134-155 — feature_dim=256,
    last_dim=128, layer_dims=[96,192,384,768], num_channels=3+conf,
    hooks [0, d/2, 3d/4, d] with dim_tokens [enc_dim, dec_dim, dec_dim, dec_dim].

Pipeline (token grids at patch stride 16, sizes for input H x W):
  hook tokens -> 1x1 conv to layer_dims[i] -> resample {x4, x2, x1, x0.5}
  -> 3x3 conv (no bias) to 256 -> refinenet cascade (residual conv units +
  2x align-corners-true bilinear upsample + 1x1 out conv) -> regression head
  (3x3 conv 256->128, 2x upsample, 3x3 conv 128->128, ReLU, 1x1 conv ->4).

All convs are NHWC; bilinear upsamples are separable matmuls
(fast3r_tpu/ops/resize.py) so the whole head is MXU work.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from fast3r_tpu.nn.layers import (
    Params,
    conv2d,
    conv_transpose2d,
    init_conv,
)
from fast3r_tpu.ops.postprocess import postprocess
from fast3r_tpu.ops.resize import resize_bilinear_align_corners, upsample2x_align_corners


@dataclasses.dataclass(frozen=True)
class DPTHeadConfig:
    """head_args of the reference (configs/model/fast3r.yaml)."""

    patch_size: int = 16
    num_channels: int = 4  # 3 (xyz) + 1 (conf)
    feature_dim: int = 256
    last_dim: int = 128
    layer_dims: Tuple[int, int, int, int] = (96, 192, 384, 768)
    dim_tokens: Tuple[int, int, int, int] = (1024, 1024, 1024, 1024)
    depth_mode: Tuple = ("exp", -float("inf"), float("inf"))
    conf_mode: Tuple = ("exp", 1.0, float("inf"))


def init_dpt_head(key, cfg: DPTHeadConfig, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 32))
    ld = cfg.layer_dims
    fd = cfg.feature_dim

    def rcu(k):
        k1, k2 = jax.random.split(k)
        return {
            "conv1": init_conv(k1, 3, 3, fd, fd, dtype=dtype),
            "conv2": init_conv(k2, 3, 3, fd, fd, dtype=dtype),
        }

    def refinenet(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "rcu1": rcu(k1),
            "rcu2": rcu(k2),
            "out_conv": init_conv(k3, 1, 1, fd, fd, dtype=dtype),
        }

    return {
        # act_postprocess (dpt_block.py:416-490)
        "act1": {
            "proj": init_conv(next(ks), 1, 1, cfg.dim_tokens[0], ld[0], dtype=dtype),
            "up": init_conv(next(ks), 4, 4, ld[0], ld[0], dtype=dtype),
        },
        "act2": {
            "proj": init_conv(next(ks), 1, 1, cfg.dim_tokens[1], ld[1], dtype=dtype),
            "up": init_conv(next(ks), 2, 2, ld[1], ld[1], dtype=dtype),
        },
        "act3": {
            "proj": init_conv(next(ks), 1, 1, cfg.dim_tokens[2], ld[2], dtype=dtype),
        },
        "act4": {
            "proj": init_conv(next(ks), 1, 1, cfg.dim_tokens[3], ld[3], dtype=dtype),
            "down": init_conv(next(ks), 3, 3, ld[3], ld[3], dtype=dtype),
        },
        # scratch.layerN_rn: 3x3, no bias (dpt_block.py:42-77)
        "layer_rn": [
            init_conv(next(ks), 3, 3, ld[i], fd, bias=False, dtype=dtype)
            for i in range(4)
        ],
        "refinenet": [refinenet(next(ks)) for _ in range(4)],  # index 0 = refinenet1
        # regression head (dpt_block.py:365-382)
        "head": {
            "conv1": init_conv(next(ks), 3, 3, fd, fd // 2, dtype=dtype),
            "conv2": init_conv(next(ks), 3, 3, fd // 2, cfg.last_dim, dtype=dtype),
            "conv3": init_conv(next(ks), 1, 1, cfg.last_dim, cfg.num_channels, dtype=dtype),
        },
    }


def _residual_conv_unit(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """ReLU-conv-ReLU-conv + skip (dpt_block.py:91-154, bn=False)."""
    out = jax.nn.relu(x)
    out = conv2d(p["conv1"], out, padding=[(1, 1), (1, 1)])
    out = jax.nn.relu(out)
    out = conv2d(p["conv2"], out, padding=[(1, 1), (1, 1)])
    return out + x


def _fusion_block(p: Params, x: jnp.ndarray, skip=None) -> jnp.ndarray:
    """FeatureFusionBlock_custom (dpt_block.py:157-250, width_ratio=1)."""
    if skip is not None:
        x = x + _residual_conv_unit(p["rcu1"], skip)
    x = _residual_conv_unit(p["rcu2"], x)
    x = upsample2x_align_corners(x)
    return conv2d(p["out_conv"], x, padding="VALID")


def dpt_head_forward(
    params: Params,
    cfg: DPTHeadConfig,
    hook_tokens: Sequence[jnp.ndarray],
    image_hw: Tuple[int, int],
) -> Dict[str, jnp.ndarray]:
    """Run the DPT head on the 4 hooked token sets.

    Args:
      hook_tokens: 4 arrays (B, P, dim_tokens[i]) in patch raster order.
      image_hw: static (H, W) of the target image.

    Returns:
      {"pts3d": (B, H, W, 3), "conf": (B, H, W)} after postprocess.
    """
    H, W = image_hw
    nh, nw = H // cfg.patch_size, W // cfg.patch_size

    grids = [
        t.reshape(t.shape[0], nh, nw, t.shape[-1]) for t in hook_tokens
    ]

    l1 = conv_transpose2d(
        params["act1"]["up"],
        conv2d(params["act1"]["proj"], grids[0], padding="VALID"),
        stride=4,
    )  # (B, 4nh, 4nw, 96)
    l2 = conv_transpose2d(
        params["act2"]["up"],
        conv2d(params["act2"]["proj"], grids[1], padding="VALID"),
        stride=2,
    )  # (B, 2nh, 2nw, 192)
    l3 = conv2d(params["act3"]["proj"], grids[2], padding="VALID")  # (B, nh, nw, 384)
    l4 = conv2d(
        params["act4"]["down"],
        conv2d(params["act4"]["proj"], grids[3], padding="VALID"),
        stride=2, padding=[(1, 1), (1, 1)],
    )  # (B, ceil(nh/2), ceil(nw/2), 768)

    layers = [l1, l2, l3, l4]
    layers = [
        conv2d(params["layer_rn"][i], layers[i], padding=[(1, 1), (1, 1)])
        for i in range(4)
    ]

    rn = params["refinenet"]
    path4 = _fusion_block(rn[3], layers[3])
    # crop the x2 upsample of the ceil'ed half grid back to layer3's size
    # (dpt_head.py:69-71)
    path4 = path4[:, : layers[2].shape[1], : layers[2].shape[2], :]
    path3 = _fusion_block(rn[2], path4, layers[2])
    path2 = _fusion_block(rn[1], path3, layers[1])
    path1 = _fusion_block(rn[0], path2, layers[0])  # (B, H/2, W/2, 256)

    hp = params["head"]
    x = None
    if jax.default_backend() == "tpu":
        # fused conv1 -> resize -> conv2 -> relu -> conv3 head trunk
        # (ops/trunk_kernel.py): the intermediates (incl. the full-res
        # 128-channel trunk output) never touch HBM and the convs dodge
        # XLA's in-context fusion-boundary relayouts
        from fast3r_tpu.ops.postprocess import postprocess_transposed
        from fast3r_tpu.ops.trunk_kernel import (
            fused_regression_head_t, trunk_kernel_supported)

        if (hp["conv1"]["w"].shape[-1] == hp["conv2"]["w"].shape[-1]
                and trunk_kernel_supported(path1.shape, H, W, path1.dtype,
                                           c1=hp["conv1"]["w"].shape[-1],
                                           c3=hp["conv3"]["w"].shape[-1])):
            # keep the kernel's transposed (B, c3, H*W) layout through the
            # postprocess so the (B, H*W, c3) relayout never happens
            xt = fused_regression_head_t(
                path1, hp["conv1"]["w"].astype(path1.dtype),
                hp["conv1"]["b"].astype(path1.dtype),
                hp["conv2"]["w"].astype(path1.dtype),
                hp["conv2"]["b"].astype(path1.dtype),
                hp["conv3"]["w"].astype(path1.dtype),
                hp["conv3"]["b"].astype(path1.dtype), H, W)
            return postprocess_transposed(xt, cfg.depth_mode, cfg.conf_mode,
                                          H, W)
    if x is None:
        x = conv2d(hp["conv1"], path1, padding=[(1, 1), (1, 1)])
        x = resize_bilinear_align_corners(x, H, W)
        x = conv2d(hp["conv2"], x, padding=[(1, 1), (1, 1)])
        x = jax.nn.relu(x)
        x = conv2d(hp["conv3"], x, padding="VALID")  # (B, H, W, 4)

    return postprocess(x, cfg.depth_mode, cfg.conf_mode)
