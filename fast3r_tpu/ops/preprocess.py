"""On-device image preprocessing: raw uint8 frames -> normalized model input.

North-star clause 1 (BASELINE.json): "fuse the load_images preprocessing
(resize/crop/ImageNet-normalize) with the CroCo ViT-L/16 patch encoder into a
single XLA program".  The host keeps only what it must (file decode + EXIF
transpose); everything after the uint8 pixels — resize, center-crop,
[-1, 1] normalization — is jittable and composes with the encoder into one
program (fast3r_tpu/inference.py inference_from_raw).

Behavioral reference: fast3r/dust3r/utils/image.py:76-159 (load_images).  The
geometry rules are reproduced EXACTLY (they are static given the source shape,
so they become Python-side slice bounds):
  * size == 224: resize the SHORT side to 224 (long edge scaled by the aspect
    ratio), then center square crop;
  * otherwise: resize the LONG side to `size`, center-crop each side to a
    multiple of 16; square results crop to 4:3 unless square_ok.
The resampling filter matches PIL's choice (image.py:82-85): Lanczos-3 when
downscaling, bicubic when upscaling — via jax.image.resize, with a final
round-and-clip emulating PIL's uint8 quantization.  Pixel values differ from
PIL by filter edge handling only; tests/test_preprocess.py gates the error
against the host oracle (utils/image.py, which remains the parity reference).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PreprocessPlan:
    """Static geometry of the preprocessing for one source shape."""

    src_hw: Tuple[int, int]            # raw (H, W) after EXIF/rotation
    pre_crop: Tuple[int, int, int, int]   # (top, left, h, w) before resize
    resized_hw: Tuple[int, int]        # after long-edge resize
    crop: Tuple[int, int, int, int]    # (top, left, h, w) center crop
    upscale: bool                      # bicubic (True) vs lanczos3 (False)

    @property
    def out_hw(self) -> Tuple[int, int]:
        return self.crop[2], self.crop[3]


def _round_half_up(x: float) -> int:
    # python round() is banker's rounding; PIL's size math goes through
    # int(round(...)) which is also banker's — keep identical semantics
    return int(round(x))


def make_plan(src_hw: Tuple[int, int], size: int, square_ok: bool = False,
              crop_to_landscape: bool = False) -> PreprocessPlan:
    """Compute the static resize/crop geometry for one raw (H, W).

    Mirrors load_images (utils/image.py / reference image.py:110-126) step by
    step so the device path lands on identical output shapes.
    """
    H0, W0 = src_hw
    top = left = 0
    H1, W1 = H0, W0
    if crop_to_landscape:
        desired = 4 / 3
        if W0 / H0 > desired:
            w = int(H0 * desired)
            left, top, H1, W1 = (W0 - w) // 2, 0, H0, w
        else:
            h = int(W0 / desired)
            left, top, H1, W1 = 0, (H0 - h) // 2, h, W0
    pre_crop = (top, left, H1, W1)

    if size == 224:
        long_edge = _round_half_up(size * max(W1 / H1, H1 / W1))
    else:
        long_edge = size
    S = max(W1, H1)
    W2 = _round_half_up(W1 * long_edge / S)
    H2 = _round_half_up(H1 * long_edge / S)

    cx, cy = W2 // 2, H2 // 2
    if size == 224:
        half = min(cx, cy)
        crop = (cy - half, cx - half, 2 * half, 2 * half)
    else:
        halfw, halfh = ((2 * cx) // 16) * 8, ((2 * cy) // 16) * 8
        if not square_ok and W2 == H2:
            halfh = 3 * halfw // 4
        crop = (cy - halfh, cx - halfw, 2 * halfh, 2 * halfw)

    return PreprocessPlan(
        src_hw=(H0, W0), pre_crop=pre_crop, resized_hw=(H2, W2), crop=crop,
        upscale=S <= long_edge,
    )


def preprocess_device(imgs_u8: jnp.ndarray, plan: PreprocessPlan,
                      dtype=jnp.float32) -> jnp.ndarray:
    """Jittable: (V, H0, W0, 3) uint8 -> (V, h, w, 3) in [-1, 1].

    All shapes are static (from `plan`); safe to call inside jit and compose
    with the encoder into one XLA program.
    """
    V = imgs_u8.shape[0]
    assert imgs_u8.shape[1:] == (*plan.src_hw, 3), (
        f"{imgs_u8.shape} vs plan {plan.src_hw}")
    t, l, h, w = plan.pre_crop
    x = jax.lax.slice(imgs_u8, (0, t, l, 0), (V, t + h, l + w, 3))
    x = x.astype(jnp.float32)
    H2, W2 = plan.resized_hw
    method = "cubic" if plan.upscale else "lanczos3"
    x = jax.image.resize(x, (V, H2, W2, 3), method=method, antialias=True)
    # PIL quantizes the resampled image back to uint8
    x = jnp.clip(jnp.round(x), 0.0, 255.0)
    t, l, h, w = plan.crop
    x = jax.lax.slice(x, (0, t, l, 0), (V, t + h, l + w, 3))
    # ImgNorm: /255, Normalize(0.5, 0.5) -> [-1, 1]
    return ((x / 255.0 - 0.5) / 0.5).astype(dtype)
