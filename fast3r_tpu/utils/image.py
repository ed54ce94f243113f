"""Image loading / preprocessing for inference.

Behavioral reference: fast3r/dust3r/utils/image.py:66-159 (load_images,
_resize_pil_image, ImgNorm, rgb).  Same contract: folder or list of paths ->
list of view dicts with a normalized image in [-1, 1], ``true_shape``, idx,
instance.  Resize rules preserved exactly:
  * size==224: resize SHORT side to 224 (long-edge resize by the AR factor),
    then center square crop;
  * otherwise: resize LONG side to `size`, center-crop each side to a multiple
    of 16; square images get cropped to 4:3 unless square_ok.

Differences from the reference: images are channel-last (H, W, 3) numpy
float32 (the TPU layout) instead of torch (1, 3, H, W); HEIF support is gated
on pillow_heif availability the same way.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence, Union

import numpy as np
import PIL.Image
from PIL.ImageOps import exif_transpose

try:  # optional, as in the reference
    from pillow_heif import register_heif_opener

    register_heif_opener()
    HEIF_SUPPORT = True
except ImportError:
    HEIF_SUPPORT = False


def img_norm(img: PIL.Image.Image) -> np.ndarray:
    """ToTensor + Normalize(0.5, 0.5): uint8 -> float32 in [-1, 1], (H, W, 3).

    Uses the OpenMP C++ kernel (fast3r_tpu/native.py) when built — this is the
    data loader's hot per-pixel path.
    """
    arr = np.asarray(img)
    if arr.dtype == np.uint8:
        from fast3r_tpu.native import img_normalize_native

        return img_normalize_native(arr)
    return (arr.astype(np.float32) / 255.0 - 0.5) / 0.5


def unnormalize_rgb(img: np.ndarray) -> np.ndarray:
    """Inverse of img_norm, clipped to [0, 1] (reference rgb(), image.py:48-64)."""
    return np.clip(img * 0.5 + 0.5, 0.0, 1.0)


def _resize_pil_image(img: PIL.Image.Image, long_edge_size: int) -> PIL.Image.Image:
    S = max(img.size)
    interp = PIL.Image.LANCZOS if S > long_edge_size else PIL.Image.BICUBIC
    new_size = tuple(int(round(x * long_edge_size / S)) for x in img.size)
    return img.resize(new_size, interp)


def load_images_raw(
    folder_or_list: Union[str, Sequence],
    verbose: bool = True,
    rotate_clockwise_90: bool = False,
) -> List[np.ndarray]:
    """Host-minimal ingest: decode + EXIF transpose ONLY -> uint8 (H, W, 3).

    Everything downstream (resize/crop/normalize) runs on device fused with
    the encoder (ops/preprocess.py + inference.inference_from_raw) — the
    north-star ingest path.  load_images() below remains the PIL parity
    oracle.
    """
    if isinstance(folder_or_list, str):
        root, folder_content = folder_or_list, sorted(os.listdir(folder_or_list))
    else:
        root, folder_content = "", list(folder_or_list)
    exts = [".jpg", ".jpeg", ".png"] + ([".heic", ".heif"] if HEIF_SUPPORT else [])
    frames = []
    for path in folder_content:
        if isinstance(path, PIL.Image.Image):
            img = path.convert("RGB")
        else:
            if not str(path).lower().endswith(tuple(exts)):
                continue
            img = exif_transpose(
                PIL.Image.open(os.path.join(root, path))
            ).convert("RGB")
        if rotate_clockwise_90:
            img = img.rotate(-90, expand=True)
        frames.append(np.asarray(img, np.uint8))
    assert frames, "no images found at " + str(root)
    if verbose:
        print(f" (Decoded {len(frames)} raw frames)")
    return frames


def load_images(
    folder_or_list: Union[str, Sequence],
    size: int,
    square_ok: bool = False,
    verbose: bool = True,
    rotate_clockwise_90: bool = False,
    crop_to_landscape: bool = False,
) -> List[Dict]:
    """Open and preprocess images into the Fast3R input format."""
    if isinstance(folder_or_list, str):
        if verbose:
            print(f">> Loading images from {folder_or_list}")
        root, folder_content = folder_or_list, sorted(os.listdir(folder_or_list))
    elif isinstance(folder_or_list, (list, tuple)):
        if verbose:
            print(f">> Loading a list of {len(folder_or_list)} images")
        root, folder_content = "", list(folder_or_list)
    else:
        raise ValueError(f"bad folder_or_list={folder_or_list!r}")

    exts = [".jpg", ".jpeg", ".png"]
    if HEIF_SUPPORT:
        exts += [".heic", ".heif"]

    imgs = []
    for path in folder_content:
        if isinstance(path, PIL.Image.Image):
            img = path
        else:
            if not str(path).lower().endswith(tuple(exts)):
                continue
            img = exif_transpose(
                PIL.Image.open(os.path.join(root, path))
            ).convert("RGB")
        if rotate_clockwise_90:
            img = img.rotate(-90, expand=True)
        if crop_to_landscape:
            desired = 4 / 3
            width, height = img.size
            if width / height > desired:
                new_w = int(height * desired)
                left = (width - new_w) // 2
                box = (left, 0, left + new_w, height)
            else:
                new_h = int(width / desired)
                top = (height - new_h) // 2
                box = (0, top, width, top + new_h)
            img = img.crop(box)

        W1, H1 = img.size
        if size == 224:
            # resize short side to 224
            img = _resize_pil_image(img, round(size * max(W1 / H1, H1 / W1)))
        else:
            img = _resize_pil_image(img, size)
        W, H = img.size
        cx, cy = W // 2, H // 2
        if size == 224:
            half = min(cx, cy)
            img = img.crop((cx - half, cy - half, cx + half, cy + half))
        else:
            halfw, halfh = ((2 * cx) // 16) * 8, ((2 * cy) // 16) * 8
            if not square_ok and W == H:
                halfh = 3 * halfw / 4
            img = img.crop((cx - halfw, cy - halfh, cx + halfw, cy + halfh))

        W2, H2 = img.size
        if verbose:
            print(f" - adding {path} with resolution {W1}x{H1} --> {W2}x{H2}")
        imgs.append(dict(
            img=img_norm(img)[None],                       # (1, H, W, 3)
            true_shape=np.int32([img.size[::-1]]),         # (1, 2) = (h, w)
            idx=len(imgs),
            instance=str(len(imgs)),
        ))

    assert imgs, "no images found at " + str(root)
    if verbose:
        print(f" (Found {len(imgs)} images)")
    return imgs
