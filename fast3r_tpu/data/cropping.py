"""Image/depthmap joint crop-resize with intrinsics bookkeeping.

Behavioral reference: fast3r/dust3r/datasets/utils/cropping.py (whole file)
and the colmap/opencv principal-point convention helpers
(dust3r/utils/geometry.py:248-273).  Pure host-side preprocessing: PIL for
images (Lanczos downscale / bicubic upscale), cv2 nearest-neighbor for depth.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import PIL.Image

LANCZOS = PIL.Image.Resampling.LANCZOS
BICUBIC = PIL.Image.Resampling.BICUBIC


def colmap_to_opencv_intrinsics(K: np.ndarray) -> np.ndarray:
    """Colmap puts the top-left pixel center at (0.5, 0.5); OpenCV at (0, 0)."""
    K = K.copy()
    K[0, 2] -= 0.5
    K[1, 2] -= 0.5
    return K


def opencv_to_colmap_intrinsics(K: np.ndarray) -> np.ndarray:
    K = K.copy()
    K[0, 2] += 0.5
    K[1, 2] += 0.5
    return K


def camera_matrix_of_crop(
    input_camera_matrix: np.ndarray,
    input_resolution,
    output_resolution,
    scaling: float = 1.0,
    offset_factor: float = 0.5,
    offset=None,
) -> np.ndarray:
    """Intrinsics after scale + centered crop (reference cropping.py:96-109)."""
    margins = np.asarray(input_resolution) * scaling - np.asarray(output_resolution)
    assert np.all(margins >= 0.0)
    if offset is None:
        offset = offset_factor * margins
    K = opencv_to_colmap_intrinsics(input_camera_matrix)
    K[:2, :] *= scaling
    K[:2, 2] -= offset
    return colmap_to_opencv_intrinsics(K)


def crop_image_depthmap(
    image: PIL.Image.Image,
    depthmap: Optional[np.ndarray],
    camera_intrinsics: np.ndarray,
    crop_bbox: Tuple[int, int, int, int],
):
    """Crop view + shift principal point (reference cropping.py:112-127)."""
    l, t, r, b = crop_bbox
    image = image.crop((l, t, r, b))
    if depthmap is not None:
        depthmap = depthmap[t:b, l:r]
    K = camera_intrinsics.copy()
    K[0, 2] -= l
    K[1, 2] -= t
    return image, depthmap, K


def rescale_image_depthmap(
    image: PIL.Image.Image,
    depthmap: Optional[np.ndarray],
    camera_intrinsics: np.ndarray,
    output_resolution,
    force: bool = True,
):
    """Jointly rescale so (out_w, out_h) >= output_resolution
    (reference cropping.py:62-93): Lanczos down / bicubic up for the image,
    nearest for the depthmap."""
    import cv2

    if not isinstance(image, PIL.Image.Image):
        image = PIL.Image.fromarray(image)
    input_resolution = np.array(image.size)  # (W, H)
    output_resolution = np.array(output_resolution)
    if depthmap is not None:
        assert tuple(depthmap.shape[:2]) == image.size[::-1]
    scale_final = max(output_resolution / image.size) + 1e-8
    if scale_final >= 1 and not force:
        return image, depthmap, camera_intrinsics
    output_resolution = np.floor(input_resolution * scale_final).astype(int)

    image = image.resize(tuple(output_resolution),
                         resample=LANCZOS if scale_final < 1 else BICUBIC)
    if depthmap is not None:
        depthmap = cv2.resize(depthmap, tuple(output_resolution),
                              fx=scale_final, fy=scale_final,
                              interpolation=cv2.INTER_NEAREST)
    K = camera_matrix_of_crop(camera_intrinsics, input_resolution,
                              output_resolution, scaling=scale_final)
    return image, depthmap, K


def bbox_from_intrinsics_in_out(
    input_camera_matrix: np.ndarray,
    output_camera_matrix: np.ndarray,
    output_resolution,
) -> Tuple[int, int, int, int]:
    out_width, out_height = output_resolution
    l, t = np.int32(
        np.round(input_camera_matrix[:2, 2] - output_camera_matrix[:2, 2])
    )
    return (l, t, l + out_width, t + out_height)
