"""Image/depth file IO helpers (reference dust3r/utils/image.py:35-45)."""

from __future__ import annotations

import os

os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")

import cv2  # noqa: E402
import numpy as np  # noqa: E402


def imread_cv2(path: str, options=cv2.IMREAD_COLOR) -> np.ndarray:
    """Open an image or depthmap with opencv; RGB order for color images.

    EXR depth maps fall back to the bundled pure-python codec
    (fast3r_tpu/data/exr.py) when this OpenCV build lacks the OpenEXR
    codec (`cv2.getBuildInformation()` OpenEXR: NO)."""
    if str(path).endswith((".exr", "EXR")):
        options = cv2.IMREAD_ANYDEPTH
        img = cv2.imread(str(path), options)
        if img is None:
            from fast3r_tpu.data.exr import read_exr

            img = np.asarray(read_exr(str(path)))
            if img.dtype == np.float16:
                img = img.astype(np.float32)
        return img
    img = cv2.imread(str(path), options)
    if img is None:
        raise IOError(f"Could not load image={path} with {options=}")
    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img
