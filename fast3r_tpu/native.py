"""ctypes bindings for the native C++ runtime ops (native/fast3r_native.cpp).

Auto-builds libfast3r_native.so with `make -C native` on first use (g++ +
OpenMP); every entry point has a pure-numpy fallback so the package works
without a toolchain.  See the .cpp header for the design rationale (the TPU
analog of the reference's curope extension lives in fast3r_tpu/ops/rope2d.py;
this library serves the host-side runtime).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfast3r_native.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build_locked() -> bool:
    """Build the .so atomically, serialized across processes.

    The kernels are called from BaseViewDataset.__getitem__ under a spawn
    ProcessPoolExecutor, so first use can race N workers into `make`: without
    serialization a worker may dlopen a half-linked file.  Guard with an
    fcntl.flock on a lockfile, link to a temp name, and os.rename() into
    place (rename is atomic on POSIX, so a concurrent dlopen sees either the
    old file, nothing, or the complete new one).
    """
    try:
        import fcntl
    except ImportError:  # non-POSIX: fall back to unserialized build
        fcntl = None
    lockfile = os.path.join(_NATIVE_DIR, ".build.lock")
    tmp_name = f"libfast3r_native.so.tmp.{os.getpid()}"
    tmp_path = os.path.join(_NATIVE_DIR, tmp_name)
    lock_fd = None
    try:
        if fcntl is not None:
            lock_fd = open(lockfile, "w")
            fcntl.flock(lock_fd, fcntl.LOCK_EX)
        if os.path.exists(_LIB_PATH):  # another worker built it while we waited
            return True
        subprocess.run(["make", "-C", _NATIVE_DIR, f"TARGET={tmp_name}"],
                       check=True, capture_output=True)
        os.rename(tmp_path, _LIB_PATH)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        return False
    finally:
        if os.path.exists(tmp_path):
            try:
                os.remove(tmp_path)
            except OSError:
                pass
        if lock_fd is not None:
            lock_fd.close()


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not _build_locked():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.rope2d_forward.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float, ctypes.c_float,
    ]
    lib.img_normalize_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.pointmap_from_depth.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rope2d_native(tokens: np.ndarray, positions: np.ndarray,
                  base: float = 100.0, forward: bool = True) -> np.ndarray:
    """2D RoPE on (B, H, N, D) float32 tokens; positions (B, N, 2) int.

    forward=False applies the inverse rotation (the curope backward trick,
    curope2d.py:29-36).  Falls back to the jnp implementation without the lib.
    """
    lib = _load()
    tokens = np.ascontiguousarray(tokens, np.float32)
    positions = np.ascontiguousarray(positions, np.int64)
    if lib is None:
        import jax.numpy as jnp

        from fast3r_tpu.ops.rope2d import apply_rope2d_positions

        t = apply_rope2d_positions(jnp.asarray(tokens),
                                   jnp.asarray(-positions if not forward
                                               else positions), base)
        return np.asarray(t)
    out = tokens.copy()
    B, H, N, D = out.shape
    lib.rope2d_forward(
        _fptr(out), positions.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        B, H, N, D, ctypes.c_float(base),
        ctypes.c_float(1.0 if forward else -1.0),
    )
    return out


def img_normalize_native(img_u8: np.ndarray) -> np.ndarray:
    """uint8 (..., 3) -> float32 in [-1, 1] (the ImgNorm transform)."""
    lib = _load()
    img_u8 = np.ascontiguousarray(img_u8, np.uint8)
    if lib is None:
        return (img_u8.astype(np.float32) / 255.0 - 0.5) / 0.5
    out = np.empty(img_u8.shape, np.float32)
    lib.img_normalize_u8(
        img_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _fptr(out),
        img_u8.size,
    )
    return out


def pointmap_from_depth_native(
    depth: np.ndarray, intrinsics: np.ndarray,
    camera_pose: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(H, W) depth -> (pts3d (H, W, 3), valid (H, W) bool)."""
    lib = _load()
    depth = np.ascontiguousarray(depth, np.float32)
    K = np.ascontiguousarray(intrinsics, np.float32)
    # the native kernel reads only fx/fy/cx/cy; mirror the numpy path's
    # zero-skew contract (reference geometry.py:199-200) instead of silently
    # producing wrong pointmaps for skewed intrinsics
    assert K[0, 1] == 0.0 and K[1, 0] == 0.0, (
        f"intrinsics must have zero skew, got {K[:2, :2]}"
    )
    if lib is None:
        from fast3r_tpu.data.base import (
            depthmap_to_absolute_camera_coordinates_np,
        )

        return depthmap_to_absolute_camera_coordinates_np(
            depth, K, camera_pose)
    H, W = depth.shape
    pts = np.empty((H, W, 3), np.float32)
    valid = np.empty((H, W), np.uint8)
    pose_ptr = None
    if camera_pose is not None and np.isfinite(camera_pose).all():
        pose = np.ascontiguousarray(camera_pose, np.float32)
        pose_ptr = _fptr(pose)
    lib.pointmap_from_depth(_fptr(depth), _fptr(K), pose_ptr, H, W,
                            _fptr(pts),
                            valid.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_uint8)))
    return pts, valid.astype(bool)
