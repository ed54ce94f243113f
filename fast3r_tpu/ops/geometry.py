"""Geometric primitives: pointmap transforms, camera math.

Behavioral reference: fast3r/dust3r/utils/geometry.py (xy_grid:21, geotrf:55,
inv:126, depthmap_to_camera_coordinates / depthmap_to_absolute_camera_coordinates:221).
Implemented as batched jnp ops (the reference mixes numpy/torch and per-sample
loops); SE(3) inverses use the closed form instead of a general solve.
"""

from __future__ import annotations

import jax.numpy as jnp


def xy_grid(W: int, H: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2) with out[j, i] = (i, j) — pixel x,y coordinates."""
    xs = jnp.arange(W, dtype=dtype)
    ys = jnp.arange(H, dtype=dtype)
    xx, yy = jnp.meshgrid(xs, ys)  # 'xy' indexing
    return jnp.stack([xx, yy], axis=-1)


def geotrf(Trf: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply batched 4x4 (or 3x3) transforms to batched pointmaps.

    Trf: (B, d+1, d+1) or (B, d, d);  pts: (B, ..., d).
    Matches the reference's einsum fast path (geometry.py:78-92).
    """
    d = pts.shape[-1]
    batch = pts.shape[1:-1]
    flat = pts.reshape(pts.shape[0], -1, d)
    if Trf.shape[-1] == d:
        out = jnp.einsum("bij,bnj->bni", Trf, flat)
    elif Trf.shape[-1] == d + 1:
        out = jnp.einsum("bij,bnj->bni", Trf[:, :d, :d], flat) + Trf[:, None, :d, d]
    else:
        raise ValueError(f"bad transform shape {Trf.shape} for pts dim {d}")
    return out.reshape(pts.shape[0], *batch, d)


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (..., 4, 4) rigid transforms."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    ti = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, ti[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], T.dtype), T.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def inv(T: jnp.ndarray) -> jnp.ndarray:
    """General matrix inverse (reference geometry.py:126-133).

    The losses invert camera poses; those are SE(3), but we keep general
    numerics here to match torch.linalg.inv bit-behavior more closely for
    parity tests.  Use :func:`se3_inverse` on hot paths.
    """
    return jnp.linalg.inv(T)


def depthmap_to_camera_coordinates(
    depth: jnp.ndarray, intrinsics: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pinhole back-projection (reference geometry.py:180-219).

    depth: (..., H, W); intrinsics: (..., 3, 3) with zero skew.
    Returns pts_cam (..., H, W, 3) and valid_mask = depth > 0.
    """
    H, W = depth.shape[-2:]
    fx = intrinsics[..., 0, 0][..., None, None]
    fy = intrinsics[..., 1, 1][..., None, None]
    cx = intrinsics[..., 0, 2][..., None, None]
    cy = intrinsics[..., 1, 2][..., None, None]
    grid = xy_grid(W, H, dtype=depth.dtype)
    u = grid[..., 0]
    v = grid[..., 1]
    z = depth
    x = z * (u - cx) / fx
    y = z * (v - cy) / fy
    pts = jnp.stack([x, y, z], axis=-1)
    return pts, depth > 0.0


def depthmap_to_absolute_camera_coordinates(
    depth: jnp.ndarray, intrinsics: jnp.ndarray, camera_pose: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Back-project and move to world frame via cam2world pose
    (reference geometry.py:221-245)."""
    pts_cam, valid = depthmap_to_camera_coordinates(depth, intrinsics)
    R = camera_pose[..., :3, :3]
    t = camera_pose[..., :3, 3]
    pts_world = (
        jnp.einsum("...ik,...hwk->...hwi", R, pts_cam) + t[..., None, None, :]
    )
    return pts_world, valid
