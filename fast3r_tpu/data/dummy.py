"""Synthetic multiview data (the reference's DummyMultiview equivalent).

Behavioral reference: fast3r/dust3r/datasets/dummy_multiview.py:11-67 —
random image/depth/pose/intrinsics tensors shaped like a real scene, used for
model/data-pipeline smoke tests without any dataset on disk.

Produces geometrically consistent samples: a random depth map is back-projected
through random-but-valid intrinsics and camera poses, so the world-frame pts3d
+ valid_mask + poses satisfy the contracts the losses expect.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _random_pose(rng) -> np.ndarray:
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = q.astype(np.float32)
    T[:3, 3] = rng.standard_normal(3).astype(np.float32)
    return T


def make_dummy_batch(
    batch_size: int = 1,
    num_views: int = 4,
    height: int = 64,
    width: int = 80,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Batch matching the train_step contract (fast3r_tpu/train/step.py)."""
    rng = np.random.default_rng(seed)
    B, V, H, W = batch_size, num_views, height, width

    imgs = rng.uniform(-1, 1, size=(B, V, H, W, 3)).astype(np.float32)
    true_shapes = np.tile(np.array([H, W], np.int32), (B, V, 1))

    depth = rng.uniform(1.0, 5.0, size=(B, V, H, W)).astype(np.float32)
    # ~10% invalid pixels (depth 0), like real sensor data
    depth *= (rng.random((B, V, H, W)) > 0.1).astype(np.float32)

    f = 0.8 * max(H, W)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    intrinsics = np.tile(K, (B, V, 1, 1))
    poses = np.stack(
        [np.stack([_random_pose(rng) for _ in range(V)]) for _ in range(B)]
    )

    xs, ys = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    x_cam = depth * (xs - W / 2) / f
    y_cam = depth * (ys - H / 2) / f
    pts_cam = np.stack([x_cam, y_cam, depth], axis=-1)  # (B,V,H,W,3)
    pts3d = (
        np.einsum("bvik,bvhwk->bvhwi", poses[..., :3, :3], pts_cam)
        + poses[..., None, None, :3, 3]
    )

    return {
        "imgs": imgs,
        "true_shapes": true_shapes,
        "pts3d": pts3d.astype(np.float32),
        "valid_mask": depth > 0,
        "camera_pose": poses,
        "camera_intrinsics": intrinsics,
        "depthmap": depth,
    }
