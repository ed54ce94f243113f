"""Pose estimation tests: focal recovery, PnP (cv2 + jax), pose metrics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fast3r_tpu.eval.pose import estimate_camera_poses, estimate_poses_jax
from fast3r_tpu.eval.pose_metrics import pose_metrics
from fast3r_tpu.ops.pnp import estimate_focal_weiszfeld


def synthetic_scene(V=4, H=48, W=64, focal=60.0, seed=0, noise=0.0):
    """World points seen by V cameras; pointmaps expressed in view-0's frame
    (the Fast3R global-head convention)."""
    rng = np.random.default_rng(seed)

    def pose(i):
        # small rotations + translations so all views see the scene
        angle = 0.15 * i
        c, s = np.cos(angle), np.sin(angle)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = [0.3 * i, 0.1 * i, -0.2 * i]
        return T

    poses = np.stack([pose(i) for i in range(V)])  # c2w, view-0 = identity
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    depth = 3.0 + rng.uniform(0, 2, size=(V, H, W))
    x_cam = depth * (xs - W / 2) / focal
    y_cam = depth * (ys - H / 2) / focal
    pts_cam = np.stack([x_cam, y_cam, depth], axis=-1)  # (V, H, W, 3)
    pts_world = (
        np.einsum("vik,vhwk->vhwi", poses[:, :3, :3], pts_cam)
        + poses[:, None, None, :3, 3]
    )
    if noise:
        pts_world = pts_world + rng.normal(0, noise, pts_world.shape)
    conf = np.full((V, H, W), 2.0, np.float32)
    return pts_world.astype(np.float32), conf, poses.astype(np.float32)


def test_weiszfeld_recovers_focal():
    focal = 75.0
    pts, conf, _ = synthetic_scene(V=1, focal=focal, noise=0.0)
    est = float(estimate_focal_weiszfeld(jnp.asarray(pts[0]),
                                         jnp.asarray(conf[0])))
    assert abs(est - focal) / focal < 0.01, est


@pytest.mark.parametrize("backend", ["cv2", "jax"])
def test_pnp_recovers_poses(backend):
    focal = 60.0
    pts, conf, gt_poses = synthetic_scene(V=4, focal=focal, noise=0.002)
    preds = [
        {"pts3d_in_other_view": pts[None, v], "conf": conf[None, v]}
        for v in range(pts.shape[0])
    ]
    poses, focals = estimate_camera_poses(preds, backend=backend)
    est = np.stack(poses[0])
    m = pose_metrics(est, gt_poses)
    assert m["RRA_at_5"] == 1.0, m
    assert m["RTA_at_15"] == 1.0, m
    assert abs(focals[0][0] - focal) / focal < 0.05


def test_jax_pose_estimation_jits():
    pts, conf, gt_poses = synthetic_scene(V=3, focal=60.0, noise=0.001)
    f = jax.jit(lambda p, c: estimate_poses_jax(p, c, key=jax.random.key(0)))
    c2w, inl, focal = f(jnp.asarray(pts), jnp.asarray(conf))
    m = pose_metrics(np.asarray(c2w), gt_poses)
    assert m["RRA_at_15"] == 1.0, m
    assert int(inl.min()) > 100


def test_pose_metrics_identity():
    _, _, poses = synthetic_scene(V=5)
    m = pose_metrics(poses, poses)
    assert m["RRA_at_5"] == 1.0 and m["RTA_at_5"] == 1.0
    assert m["mAA_30"] > 0.96
