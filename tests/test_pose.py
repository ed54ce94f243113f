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


def randomized_scene(seed, V=4, H=32, W=48):
    """Randomized camera geometry + realistic degradation: metric-scaled
    gaussian noise, gross outlier points with HIGH confidence (so RANSAC,
    not the conf mask, must reject them), and a low-confidence band."""
    rng = np.random.default_rng(seed)
    focal = float(rng.uniform(40.0, 90.0))

    def rand_pose(i):
        if i == 0:
            return np.eye(4)
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = rng.uniform(0.05, 0.6)
        K = np.array([[0, -axis[2], axis[1]],
                      [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]])
        R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K
        T = np.eye(4)
        T[:3, :3] = R
        # translation with a real baseline (norm 0.5-1.5 at depth ~2-4) so
        # the relative-translation DIRECTION is well conditioned — RTA@15 is
        # meaningless when |t| is at the noise floor
        d = rng.normal(size=3)
        T[:3, 3] = d / np.linalg.norm(d) * rng.uniform(0.5, 1.5)
        return T

    poses = np.stack([rand_pose(i) for i in range(V)])
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    depth = rng.uniform(1.5, 3.0) + rng.uniform(0, 1.5, size=(V, H, W))
    x_cam = depth * (xs - W / 2) / focal
    y_cam = depth * (ys - H / 2) / focal
    pts_cam = np.stack([x_cam, y_cam, depth], axis=-1)
    pts_world = (np.einsum("vik,vhwk->vhwi", poses[:, :3, :3], pts_cam)
                 + poses[:, None, None, :3, 3])
    pts_world += rng.normal(0, 0.01, pts_world.shape) * depth[..., None]
    conf = rng.uniform(1.2, 3.0, (V, H, W)).astype(np.float32)
    # 6% gross outliers that survive the conf>1 mask: depth-error model
    # (point rescaled about the world origin ~ wrong depth for these
    # near-origin cameras; camera-frame z stays bounded away from 0 so focal
    # estimation degrades gracefully, as with real conf-correlated preds)
    out = rng.random((V, H, W)) < 0.06
    n_out = int(out.sum())
    scale = rng.uniform(0.3, 3.0, (n_out, 1))
    pts_world[out] = pts_world[out] * scale + rng.normal(0, 0.5, (n_out, 3))
    conf[out] = rng.uniform(1.05, 1.8, n_out)
    # 20% low-conf pixels (masked out by conf > 1)
    low = rng.random((V, H, W)) < 0.20
    conf[low] = rng.uniform(0.2, 0.9, int(low.sum()))
    return pts_world.astype(np.float32), conf, poses.astype(np.float32)


def test_backend_statistical_parity():
    """VERDICT r1 item 5 gate: over 50 randomized noisy/outlier scenes the
    device RANSAC-PnP matches the cv2 SQPNP oracle at the RRA@15/RTA@15
    level — the statistical evidence for backend='jax' as the default."""
    n_scenes = 50
    acc = {"cv2": {"RRA_at_15": [], "RTA_at_15": []},
           "jax": {"RRA_at_15": [], "RTA_at_15": []}}
    for s in range(n_scenes):
        pts, conf, gt_poses = randomized_scene(seed=1000 + s)
        preds = [
            {"pts3d_in_other_view": pts[None, v], "conf": conf[None, v]}
            for v in range(pts.shape[0])
        ]
        for backend in ("cv2", "jax"):
            poses, _ = estimate_camera_poses(preds, backend=backend, seed=s)
            m = pose_metrics(np.stack(poses[0]), gt_poses)
            for k in acc[backend]:
                acc[backend][k].append(m[k])
    for k in ("RRA_at_15", "RTA_at_15"):
        mean_cv2 = float(np.mean(acc["cv2"][k]))
        mean_jax = float(np.mean(acc["jax"][k]))
        # one-sided: the device backend must not trail the oracle beyond
        # noise (beating it is a pass), plus an absolute quality floor
        assert mean_jax >= mean_cv2 - 0.05, (k, mean_cv2, mean_jax)
        assert mean_jax >= 0.90, (k, mean_jax)


def test_default_backend_is_device():
    import inspect

    sig = inspect.signature(estimate_camera_poses)
    assert sig.parameters["backend"].default == "jax"


def test_pose_metrics_identity():
    _, _, poses = synthetic_scene(V=5)
    m = pose_metrics(poses, poses)
    assert m["RRA_at_5"] == 1.0 and m["RTA_at_5"] == 1.0
    assert m["mAA_30"] > 0.96
