"""Portrait-orientation + local-head-focal pose-eval parity (VERDICT r4 #2).

Golden harness: imports the reference MultiViewDUSt3RLitModule
(multiview_dust3r_module.py) via ref_loader stubs and checks

  * correct_preds_orientation parity — portrait samples' predicted maps are
    un-transposed identically (module.py:871-938),
  * functional portrait pose recovery — landscape-stored portrait maps fed
    through estimate_camera_poses(views=...) recover the GT poses, while the
    uncorrected path demonstrably does not (the r4 correctness hole),
  * first_view_from_local_head — the focal comes from
    pts3d_local_aligned_to_global + conf_local (module.py:828-831), golden
    against the reference's estimate_camera_poses.
"""

import sys

import numpy as np
import pytest

from fast3r_tpu.eval.pose import (
    correct_preds_orientation,
    estimate_camera_poses,
)
from fast3r_tpu.eval.pose_metrics import pose_metrics

from test_pose import synthetic_scene


@pytest.fixture(scope="module")
def ref_module():
    import torch  # noqa: F401 — ensure torch importable before stubs

    from ref_loader import REF_ROOT, _stub, install_ref_stubs

    install_ref_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

    class _Metric:
        def __init__(self, *a, **k):
            pass

    def _rigid_points_registration(x, y, compute_scaling=True):
        """roma.rigid_points_registration stand-in: standard Umeyama
        (y ~ s R x + t) via torch SVD — roma isn't installed here; the test
        exercises the focal-source selection, not the registration solver."""
        import torch as t_

        xm, ym = x.mean(0), y.mean(0)
        xc, yc = x - xm, y - ym
        cov = yc.T @ xc / x.shape[0]
        U, S, Vt = t_.linalg.svd(cov)
        d = t_.sign(t_.det(U @ Vt))
        D = t_.diag(t_.stack([t_.ones((), dtype=x.dtype),
                              t_.ones((), dtype=x.dtype), d]))
        R = U @ D @ Vt
        var_x = (xc ** 2).sum() / x.shape[0]
        s = ((S * t_.stack([t_.ones((), dtype=x.dtype),
                            t_.ones((), dtype=x.dtype), d])).sum() / var_x
             if compute_scaling else t_.ones((), dtype=x.dtype))
        t = ym - s * (R @ xm)
        return R, t, s

    _stub("roma", rigid_points_registration=_rigid_points_registration)
    _stub("open3d")
    _stub("torchmetrics", MaxMetric=_Metric, MeanMetric=_Metric,
          MinMetric=_Metric, SumMetric=_Metric, Metric=_Metric)
    _stub("torchmetrics.aggregation", BaseAggregator=object)
    _stub("pl_bolts")
    _stub("pl_bolts.optimizers")
    _stub("pl_bolts.optimizers.lr_scheduler",
          LinearWarmupCosineAnnealingLR=object)
    _stub("lightning.pytorch")
    _stub("lightning.pytorch.loggers")
    _stub("lightning.pytorch.loggers.wandb", WandbLogger=object)
    import importlib

    return importlib.import_module("fast3r.models.multiview_dust3r_module")


def _landscape_store(arr_hw):
    """Store a portrait (H>W) per-view map the way the model does: transposed
    to landscape (models/fast3r.py:_run_head_oriented)."""
    return np.ascontiguousarray(np.swapaxes(arr_hw, 0, 1))


def portrait_preds_views(V=4, H=64, W=48, focal=60.0, with_local=False,
                         seed=0):
    """Synthetic portrait scene (true shape H>W) whose pred maps are stored
    landscape-transposed, as fast3r_forward emits them for portrait inputs."""
    pts, conf, gt_poses = synthetic_scene(V=V, H=H, W=W, focal=focal,
                                          seed=seed, noise=0.002)
    if with_local:
        # local head: geometry of a DIFFERENT focal (so the two focal
        # methods give measurably different estimates), under a similarity
        # transform that align_local_pts3d_to_global must undo
        pts_l, _, _ = synthetic_scene(V=V, H=H, W=W, focal=focal * 1.25,
                                      seed=seed, noise=0.002)
    preds = []
    for v in range(V):
        p = {
            "pts3d_in_other_view": _landscape_store(pts[v])[None],
            "conf": _landscape_store(conf[v])[None],
        }
        if with_local:
            p["pts3d_local"] = _landscape_store(pts_l[v] * 0.5 + 0.25)[None]
            p["conf_local"] = _landscape_store(conf[v])[None]
        preds.append(p)
    views = [{"true_shape": np.array([[H, W]], np.int64)} for _ in range(V)]
    return preds, views, gt_poses


def test_correct_preds_orientation_golden(ref_module):
    """Ours vs the reference's in-place correction on a mixed
    portrait/landscape batch (B=2), including the local-head keys."""
    import torch

    rng = np.random.default_rng(0)
    V, H, W = 3, 6, 4  # per-sample stored landscape shape (4, 6)
    true_shape = np.array([[H, W], [W, H]], np.int64)  # s0 portrait, s1 land
    preds_np, preds_t = [], []
    for v in range(V):
        entry_np, entry_t = {}, {}
        for key, ch in (("pts3d_in_other_view", 3), ("conf", 0),
                        ("pts3d_local", 3), ("conf_local", 0),
                        ("pts3d_local_aligned_to_global", 3)):
            shape = (2, W, H) + ((ch,) if ch else ())  # landscape storage
            arr = rng.normal(size=shape).astype(np.float32)
            entry_np[key] = arr.copy()
            entry_t[key] = torch.from_numpy(arr.copy())
        preds_np.append(entry_np)
        preds_t.append(entry_t)
    views_np = [{"true_shape": true_shape.copy()} for _ in range(V)]
    views_t = [{"true_shape": torch.from_numpy(true_shape.copy())}
               for _ in range(V)]

    correct_preds_orientation(preds_np, views_np)
    ref_module.MultiViewDUSt3RLitModule.correct_preds_orientation(
        preds_t, views_t)

    for v in range(V):
        for key in preds_np[v]:
            for b in range(2):
                ours = np.asarray(preds_np[v][key][b])
                ref = preds_t[v][key][b].numpy()
                assert ours.shape == ref.shape, (v, key, b)
                np.testing.assert_array_equal(ours, ref, err_msg=f"{v}/{key}/{b}")

    # idempotence: a second application is a no-op (reference's is NOT —
    # ours guards on the stored-vs-true shape)
    snap = [{k: [np.asarray(a).copy() for a in p[k]] for k in p}
            for p in preds_np]
    correct_preds_orientation(preds_np, views_np)
    for v in range(V):
        for key in preds_np[v]:
            for b in range(2):
                np.testing.assert_array_equal(
                    np.asarray(preds_np[v][key][b]), snap[v][key][b])


@pytest.mark.parametrize("backend", ["cv2", "jax"])
def test_portrait_pose_recovery(backend):
    """Landscape-stored portrait maps + views -> GT poses recovered; the
    uncorrected path (no views) fails — the r4 VERDICT correctness hole."""
    preds, views, gt_poses = portrait_preds_views()

    poses, focals = estimate_camera_poses(preds, views=views, backend=backend)
    m = pose_metrics(np.stack(poses[0]), gt_poses)
    assert m["RRA_at_5"] == 1.0, m
    assert m["RTA_at_15"] == 1.0, m

    poses_bad, _ = estimate_camera_poses(preds, backend=backend)
    m_bad = pose_metrics(np.stack(poses_bad[0]), gt_poses)
    assert m_bad["RRA_at_15"] < 1.0, m_bad  # transposed grid -> wrong poses


def test_portrait_pose_golden_vs_reference(ref_module):
    """Full-path golden: reference align->correct->estimate vs ours with
    views threaded, on the same portrait scene (cv2 backend = same SQPNP)."""
    import torch

    preds, views, gt_poses = portrait_preds_views()
    preds_t = [
        {k: torch.from_numpy(np.asarray(v)) for k, v in p.items()}
        for p in preds
    ]
    views_t = [{"true_shape": torch.from_numpy(v["true_shape"])}
               for v in views]
    ref_module.MultiViewDUSt3RLitModule.correct_preds_orientation(
        preds_t, views_t)
    ref_poses, ref_focals = \
        ref_module.MultiViewDUSt3RLitModule.estimate_camera_poses(
            preds_t, niter_PnP=10,
            focal_length_estimation_method="first_view_from_global_head")

    poses, focals = estimate_camera_poses(preds, views=views, backend="cv2")
    assert abs(focals[0][0] - ref_focals[0][0]) / ref_focals[0][0] < 1e-3
    m_ref = pose_metrics(np.stack(ref_poses[0]), gt_poses)
    m_ours = pose_metrics(np.stack(poses[0]), gt_poses)
    assert m_ref["RRA_at_5"] == m_ours["RRA_at_5"] == 1.0, (m_ref, m_ours)
    for ours, ref in zip(poses[0], ref_poses[0]):
        np.testing.assert_allclose(ours, np.asarray(ref), atol=5e-3)


def test_local_head_focal_golden(ref_module):
    """first_view_from_local_head must source the focal from
    pts3d_local_aligned_to_global + conf_local (module.py:828-831).  The
    local first view gets a DIFFERENT conf map than the global one, so the
    two methods give measurably different focals; golden vs the reference."""
    import torch

    preds, views, gt_poses = portrait_preds_views(with_local=True)
    preds_t = [
        {k: torch.from_numpy(np.asarray(v)) for k, v in p.items()}
        for p in preds
    ]
    views_t = [{"true_shape": torch.from_numpy(v["true_shape"])}
               for v in views]
    # reference path: align -> correct -> estimate (module.py:743-751;
    # align is an instance method that never touches self)
    lit = ref_module.MultiViewDUSt3RLitModule
    lit.align_local_pts3d_to_global(None, preds_t, views_t)
    lit.correct_preds_orientation(preds_t, views_t)
    ref_poses, ref_focals = lit.estimate_camera_poses(
        preds_t, niter_PnP=10,
        focal_length_estimation_method="first_view_from_local_head")

    poses, focals = estimate_camera_poses(
        preds, views=views, backend="cv2",
        focal_length_estimation_method="first_view_from_local_head")
    assert abs(focals[0][0] - ref_focals[0][0]) / ref_focals[0][0] < 2e-2, (
        focals[0][0], ref_focals[0][0])

    # and the local-head method is genuinely distinct from the global one
    # (the local maps encode focal 75 vs the global 60 — a silent global
    # fallback, the r4 defect, would make these equal)
    _, focals_g = estimate_camera_poses(
        preds, views=views, backend="cv2",
        focal_length_estimation_method="first_view_from_global_head")
    assert abs(focals[0][0] - focals_g[0][0]) > 1.0, (
        "local-head focal silently fell back to the global head",
        focals[0][0], focals_g[0][0])
