"""Golden parity: training losses vs reference Regr3DMultiviewV4/ConfLossMultiviewV2."""

import sys

import numpy as np
import torch

import jax.numpy as jnp

from tests.ref_loader import REF_ROOT, install_ref_stubs

from fast3r_tpu.train.losses import LossConfig, conf_loss_multiview_v2


def _ref_losses():
    install_ref_stubs()
    for p in (REF_ROOT, REF_ROOT + "/fast3r"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import fast3r.dust3r.losses as L

    return L


def _random_scene(B, V, H, W, seed=0, with_local=True, valid_frac=0.8):
    rng = np.random.default_rng(seed)

    def rand_pose():
        # random rotation via QR + random translation
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        T = np.eye(4, dtype=np.float64)
        T[:3, :3] = q
        T[:3, 3] = rng.standard_normal(3)
        return T

    gts = {
        "pts3d": rng.standard_normal((B, V, H, W, 3)).astype(np.float32) * 2 + 1,
        "valid_mask": rng.random((B, V, H, W)) < valid_frac,
        "camera_pose": np.stack(
            [np.stack([rand_pose() for _ in range(V)]) for _ in range(B)]
        ).astype(np.float32),
    }
    preds = {
        "pts3d_in_other_view": rng.standard_normal((B, V, H, W, 3)).astype(np.float32),
        "conf": (1.0 + np.exp(rng.standard_normal((B, V, H, W)))).astype(np.float32),
    }
    if with_local:
        preds["pts3d_local"] = rng.standard_normal((B, V, H, W, 3)).astype(np.float32)
        preds["conf_local"] = (
            1.0 + np.exp(rng.standard_normal((B, V, H, W)))
        ).astype(np.float32)
    return gts, preds


def _to_ref_format(gts, preds, with_local):
    B, V = gts["pts3d"].shape[:2]
    gt_views = [
        {
            "pts3d": torch.from_numpy(gts["pts3d"][:, v].copy()),
            "valid_mask": torch.from_numpy(gts["valid_mask"][:, v].copy()),
            "camera_pose": torch.from_numpy(gts["camera_pose"][:, v].copy()),
        }
        for v in range(V)
    ]
    pred_views = []
    for v in range(V):
        d = {
            "pts3d_in_other_view": torch.from_numpy(
                preds["pts3d_in_other_view"][:, v].copy()
            ),
            "conf": torch.from_numpy(preds["conf"][:, v].copy()),
        }
        if with_local:
            d["pts3d_local"] = torch.from_numpy(preds["pts3d_local"][:, v].copy())
            d["conf_local"] = torch.from_numpy(preds["conf_local"][:, v].copy())
        pred_views.append(d)
    return gt_views, pred_views


def _compare(with_local, seed):
    L = _ref_losses()
    gts, preds = _random_scene(2, 3, 8, 12, seed=seed, with_local=with_local)
    gt_views, pred_views = _to_ref_format(gts, preds, with_local)

    ref_loss_fn = L.ConfLossMultiviewV2(
        L.Regr3DMultiviewV4(L.L21Loss(), norm_mode="avg_dis"), alpha=0.2
    )
    with torch.no_grad():
        ref_loss, ref_details = ref_loss_fn(gt_views, pred_views)

    cfg = LossConfig(alpha=0.2, with_local=with_local)
    jgts = {k: jnp.asarray(v) for k, v in gts.items()}
    jpreds = {k: jnp.asarray(v) for k, v in preds.items()}
    my_loss, my_details = conf_loss_multiview_v2(jgts, jpreds, cfg)

    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=2e-4)

    # per-view global conf losses
    for v in range(3):
        ref_v = ref_details[f"ConfLossMultiviewV2_conf_loss_global/{v:02d}"]
        np.testing.assert_allclose(
            float(my_details["conf_loss_global"][v]), ref_v, rtol=2e-4
        )
        if with_local:
            ref_vl = ref_details[f"ConfLossMultiviewV2_conf_loss_local/{v:02d}"]
            np.testing.assert_allclose(
                float(my_details["conf_loss_local"][v]), ref_vl, rtol=2e-4
            )


def test_conf_loss_parity_dual_head():
    _compare(with_local=True, seed=0)


def test_conf_loss_parity_global_only():
    _compare(with_local=False, seed=1)


def test_loss_all_invalid_view_is_finite():
    """A view with zero valid pixels must not produce NaN (reference guards
    with `if conf_loss.numel() > 0 else 0`, losses.py:826)."""
    gts, preds = _random_scene(1, 3, 8, 12, seed=2, with_local=True)
    gts["valid_mask"][:, 1] = False
    cfg = LossConfig()
    loss, _ = conf_loss_multiview_v2(
        {k: jnp.asarray(v) for k, v in gts.items()},
        {k: jnp.asarray(v) for k, v in preds.items()},
        cfg,
    )
    assert np.isfinite(float(loss))


def test_weighted_loss_algebra():
    """MultiLoss-style `a * L1 + L2` chains (reference losses.py:100-157)."""
    import jax.numpy as jnp

    from fast3r_tpu.train.losses import WeightedLoss

    def l1(x):
        return jnp.asarray(2.0) * x, {"l1": x}

    def l2(x):
        return jnp.asarray(3.0) * x, {"l2": x}

    combo = 0.5 * WeightedLoss(l1) + WeightedLoss(l2)
    total, details = combo(1.0)
    assert float(total) == 0.5 * 2.0 + 3.0
    assert set(details) == {"l1", "l2"}
    combo2 = WeightedLoss(l1) + 2 * WeightedLoss(l2)
    total2, _ = combo2(1.0)
    assert float(total2) == 2.0 + 6.0
