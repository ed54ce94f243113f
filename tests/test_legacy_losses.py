"""Golden parity: legacy pairwise Regr3D/ConfLoss vs the reference."""

import sys

import numpy as np
import torch

import jax.numpy as jnp

from tests.ref_loader import REF_ROOT, install_ref_stubs

from fast3r_tpu.train.losses import conf_loss_pair


def _ref_losses():
    install_ref_stubs()
    for p in (REF_ROOT, REF_ROOT + "/fast3r"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import fast3r.dust3r.losses as L

    return L


def test_pair_conf_loss_parity():
    L = _ref_losses()
    rng = np.random.default_rng(0)
    B, H, W = 2, 8, 12

    def rand_pose():
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = q
        T[:3, 3] = rng.standard_normal(3)
        return T

    def gt():
        return {
            "pts3d": rng.standard_normal((B, H, W, 3)).astype(np.float32) + 1,
            "valid_mask": rng.random((B, H, W)) < 0.8,
            "camera_pose": np.stack([rand_pose() for _ in range(B)]),
        }

    gt1, gt2 = gt(), gt()
    pred1 = {
        "pts3d": rng.standard_normal((B, H, W, 3)).astype(np.float32),
        "conf": (1 + np.exp(rng.standard_normal((B, H, W)))).astype(np.float32),
    }
    pred2 = {
        "pts3d_in_other_view": rng.standard_normal((B, H, W, 3)).astype(np.float32),
        "conf": (1 + np.exp(rng.standard_normal((B, H, W)))).astype(np.float32),
    }

    ref_fn = L.ConfLoss(L.Regr3D(L.L21Loss(), norm_mode="avg_dis"), alpha=0.2)

    def tt(d):
        return {k: torch.from_numpy(np.asarray(v).copy()) for k, v in d.items()}

    with torch.no_grad():
        ref_loss, _ = ref_fn(tt(gt1), tt(gt2), tt(pred1), tt(pred2))

    def jj(d):
        return {k: jnp.asarray(v) for k, v in d.items()}

    my_loss, _ = conf_loss_pair(jj(gt1), jj(gt2), jj(pred1), jj(pred2),
                                alpha=0.2)
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=3e-4)


def _rand_pose(rng):
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = q
    T[:3, 3] = rng.standard_normal(3)
    return T


def _multiview_scene(rng, B=2, V=3, H=8, W=12, with_local=False):
    gts = {
        "pts3d": rng.standard_normal((B, V, H, W, 3)).astype(np.float32) + 1,
        "valid_mask": rng.random((B, V, H, W)) < 0.8,
        "camera_pose": np.stack(
            [np.stack([_rand_pose(rng) for _ in range(V)]) for _ in range(B)]),
    }
    preds = {
        "pts3d_in_other_view":
            rng.standard_normal((B, V, H, W, 3)).astype(np.float32),
        "conf": (1 + np.exp(rng.standard_normal((B, V, H, W))))
            .astype(np.float32),
    }
    if with_local:
        preds["pts3d_local"] = rng.standard_normal(
            (B, V, H, W, 3)).astype(np.float32)
        preds["conf_local"] = (1 + np.exp(
            rng.standard_normal((B, V, H, W)))).astype(np.float32)
    return gts, preds


def _to_ref_views(gts, preds):
    V = gts["pts3d"].shape[1]
    gt_views = [
        {k: torch.from_numpy(np.asarray(v[:, i]).copy())
         for k, v in gts.items()} for i in range(V)
    ]
    pred_views = [
        {k: torch.from_numpy(np.asarray(v[:, i]).copy())
         for k, v in preds.items()} for i in range(V)
    ]
    return gt_views, pred_views


def _jj(d):
    return {k: jnp.asarray(v) for k, v in d.items()}


def test_multiview_v1_parity():
    from fast3r_tpu.train.losses import regr3d_multiview_v1

    L = _ref_losses()
    rng = np.random.default_rng(1)
    gts, preds = _multiview_scene(rng)
    gt_views, pred_views = _to_ref_views(gts, preds)
    ref = L.Regr3DMultiview(L.L21Loss(), norm_mode="avg_dis")
    with torch.no_grad():
        ref_losses, ref_details = ref(gt_views, pred_views)
    _, my_details = regr3d_multiview_v1(_jj(gts), _jj(preds))
    for i in range(3):
        np.testing.assert_allclose(
            float(my_details[f"Regr3DMultiview_pts3d_{i}_loss"]),
            ref_details[f"Regr3DMultiview_pts3d_{i}_loss"], rtol=3e-4)


def test_conf_loss_multiview_v1_with_v2_pixel_parity():
    from fast3r_tpu.train.losses import conf_loss_multiview_v1

    L = _ref_losses()
    rng = np.random.default_rng(2)
    gts, preds = _multiview_scene(rng)
    gt_views, pred_views = _to_ref_views(gts, preds)
    ref = L.ConfLossMultiview(
        L.Regr3DMultiviewV2(L.L21Loss(), norm_mode="avg_dis"), alpha=0.2)
    with torch.no_grad():
        ref_loss, _ = ref(gt_views, pred_views)
    my_loss, _ = conf_loss_multiview_v1(_jj(gts), _jj(preds), alpha=0.2)
    np.testing.assert_allclose(float(my_loss), float(ref_loss), rtol=3e-4)


def test_multiview_v3_parity_via_conf_wrapper():
    """V3: batch-global joint normalization + per-view local scalars.  The
    raw reference V3 cannot be called standalone (its Sum() chokes on the
    3-tuples), so compare through ConfLossMultiviewV2 like training does."""
    from fast3r_tpu.train.losses import regr3d_multiview_v3, _masked_mean

    L = _ref_losses()
    rng = np.random.default_rng(3)
    gts, preds = _multiview_scene(rng, with_local=True)
    gt_views, pred_views = _to_ref_views(gts, preds)
    ref = L.ConfLossMultiviewV2(
        L.Regr3DMultiviewV3(L.L21Loss(), norm_mode="avg_dis"), alpha=0.2)
    with torch.no_grad():
        ref_loss, ref_details = ref(gt_views, pred_views)

    pixel, _ = regr3d_multiview_v3(_jj(gts), _jj(preds))
    valid = pixel["valid_mask"]
    terms = []
    for branch, conf_key in (("global", "conf"), ("local", "conf_local")):
        conf = jnp.asarray(preds[conf_key])
        px = pixel[branch] * conf - 0.2 * jnp.log(conf)
        for i in range(3):
            terms.append(float(_masked_mean(px[:, i], valid[:, i])))
    my_loss = sum(terms) / len(terms)
    np.testing.assert_allclose(my_loss, float(ref_loss), rtol=3e-4)


def test_scale_shift_inv_parity():
    from fast3r_tpu.train.losses import regr3d_scale_shift_inv

    L = _ref_losses()
    rng = np.random.default_rng(4)
    B, H, W = 2, 8, 12
    gt1 = {"pts3d": rng.standard_normal((B, H, W, 3)).astype(np.float32) + 1,
           "valid_mask": rng.random((B, H, W)) < 0.8,
           "camera_pose": np.stack([_rand_pose(rng) for _ in range(B)])}
    gt2 = {"pts3d": rng.standard_normal((B, H, W, 3)).astype(np.float32) + 1,
           "valid_mask": rng.random((B, H, W)) < 0.8,
           "camera_pose": np.stack([_rand_pose(rng) for _ in range(B)])}
    pred1 = {"pts3d": rng.standard_normal((B, H, W, 3)).astype(np.float32)}
    pred2 = {"pts3d_in_other_view":
             rng.standard_normal((B, H, W, 3)).astype(np.float32)}

    def tt(d):
        return {k: torch.from_numpy(np.asarray(v).copy())
                for k, v in d.items()}

    for gt_scale in (False, True):
        ref = L.Regr3D_ScaleShiftInv(L.L21Loss(), norm_mode="avg_dis",
                                     gt_scale=gt_scale)
        with torch.no_grad():
            _, ref_details = ref(tt(gt1), tt(gt2), tt(pred1), tt(pred2))
        _, my_details = regr3d_scale_shift_inv(
            _jj(gt1), _jj(gt2), _jj(pred1), _jj(pred2),
            norm_mode="avg_dis", gt_scale=gt_scale)
        for k in ("pts3d_1", "pts3d_2"):
            np.testing.assert_allclose(
                float(my_details[f"Regr3D_ScaleShiftInv_{k}"]),
                ref_details[f"Regr3D_ScaleShiftInv_{k}"], rtol=3e-4)
