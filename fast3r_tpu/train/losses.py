"""Training losses: multiview confidence-weighted 3D regression.

Behavioral reference: fast3r/dust3r/losses.py —
  * L21Loss (losses.py:69-76): per-pixel Euclidean distance;
  * Regr3DMultiviewV4 (losses.py:570-742): GT points of every view transformed
    into the anchor (view-0) camera frame, predictions supervised there
    ("global" branch); the "local" branch transforms GT into each view's own
    frame and supervises pts3d_local.  Joint normalization: all views'
    valid points concatenated, per-sample mean distance ('avg_dis'), pred and
    GT normalized independently; the local branch is normalized per view
    unless local_scale_consistent;
  * ConfLossMultiviewV2 (losses.py:789-848): per-pixel
    ``conf * loss - alpha * log(conf)``, masked mean per (view, branch),
    summed and divided by the number of branch terms.  Flagship alpha=0.2.

JAX formulation: boolean indexing (``pts[mask]``) becomes masked reductions —
``sum(x * mask) / sum(mask)`` — which is numerically identical to the
reference's ``x[mask].mean()`` and keeps every shape static for XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp

from fast3r_tpu.ops.geometry import geotrf, se3_inverse


class WeightedLoss:
    """Composable loss algebra (reference MultiLoss, losses.py:100-157):
    ``0.5 * LossFn(a) + LossFn(b)`` builds a chain whose call returns
    (weighted total, merged details).  Loss fns return (scalar, details)."""

    def __init__(self, fn, alpha: float = 1.0, next_loss=None):
        self.fn = fn
        self.alpha = alpha
        self.next_loss = next_loss

    def __mul__(self, alpha):
        return WeightedLoss(self.fn, self.alpha * alpha, self.next_loss)

    __rmul__ = __mul__

    def __add__(self, other):
        if not isinstance(other, WeightedLoss):
            other = WeightedLoss(other)
        node = WeightedLoss(self.fn, self.alpha, self.next_loss)
        cur = node
        while cur.next_loss is not None:
            cur = cur.next_loss
        cur.next_loss = other
        return node

    def __call__(self, *args, **kwargs):
        loss, details = self.fn(*args, **kwargs)
        total = self.alpha * loss
        if self.next_loss is not None:
            l2, d2 = self.next_loss(*args, **kwargs)
            total = total + l2
            details = {**details, **d2}
        return total, details


@dataclasses.dataclass(frozen=True)
class LossConfig:
    alpha: float = 0.2             # conf-loss regularizer (flagship config)
    norm_mode: str = "avg_dis"
    gt_scale: bool = False
    local_scale_consistent: bool = False
    with_local: bool = True


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    s = jnp.sum(x * m, axis=axis)
    n = jnp.sum(m, axis=axis)
    return jnp.where(n > 0, s / jnp.maximum(n, 1.0), 0.0)


def _apply_dis_mode(dis: jnp.ndarray, dis_mode: str) -> jnp.ndarray:
    if dis_mode == "dis":
        return dis
    if dis_mode == "log1p":
        return jnp.log1p(dis)
    raise ValueError(f"unsupported dis mode {dis_mode!r}")


def _joint_norm_factor(pts: jnp.ndarray, valid: jnp.ndarray, norm_mode: str
                       ) -> jnp.ndarray:
    """Per-sample normalization factor over all views jointly
    (reference losses.py:615-661 normalize_pointcloud_from_views).

    pts: (B, V, H, W, 3); valid: (B, V, H, W).  Returns (B,).
    """
    mode, dis_mode = norm_mode.split("_")
    dis = jnp.linalg.norm(pts, axis=-1)
    dis = _apply_dis_mode(dis, dis_mode)
    B = pts.shape[0]
    dis = dis.reshape(B, -1)
    v = valid.reshape(B, -1)
    if mode == "avg":
        nf = _masked_mean(dis, v, axis=-1)
    else:
        raise ValueError(f"unsupported norm mode {mode!r}")
    return jnp.maximum(nf, 1e-8)


def _perview_norm_factor(pts: jnp.ndarray, valid: jnp.ndarray, norm_mode: str
                         ) -> jnp.ndarray:
    """Per-(sample, view) factor (reference losses.py:666-703
    normalize_pointcloud_per_view).  Returns (B, V)."""
    mode, dis_mode = norm_mode.split("_")
    dis = jnp.linalg.norm(pts, axis=-1)
    dis = _apply_dis_mode(dis, dis_mode)
    B, V = pts.shape[:2]
    dis = dis.reshape(B, V, -1)
    v = valid.reshape(B, V, -1)
    if mode == "avg":
        nf = _masked_mean(dis, v, axis=-1)
    else:
        raise ValueError(f"unsupported norm mode {mode!r}")
    return jnp.maximum(nf, 1e-8)


def regr3d_multiview_v4(
    gts: Dict[str, jnp.ndarray],
    preds: Dict[str, jnp.ndarray],
    cfg: LossConfig = LossConfig(),
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Per-pixel regression distances for the global (+local) branches.

    Args:
      gts: pts3d (B,V,H,W,3) world frame, valid_mask (B,V,H,W) bool,
           camera_pose (B,V,4,4) cam2world.
      preds: pts3d_in_other_view (B,V,H,W,3) [+ pts3d_local].

    Returns:
      (pixel_losses, details):
        pixel_losses: {"global": (B,V,H,W), ["local": ...]} L21 distances
        (valid-masked mean is taken by the conf loss), plus "valid_mask".
    """
    gt_pts = gts["pts3d"].astype(jnp.float32)
    valid = gts["valid_mask"]
    poses = gts["camera_pose"].astype(jnp.float32)
    B, V = gt_pts.shape[:2]

    out: Dict[str, jnp.ndarray] = {}
    details: Dict[str, jnp.ndarray] = {}

    # ---- global branch: everything in view-0's camera frame ----
    inv_anchor = se3_inverse(poses[:, 0])  # (B,4,4)
    gt_flat = gt_pts.reshape(B, -1, 3)
    gt_global = geotrf(inv_anchor, gt_flat).reshape(gt_pts.shape)
    pr_global = preds["pts3d_in_other_view"].astype(jnp.float32)

    nf_pr = _joint_norm_factor(pr_global, valid, cfg.norm_mode)  # (B,)
    pr_g = pr_global / nf_pr[:, None, None, None, None]
    if not cfg.gt_scale:
        nf_gt = _joint_norm_factor(gt_global, valid, cfg.norm_mode)
        gt_g = gt_global / nf_gt[:, None, None, None, None]
    else:
        gt_g = gt_global

    out["global"] = jnp.linalg.norm(pr_g - gt_g, axis=-1)  # (B,V,H,W)
    details["global_per_view"] = _masked_mean(
        out["global"], valid, axis=(0, 2, 3)
    )  # (V,)

    # ---- local branch: each view in its own camera frame ----
    if cfg.with_local and "pts3d_local" in preds:
        inv_local = se3_inverse(poses.reshape(B * V, 4, 4))
        gt_local = geotrf(
            inv_local, gt_pts.reshape(B * V, -1, 3)
        ).reshape(gt_pts.shape)
        pr_local = preds["pts3d_local"].astype(jnp.float32)

        if not cfg.local_scale_consistent:
            nf_prl = _perview_norm_factor(pr_local, valid, cfg.norm_mode)
            pr_l = pr_local / nf_prl[:, :, None, None, None]
            if not cfg.gt_scale:
                nf_gtl = _perview_norm_factor(gt_local, valid, cfg.norm_mode)
                gt_l = gt_local / nf_gtl[:, :, None, None, None]
            else:
                gt_l = gt_local
        else:
            pr_l = pr_local / nf_pr[:, None, None, None, None]
            gt_l = gt_local / (nf_gt[:, None, None, None, None]
                               if not cfg.gt_scale else 1.0)

        out["local"] = jnp.linalg.norm(pr_l - gt_l, axis=-1)
        details["local_per_view"] = _masked_mean(out["local"], valid, axis=(0, 2, 3))

    out["valid_mask"] = valid
    return out, details


def regr3d_pair(
    gt1: Dict[str, jnp.ndarray],
    gt2: Dict[str, jnp.ndarray],
    pred1: Dict[str, jnp.ndarray],
    pred2: Dict[str, jnp.ndarray],
    norm_mode: str = "avg_dis",
    gt_scale: bool = False,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Legacy DUSt3R pairwise regression loss (reference losses.py:160-228,
    Regr3D): both views' GT points in view-1's camera frame; pred1 supervises
    "pts3d" (own frame == anchor frame), pred2 supervises
    "pts3d_in_other_view"; joint avg-distance normalization over both views.

    Returns ({"l1": (B,H,W), "l2": (B,H,W)}, details).
    """
    in_cam1 = se3_inverse(gt1["camera_pose"].astype(jnp.float32))
    gt_pts1 = geotrf(in_cam1, gt1["pts3d"].astype(jnp.float32))
    gt_pts2 = geotrf(in_cam1, gt2["pts3d"].astype(jnp.float32))
    valid1 = gt1["valid_mask"]
    valid2 = gt2["valid_mask"]
    pr_pts1 = pred1["pts3d"].astype(jnp.float32)
    pr_pts2 = pred2["pts3d_in_other_view"].astype(jnp.float32)

    def joint_factor(p1, p2):
        pts = jnp.stack([p1, p2], axis=1)      # (B, 2, H, W, 3)
        valid = jnp.stack([valid1, valid2], axis=1)
        return _joint_norm_factor(pts, valid, norm_mode)

    nf_pr = joint_factor(pr_pts1, pr_pts2)[:, None, None, None]
    pr_pts1, pr_pts2 = pr_pts1 / nf_pr, pr_pts2 / nf_pr
    if not gt_scale:
        nf_gt = joint_factor(gt_pts1, gt_pts2)[:, None, None, None]
        gt_pts1, gt_pts2 = gt_pts1 / nf_gt, gt_pts2 / nf_gt

    l1 = jnp.linalg.norm(pr_pts1 - gt_pts1, axis=-1)
    l2 = jnp.linalg.norm(pr_pts2 - gt_pts2, axis=-1)
    details = {
        "Regr3D_pts3d_1": _masked_mean(l1, valid1),
        "Regr3D_pts3d_2": _masked_mean(l2, valid2),
    }
    return {"l1": l1, "l2": l2, "valid1": valid1, "valid2": valid2}, details


def conf_loss_pair(
    gt1, gt2, pred1, pred2, alpha: float = 0.2,
    norm_mode: str = "avg_dis", gt_scale: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Legacy pairwise confidence loss (reference ConfLoss.compute_loss):
    SUM over the two views of masked-mean(conf*loss - alpha*log conf)."""
    pixel, details = regr3d_pair(gt1, gt2, pred1, pred2, norm_mode, gt_scale)
    terms = []
    for li, vi, pred in (("l1", "valid1", pred1), ("l2", "valid2", pred2)):
        conf = pred["conf"].astype(jnp.float32)
        px = pixel[li] * conf - alpha * jnp.log(conf)
        terms.append(_masked_mean(px, pixel[vi]))
    loss = terms[0] + terms[1]
    details["conf_loss_1"] = terms[0]
    details["conf_loss_2"] = terms[1]
    return loss, details


def conf_loss_multiview_v2(
    gts: Dict[str, jnp.ndarray],
    preds: Dict[str, jnp.ndarray],
    cfg: LossConfig = LossConfig(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """The training objective (reference losses.py:789-848).

    Returns (scalar loss, details dict of per-(view,branch) conf losses).
    """
    pixel, details = regr3d_multiview_v4(gts, preds, cfg)
    valid = pixel["valid_mask"]
    V = valid.shape[1]

    terms = []
    branch_confs = [("global", "conf")]
    if "local" in pixel:
        branch_confs.append(("local", "conf_local"))

    for branch, conf_key in branch_confs:
        loss = pixel[branch]  # (B,V,H,W)
        conf = preds[conf_key].astype(jnp.float32)
        log_conf = jnp.log(conf)
        conf_loss_px = loss * conf - cfg.alpha * log_conf
        # reference: per-view masked mean over (B,H,W) jointly (the mask
        # flattens batch and pixels together, losses.py:819-827)
        per_view = _masked_mean(
            jnp.moveaxis(conf_loss_px, 1, 0).reshape(V, -1),
            jnp.moveaxis(valid, 1, 0).reshape(V, -1),
            axis=-1,
        )  # (V,)
        details[f"conf_loss_{branch}"] = per_view
        terms.append(per_view)

    total = jnp.concatenate(terms)
    loss = jnp.sum(total) / total.shape[0]
    return loss, details


# ---------------------------------------------------------------------------
# legacy loss variants (reference losses.py:229-568, 744-788, 898-977)
# ---------------------------------------------------------------------------

def _masked_lower_median(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """torch.nanmedian parity along the last axis: the LOWER median (element
    (n-1)//2 of the sorted valid values), not numpy's midpoint average."""
    big = jnp.where(valid, x, jnp.inf)
    s = jnp.sort(big, axis=-1)
    n = jnp.sum(valid, axis=-1).astype(jnp.int32)
    idx = jnp.maximum((n - 1) // 2, 0)
    return jnp.take_along_axis(s, idx[..., None], axis=-1)[..., 0]


def regr3d_multiview_v1(
    gts: Dict[str, jnp.ndarray],
    preds: Dict[str, jnp.ndarray],
    norm_mode: str = "avg_dis",
    gt_scale: bool = False,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Legacy Regr3DMultiview (reference losses.py:229-293): each view is
    normalized JOINTLY WITH THE ANCHOR pair-wise (not across all views), so
    non-anchor views are normalized more heavily (the reference's own FIXME).
    Global branch only."""
    gt_pts = gts["pts3d"].astype(jnp.float32)
    valid = gts["valid_mask"]
    poses = gts["camera_pose"].astype(jnp.float32)
    B, V = gt_pts.shape[:2]

    inv_anchor = se3_inverse(poses[:, 0])
    gt_anchor_frame = geotrf(
        inv_anchor, gt_pts.reshape(B, -1, 3)).reshape(gt_pts.shape)
    pr = preds["pts3d_in_other_view"].astype(jnp.float32)

    losses = []
    details: Dict[str, jnp.ndarray] = {}
    for i in range(V):
        pair_valid = jnp.stack([valid[:, 0], valid[:, i]], axis=1)

        def pair_nf(p):
            return _joint_norm_factor(
                jnp.stack([p[:, 0], p[:, i]], axis=1), pair_valid, norm_mode)

        pr_i = pr[:, i] / pair_nf(pr)[:, None, None, None]
        if not gt_scale:
            gt_i = (gt_anchor_frame[:, i]
                    / pair_nf(gt_anchor_frame)[:, None, None, None])
        else:
            gt_i = gt_anchor_frame[:, i]
        li = jnp.linalg.norm(pr_i - gt_i, axis=-1)  # (B,H,W)
        losses.append(li)
        details[f"Regr3DMultiview_pts3d_{i}_loss"] = _masked_mean(
            li, valid[:, i])

    pixel = {"global": jnp.stack(losses, axis=1), "valid_mask": valid}
    return pixel, details


def _global_scalar_norm_factor(pts, valid, norm_mode):
    """BATCH-GLOBAL scalar factor (reference V2/V3
    normalize_pointcloud_from_views, losses.py:338-383: `dis.mean()` over the
    valid points of ALL samples and views — unlike V4's per-sample factor)."""
    mode, dis_mode = norm_mode.split("_")
    dis = _apply_dis_mode(jnp.linalg.norm(pts, axis=-1), dis_mode)
    if mode == "avg":
        nf = _masked_mean(dis.reshape(-1), valid.reshape(-1))
    else:
        raise ValueError(f"unsupported norm mode {mode!r}")
    return jnp.maximum(nf, 1e-8)


def regr3d_multiview_v2(
    gts, preds, norm_mode: str = "avg_dis", gt_scale: bool = False,
):
    """Legacy Regr3DMultiviewV2 (reference losses.py:294-404): common
    normalization factor across ALL views AND samples (a batch-global
    scalar), global branch only."""
    gt_pts = gts["pts3d"].astype(jnp.float32)
    valid = gts["valid_mask"]
    poses = gts["camera_pose"].astype(jnp.float32)
    B, V = gt_pts.shape[:2]

    inv_anchor = se3_inverse(poses[:, 0])
    gt_g = geotrf(inv_anchor, gt_pts.reshape(B, -1, 3)).reshape(gt_pts.shape)
    pr_g = preds["pts3d_in_other_view"].astype(jnp.float32)

    pr_g = pr_g / _global_scalar_norm_factor(pr_g, valid, norm_mode)
    if not gt_scale:
        gt_g = gt_g / _global_scalar_norm_factor(gt_g, valid, norm_mode)

    pixel = {"global": jnp.linalg.norm(pr_g - gt_g, axis=-1),
             "valid_mask": valid}
    details = {
        f"Regr3DMultiview_pts3d_{i}_loss": _masked_mean(
            pixel["global"][:, i], valid[:, i])
        for i in range(V)
    }
    return pixel, details


def regr3d_multiview_v3(
    gts, preds, norm_mode: str = "avg_dis", gt_scale: bool = False,
):
    """Legacy Regr3DMultiviewV3 (reference losses.py:404-568): V2's
    batch-global joint normalization for the global branch + a per-VIEW
    scalar (also batch-global, normalize_pointcloud_per_view:497-534) for
    the local branch."""
    pixel, _ = regr3d_multiview_v2(gts, preds, norm_mode, gt_scale)
    valid = pixel["valid_mask"]
    V = valid.shape[1]
    details = {
        f"Regr3DMultiviewV3_pts3d_loss_global/{i:02d}": _masked_mean(
            pixel["global"][:, i], valid[:, i])
        for i in range(V)
    }

    if "pts3d_local" in preds:
        gt_pts = gts["pts3d"].astype(jnp.float32)
        poses = gts["camera_pose"].astype(jnp.float32)
        B = gt_pts.shape[0]
        inv_local = se3_inverse(poses.reshape(B * V, 4, 4))
        gt_l = geotrf(inv_local, gt_pts.reshape(B * V, -1, 3)
                      ).reshape(gt_pts.shape)
        pr_l = preds["pts3d_local"].astype(jnp.float32)

        def perview_scalar(pts):
            return jnp.stack([
                _global_scalar_norm_factor(pts[:, i], valid[:, i], norm_mode)
                for i in range(V)
            ])  # (V,)

        pr_l = pr_l / perview_scalar(pr_l)[None, :, None, None, None]
        if not gt_scale:
            gt_l = gt_l / perview_scalar(gt_l)[None, :, None, None, None]
        pixel["local"] = jnp.linalg.norm(pr_l - gt_l, axis=-1)
        for i in range(V):
            details[f"Regr3DMultiviewV3_pts3d_loss_local/{i:02d}"] = \
                _masked_mean(pixel["local"][:, i], valid[:, i])
    return pixel, details


def conf_loss_multiview_v1(
    gts, preds, alpha: float = 1.0,
    norm_mode: str = "avg_dis", gt_scale: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Legacy ConfLossMultiview (reference losses.py:744-788): SUM over views
    of masked-mean(conf*loss - alpha*log conf), global branch (pairs with the
    V1/V2 pixel losses, which return 2-tuples)."""
    pixel, details = regr3d_multiview_v2(gts, preds, norm_mode, gt_scale)
    valid = pixel["valid_mask"]
    conf = preds["conf"].astype(jnp.float32)
    V = valid.shape[1]
    total = jnp.float32(0.0)
    for i in range(V):
        px = pixel["global"][:, i] * conf[:, i] - alpha * jnp.log(conf[:, i])
        ci = _masked_mean(px, valid[:, i])
        details[f"ConfLossMultiview_conf_loss_{i}"] = ci
        total = total + ci
    return total, details


def regr3d_scale_shift_inv(
    gt1, gt2, pred1, pred2,
    norm_mode=None, gt_scale: bool = False,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Legacy Regr3D_ScaleShiftInv (reference losses.py:898-977, MRO runs
    ShiftInv then ScaleInv on top of Regr3D): after the optional base
    normalization, (1) subtract the joint LOWER-median depth (z only) of GT
    from GT and of pred from pred; (2) divide by the joint median distance to
    the per-coordinate median center (scale clipped to [1e-3, 1e3] for
    preds; if gt_scale, rescale preds to the GT scale instead)."""
    in_cam1 = se3_inverse(gt1["camera_pose"].astype(jnp.float32))
    gt_pts1 = geotrf(in_cam1, gt1["pts3d"].astype(jnp.float32))
    gt_pts2 = geotrf(in_cam1, gt2["pts3d"].astype(jnp.float32))
    valid1, valid2 = gt1["valid_mask"], gt2["valid_mask"]
    pr_pts1 = pred1["pts3d"].astype(jnp.float32)
    pr_pts2 = pred2["pts3d_in_other_view"].astype(jnp.float32)
    B = gt_pts1.shape[0]

    if norm_mode:
        def joint_factor(p1, p2):
            pts = jnp.stack([p1, p2], axis=1)
            valid = jnp.stack([valid1, valid2], axis=1)
            return _joint_norm_factor(pts, valid, norm_mode)

        nf_pr = joint_factor(pr_pts1, pr_pts2)[:, None, None, None]
        pr_pts1, pr_pts2 = pr_pts1 / nf_pr, pr_pts2 / nf_pr
        if not gt_scale:
            nf_gt = joint_factor(gt_pts1, gt_pts2)[:, None, None, None]
            gt_pts1, gt_pts2 = gt_pts1 / nf_gt, gt_pts2 / nf_gt

    both_valid = jnp.concatenate(
        [valid1.reshape(B, -1), valid2.reshape(B, -1)], axis=-1)

    def joint_median_z(p1, p2):
        z = jnp.concatenate(
            [p1[..., 2].reshape(B, -1), p2[..., 2].reshape(B, -1)], axis=-1)
        return _masked_lower_median(z, both_valid)  # (B,)

    # shift: subtract joint median depth (z channel only)
    gt_shift = joint_median_z(gt_pts1, gt_pts2)[:, None, None]
    pr_shift = joint_median_z(pr_pts1, pr_pts2)[:, None, None]
    gt_pts1 = gt_pts1.at[..., 2].add(-gt_shift)
    gt_pts2 = gt_pts2.at[..., 2].add(-gt_shift)
    pr_pts1 = pr_pts1.at[..., 2].add(-pr_shift)
    pr_pts2 = pr_pts2.at[..., 2].add(-pr_shift)

    def joint_center_scale(p1, p2):
        pts = jnp.concatenate(
            [p1.reshape(B, -1, 3), p2.reshape(B, -1, 3)], axis=1)
        center = jnp.stack(
            [_masked_lower_median(pts[..., c], both_valid) for c in range(3)],
            axis=-1)  # (B,3)
        norm = jnp.linalg.norm(pts - center[:, None], axis=-1)
        # invalid rows carry inf from the median path; mask them out
        return _masked_lower_median(norm, both_valid)  # (B,)

    gt_s = joint_center_scale(gt_pts1, gt_pts2)[:, None, None, None]
    pr_s = jnp.clip(joint_center_scale(pr_pts1, pr_pts2), 1e-3, 1e3
                    )[:, None, None, None]
    if gt_scale:
        pr_pts1 = pr_pts1 * gt_s / pr_s
        pr_pts2 = pr_pts2 * gt_s / pr_s
    else:
        gt_pts1, gt_pts2 = gt_pts1 / gt_s, gt_pts2 / gt_s
        pr_pts1, pr_pts2 = pr_pts1 / pr_s, pr_pts2 / pr_s

    l1 = jnp.linalg.norm(pr_pts1 - gt_pts1, axis=-1)
    l2 = jnp.linalg.norm(pr_pts2 - gt_pts2, axis=-1)
    details = {
        "Regr3D_ScaleShiftInv_pts3d_1": _masked_mean(l1, valid1),
        "Regr3D_ScaleShiftInv_pts3d_2": _masked_mean(l2, valid2),
    }
    return {"l1": l1, "l2": l2, "valid1": valid1, "valid2": valid2}, details
