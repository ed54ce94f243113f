"""Reconstruction evaluation: alignment, normals, accuracy/completion metrics.

Behavioral reference:
  * align_local_pts3d_to_global (multiview_dust3r_module.py:427-549):
    per-(view, sample) conf-percentile-masked similarity alignment of the
    local-head pointmap onto the global-head pointmap; identity fallback with
    <3 points;
  * evaluate_reconstruction (multiview_dust3r_module.py:551-735):
    concat per-scene masked points, conf-weighted similarity alignment to GT,
    normal estimation (Open3D estimate_normals ~ 30-NN PCA), then KDTree
    accuracy/completion (mean + median) and normal consistency
    (fast3r/eval/recon_metric.py:14-49).

Open3D is not a dependency here: normals are estimated with the same 30-NN
PCA construction via scipy cKDTree + batched eigh.  The alignment math runs
in JAX (vmapped Umeyama) instead of a host threadpool.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from fast3r_tpu.ops.umeyama import apply_similarity, rigid_points_registration


# ---------------------------------------------------------------------------
# local -> global alignment
# ---------------------------------------------------------------------------

def _align_one(pts_local, pts_global, weights):
    R, t, s = rigid_points_registration(pts_local, pts_global, weights,
                                        compute_scaling=True)
    n = weights.sum()
    ok = n >= 3
    R = jnp.where(ok, R, jnp.eye(3, dtype=R.dtype))
    t = jnp.where(ok, t, jnp.zeros_like(t))
    s = jnp.where(ok, s, 1.0)
    return apply_similarity(pts_local, R, t, s)


def align_local_pts3d_to_global(
    preds: Sequence[Dict],
    views: Optional[Sequence[Dict]] = None,
    min_conf_thr_percentile: float = 0.0,
) -> None:
    """Adds 'pts3d_local_aligned_to_global' to each pred dict (in place),
    matching the reference contract (multiview_dust3r_module.py:427-549)."""
    for pred in preds:
        for key in ("pts3d_local", "conf_local", "pts3d_in_other_view", "conf"):
            if key not in pred:
                raise ValueError(f"Key {key!r} not found in preds.")

    num_views = len(preds)
    # entries are (B, H, W, ...) arrays, or per-sample lists (possibly of
    # mixed portrait/landscape shapes) after eval.pose.correct_preds_orientation
    B = len(preds[0]["pts3d_local"])

    # stack across views and batch: (V*B, H*W, ...) — the alignment is
    # pointwise over the flattened pixel set, so mixed orientations (same
    # pixel count, transposed layout) share one vmapped solve
    pl, pg, wts, shapes = [], [], [], []
    for v in range(num_views):
        for b in range(B):
            local = np.asarray(preds[v]["pts3d_local"][b], np.float32)
            glob = np.asarray(preds[v]["pts3d_in_other_view"][b], np.float32)
            cg = np.asarray(preds[v]["conf"][b], np.float32).reshape(-1)
            thr = np.quantile(cg, min_conf_thr_percentile / 100.0)
            mask = cg >= thr
            if views is not None and "valid_mask" in views[v]:
                mask &= np.asarray(views[v]["valid_mask"][b]).reshape(-1)
            if mask.sum() < 3 and views is not None and "valid_mask" in views[v]:
                mask = np.asarray(views[v]["valid_mask"][b]).reshape(-1)
            pl.append(local.reshape(-1, 3))
            pg.append(glob.reshape(-1, 3))
            wts.append(mask.astype(np.float32))
            shapes.append(local.shape[:2])

    aligned = jax.vmap(_align_one)(
        jnp.asarray(np.stack(pl)), jnp.asarray(np.stack(pg)),
        jnp.asarray(np.stack(wts)),
    )
    aligned = np.asarray(aligned)

    i = 0
    for v in range(num_views):
        out = []
        for b in range(B):
            H, W = shapes[i]
            out.append(aligned[i].reshape(H, W, 3))
            i += 1
        same = all(o.shape == out[0].shape for o in out)
        preds[v]["pts3d_local_aligned_to_global"] = (
            np.stack(out) if same else out
        )


# ---------------------------------------------------------------------------
# normals + metrics
# ---------------------------------------------------------------------------

def estimate_normals(points: np.ndarray, knn: int = 30) -> np.ndarray:
    """PCA normals over k nearest neighbors (Open3D estimate_normals default:
    KDTreeSearchParamKNN(knn=30)).  Orientation is arbitrary — the metrics use
    |dot|, matching the reference (recon_metric.py:30-31)."""
    n = len(points)
    k = min(knn, n)
    tree = cKDTree(points)
    _, idx = tree.query(points, k=k, workers=-1)
    nbrs = points[idx]                       # (N, k, 3)
    nbrs = nbrs - nbrs.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", nbrs, nbrs)
    _, vecs = np.linalg.eigh(cov)
    return vecs[:, :, 0]                     # smallest eigenvector


def accuracy(gt_points, rec_points, gt_normals=None, rec_normals=None):
    """Mean/median distance rec->gt (+ normal consistency)
    (recon_metric.py:21-34)."""
    tree = cKDTree(gt_points)
    dist, idx = tree.query(rec_points, workers=-1)
    if gt_normals is not None and rec_normals is not None:
        nd = np.abs(np.sum(gt_normals[idx] * rec_normals, axis=-1))
        return float(dist.mean()), float(np.median(dist)), float(nd.mean()), float(np.median(nd))
    return float(dist.mean()), float(np.median(dist))


def completion(gt_points, rec_points, gt_normals=None, rec_normals=None):
    """Mean/median distance gt->rec (+ normal consistency)
    (recon_metric.py:37-49)."""
    tree = cKDTree(rec_points)
    dist, idx = tree.query(gt_points, workers=-1)
    if gt_normals is not None and rec_normals is not None:
        nd = np.abs(np.sum(gt_normals * rec_normals[idx], axis=-1))
        return float(dist.mean()), float(np.median(dist)), float(nd.mean()), float(np.median(nd))
    return float(dist.mean()), float(np.median(dist))


def completion_ratio(gt_points, rec_points, dist_th: float = 0.05) -> float:
    tree = cKDTree(rec_points)
    dist, _ = tree.query(gt_points, workers=-1)
    return float((dist < dist_th).mean())


def evaluate_reconstruction(
    views: Sequence[Dict],
    preds: Sequence[Dict],
    min_conf_thr_percentile_for_local_alignment_and_icp: float = 0.0,
    min_conf_thr_percentile_for_metric_calculation: float = 0.0,
    use_pts3d_from_local_head: bool = True,
) -> List[Optional[Dict[str, float]]]:
    """Per-sample reconstruction metrics (multiview_dust3r_module.py:551-735).

    Returns a list over batch samples of metric dicts:
      accuracy, accuracy_median, completion, completion_median,
      nc1, nc1_median, nc2, nc2_median.
    """
    assert (min_conf_thr_percentile_for_local_alignment_and_icp
            >= min_conf_thr_percentile_for_metric_calculation)
    if use_pts3d_from_local_head:
        align_local_pts3d_to_global(
            preds, views,
            min_conf_thr_percentile=min_conf_thr_percentile_for_local_alignment_and_icp,
        )

    B = np.asarray(views[0]["pts3d"]).shape[0]
    results = []
    for i in range(B):
        pred_pts, gt_pts_icp, gt_pts_metrics, icp_weights = [], [], [], []
        for view, pred in zip(views, preds):
            pts_pred = np.asarray(
                pred["pts3d_local_aligned_to_global"][i]
                if use_pts3d_from_local_head else pred["pts3d_in_other_view"][i]
            )
            conf = np.asarray(
                pred["conf_local"][i] if use_pts3d_from_local_head
                else pred["conf"][i]
            )
            pts_gt = np.asarray(view["pts3d"][i])
            valid = np.asarray(view["valid_mask"][i]).astype(bool)

            cflat = conf.reshape(-1)
            thr_metric = np.quantile(
                cflat, min_conf_thr_percentile_for_metric_calculation / 100.0)
            conf_mask = conf >= thr_metric
            m_pred = valid & conf_mask
            pred_pts.append(pts_pred[m_pred].reshape(-1, 3))
            gt_pts_icp.append(pts_gt[m_pred].reshape(-1, 3))
            gt_pts_metrics.append(pts_gt[valid].reshape(-1, 3))
            thr_icp = np.quantile(
                cflat,
                min_conf_thr_percentile_for_local_alignment_and_icp / 100.0)
            icp_weights.append((conf[m_pred] >= thr_icp).astype(np.float32))

        pred_all = np.concatenate(pred_pts)
        gt_icp_all = np.concatenate(gt_pts_icp)
        gt_metrics_all = np.concatenate(gt_pts_metrics)
        w_all = np.concatenate(icp_weights)
        if len(pred_all) < 3 or len(gt_metrics_all) < 3:
            results.append(None)
            continue

        R, t, s = rigid_points_registration(
            jnp.asarray(pred_all), jnp.asarray(gt_icp_all),
            jnp.asarray(w_all), compute_scaling=True,
        )
        pred_aligned = np.asarray(apply_similarity(jnp.asarray(pred_all), R, t, s))

        pred_normals = estimate_normals(pred_aligned)
        gt_normals = estimate_normals(gt_metrics_all)

        acc, acc_med, nc1, nc1_med = accuracy(
            gt_metrics_all, pred_aligned, gt_normals, pred_normals)
        comp, comp_med, nc2, nc2_med = completion(
            gt_metrics_all, pred_aligned, gt_normals, pred_normals)
        results.append({
            "accuracy": acc, "accuracy_median": acc_med,
            "completion": comp, "completion_median": comp_med,
            "nc1": nc1, "nc1_median": nc1_med,
            "nc2": nc2, "nc2_median": nc2_med,
        })
    return results
