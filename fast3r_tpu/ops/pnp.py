"""Perspective-n-Point camera pose recovery from pointmaps.

Behavioral reference:
  * focal: estimate_focal_knowing_depth_and_confidence_mask (Weiszfeld IRLS,
    dust3r/post_process.py:77-142), confidence-percentile mask
    (multiview_dust3r_module.py:1081-1109);
  * pose:  fast_pnp (cloud_opt/init_im_poses.py:300-350) — RANSAC-PnP with
    cv2 SQPNP, reprojection error 5 px, optional 100-focal geomspace sweep.

Two backends:
  * host ("cv2"): direct behavioral port using OpenCV solvePnPRansac(SQPNP) —
    bit-compatible quality with the reference for parity evaluation;
  * device ("jax"): fixed-iteration vmapped RANSAC with a DLT pose solve
    (eigh of the 12x12 normal matrix), SO(3) projection via SVD, inlier
    counting by reprojection error, and a final weighted refit on inliers.
    Fully jittable — pose extraction without a host round-trip (the
    BASELINE.json north star).  Quality gate is RRA@15 parity, not bitwise
    equality with SQPNP.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fast3r_tpu.ops.geometry import xy_grid


# ---------------------------------------------------------------------------
# focal estimation (Weiszfeld)
# ---------------------------------------------------------------------------

def estimate_focal_weiszfeld(
    pts3d: jnp.ndarray,
    conf: Optional[jnp.ndarray] = None,
    min_conf_percentile: float = 10.0,
    iters: int = 100,
    pp: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Weiszfeld focal estimate from a (H, W, 3) pointmap.

    Masked IRLS over pixels with conf >= percentile threshold
    (post_process.py:117-136 + multiview_dust3r_module.py:1092-1103).
    Fully jittable (masked reductions instead of boolean gather).
    """
    H, W, _ = pts3d.shape
    if pp is None:
        pp = jnp.array([W / 2.0, H / 2.0], pts3d.dtype)
    pixels = xy_grid(W, H, dtype=pts3d.dtype) - pp  # (H, W, 2)

    if conf is None:
        mask = jnp.ones((H, W), bool)
    else:
        thr = jnp.quantile(conf.reshape(-1), min_conf_percentile / 100.0)
        mask = conf >= thr
    m = mask.astype(pts3d.dtype).reshape(-1)

    xy = pts3d[..., :2].reshape(-1, 2)
    z = pts3d[..., 2:3].reshape(-1, 1)
    xy_over_z = jnp.where(jnp.abs(z) > 0, xy / z, 0.0)
    xy_over_z = jnp.nan_to_num(xy_over_z, posinf=0.0, neginf=0.0)
    px = pixels.reshape(-1, 2)

    dot_xy_px = jnp.sum(xy_over_z * px, axis=-1)      # (N,)
    dot_xy_xy = jnp.sum(xy_over_z ** 2, axis=-1)      # (N,)

    nvalid = jnp.maximum(m.sum(), 1.0)
    focal = (dot_xy_px * m).sum() / nvalid / ((dot_xy_xy * m).sum() / nvalid)

    def body(_, f):
        dis = jnp.linalg.norm(px - f * xy_over_z, axis=-1)
        w = m / jnp.clip(dis, 1e-8, None)
        return (w * dot_xy_px).sum() / (w * dot_xy_xy).sum()

    return jax.lax.fori_loop(0, iters, body, focal)


# ---------------------------------------------------------------------------
# device RANSAC-PnP
# ---------------------------------------------------------------------------

def _project_so3(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation matrix (SVD orthogonalization, det +1)."""
    u, _, vt = jnp.linalg.svd(M)
    d = jnp.sign(jnp.linalg.det(u @ vt))
    s = jnp.diag(jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d]))
    return u @ s @ vt

def _dlt_pose(pts3d: jnp.ndarray, rays: jnp.ndarray, w: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted DLT for [R|t] with known intrinsics.

    For each point X and normalized pixel (u, v):
      u * (r3.X + t3) - (r1.X + t1) = 0
      v * (r3.X + t3) - (r2.X + t2) = 0
    Linear in p = [r1 t1 r2 t2 r3 t3] (12 unknowns); solve as the smallest
    eigenvector of A^T W A (12x12 eigh — tiny, TPU-friendly).
    """
    N = pts3d.shape[0]
    Xh = jnp.concatenate([pts3d, jnp.ones((N, 1), pts3d.dtype)], axis=-1)  # (N,4)
    zero = jnp.zeros_like(Xh)
    u = rays[:, 0:1]
    v = rays[:, 1:2]
    row1 = jnp.concatenate([-Xh, zero, u * Xh], axis=-1)   # (N, 12)
    row2 = jnp.concatenate([zero, -Xh, v * Xh], axis=-1)   # (N, 12)
    A = jnp.concatenate([row1, row2], axis=0)              # (2N, 12)
    ww = jnp.concatenate([w, w], axis=0)[:, None]
    AtA = (A * ww).T @ A                                   # (12, 12)
    eigvals, eigvecs = jnp.linalg.eigh(AtA)
    p = eigvecs[:, 0]
    P = p.reshape(3, 4)
    M, t = P[:, :3], P[:, 3]
    # fix scale + sign: det(M) scale, points should have positive depth
    scale = jnp.cbrt(jnp.abs(jnp.linalg.det(M)))
    M = M / jnp.where(scale > 1e-12, scale, 1.0)
    t = t / jnp.where(scale > 1e-12, scale, 1.0)
    # sign: majority of (weighted) points in front of camera
    depth = pts3d @ M[2] + t[2]
    sign = jnp.sign((jnp.sign(depth) * w).sum())
    sign = jnp.where(sign == 0, 1.0, sign)
    M, t = M * sign, t * sign
    R = _project_so3(M)
    return R, t


def _reproj_errors(pts3d, pixels, R, t, focal, pp):
    cam = pts3d @ R.T + t
    z = jnp.clip(cam[:, 2:3], 1e-8, None)
    proj = cam[:, :2] / z * focal + pp
    err = jnp.linalg.norm(proj - pixels, axis=-1)
    return jnp.where(cam[:, 2] > 0, err, 1e9)


def pnp_ransac_jax(
    pts3d: jnp.ndarray,
    pixels: jnp.ndarray,
    mask: jnp.ndarray,
    focal: jnp.ndarray,
    pp: jnp.ndarray,
    key: jax.Array,
    iters: int = 32,
    sample_size: int = 8,
    reproj_thresh: float = 5.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-shape RANSAC-PnP (device path).

    Args:
      pts3d: (N, 3) world points; pixels: (N, 2); mask: (N,) valid flags;
      focal: scalar; pp: (2,) principal point.

    Returns:
      (c2w 4x4, inlier_count).
    """
    N = pts3d.shape[0]
    rays = (pixels - pp) / focal
    mf = mask.astype(pts3d.dtype)

    # sample minimal subsets, biased to valid points
    logits = jnp.where(mask, 0.0, -1e9)
    keys = jax.random.split(key, iters)

    def one_model(k):
        idx = jax.random.categorical(k, logits, shape=(sample_size,))
        w = jnp.ones((sample_size,), pts3d.dtype)
        R, t = _dlt_pose(pts3d[idx], rays[idx], w)
        err = _reproj_errors(pts3d, pixels, R, t, focal, pp)
        inliers = (err < reproj_thresh) & mask
        return R, t, inliers.sum()

    Rs, ts, scores = jax.vmap(one_model)(keys)
    best = jnp.argmax(scores)
    R0, t0 = Rs[best], ts[best]

    # refit on inliers of the best model (one weighted DLT pass)
    err = _reproj_errors(pts3d, pixels, R0, t0, focal, pp)
    w_in = ((err < reproj_thresh) & mask).astype(pts3d.dtype)
    enough = w_in.sum() >= 6
    R1, t1 = _dlt_pose(pts3d, rays, w_in + 1e-9)
    R = jnp.where(enough, R1, R0)
    t = jnp.where(enough, t1, t0)

    err2 = _reproj_errors(pts3d, pixels, R, t, focal, pp)
    score2 = ((err2 < reproj_thresh) & mask).sum()
    use_refit = score2 >= scores[best]
    R = jnp.where(use_refit, R, R0)
    t = jnp.where(use_refit, t, t0)
    inl = jnp.maximum(score2, scores[best])

    w2c = jnp.eye(4, dtype=pts3d.dtype)
    w2c = w2c.at[:3, :3].set(R).at[:3, 3].set(t)
    # c2w closed-form inverse
    c2w = jnp.eye(4, dtype=pts3d.dtype)
    c2w = c2w.at[:3, :3].set(R.T).at[:3, 3].set(-R.T @ t)
    return c2w, inl


# ---------------------------------------------------------------------------
# host path (cv2 SQPNP — reference parity)
# ---------------------------------------------------------------------------

def fast_pnp_cv2(
    pts3d: np.ndarray,
    focal: Optional[float],
    mask: np.ndarray,
    pp: Optional[Tuple[float, float]] = None,
    niter_PnP: int = 10,
    num_guessed_focals: int = 100,
) -> Tuple[Optional[float], Optional[np.ndarray]]:
    """RANSAC-PnP via OpenCV SQPNP (reference init_im_poses.py:300-350).

    Returns (focal, c2w 4x4) or (None, None) on failure.
    """
    import cv2

    if mask.sum() < 4:
        return None, None
    H, W, _ = pts3d.shape
    pixels = np.mgrid[:W, :H].T.astype(np.float32)  # (H, W, 2) = (x, y)

    if focal is None:
        S = max(W, H)
        tentative_focals = np.geomspace(S / 2, S * 3, num=num_guessed_focals)
    else:
        tentative_focals = [focal]
    if pp is None:
        pp = (W / 2, H / 2)

    best = (0, None, None, None)
    for f in tentative_focals:
        K = np.float32([(f, 0, pp[0]), (0, f, pp[1]), (0, 0, 1)])
        try:
            success, R, T, inliers = cv2.solvePnPRansac(
                pts3d[mask].astype(np.float64), pixels[mask].astype(np.float64),
                K, None,
                iterationsCount=niter_PnP, reprojectionError=5,
                flags=cv2.SOLVEPNP_SQPNP,
            )
        except cv2.error:
            continue
        if not success or inliers is None:
            continue
        score = len(inliers)
        if score > best[0]:
            best = (score, R, T, f)

    if not best[0]:
        return None, None
    _, R, T, best_focal = best
    R = cv2.Rodrigues(R)[0]  # world-to-cam rotation
    w2c = np.eye(4)
    w2c[:3, :3] = R
    w2c[:3, 3] = T.reshape(3)
    c2w = np.linalg.inv(w2c)
    return float(best_focal), c2w
