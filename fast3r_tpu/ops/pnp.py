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


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) -> (N, 3, 3) cross-product matrices."""
    z = jnp.zeros_like(v[:, 0])
    return jnp.stack([
        jnp.stack([z, -v[:, 2], v[:, 1]], -1),
        jnp.stack([v[:, 2], z, -v[:, 0]], -1),
        jnp.stack([-v[:, 1], v[:, 0], z], -1),
    ], 1)


def _exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exp map for a single (3,) axis-angle vector."""
    th = jnp.linalg.norm(w)
    K = _skew(w[None])[0]
    # series-safe coefficients near 0
    a = jnp.where(th > 1e-8, jnp.sin(th) / jnp.where(th > 1e-8, th, 1.0), 1.0)
    b = jnp.where(th > 1e-8,
                  (1.0 - jnp.cos(th)) / jnp.where(th > 1e-8, th ** 2, 1.0),
                  0.5)
    return jnp.eye(3, dtype=w.dtype) + a * K + b * (K @ K)


def _gauss_newton_polish(pts3d, pixels, w, focal, pp, R, t,
                         iters: int = 8, huber_px: float = 2.5,
                         huber_px_start: float = None,
                         damping: float = 1e-6):
    """Levenberg-damped Gauss-Newton on the reprojection residual with a
    GRADUATED (annealed) Huber width.

    Refines (R, t) on the weighted point set (w = inlier mask) with a Huber
    robust weight; left-multiplicative so3 perturbation (R <- exp(dw) R).
    The robust width anneals geometrically from `huber_px_start` (default
    8x the final width) down to `huber_px`: a tight width at a far-off init
    down-weights EVERY residual and freezes the solver on a saturated
    plateau, while a wide width alone is not outlier-robust — graduated
    non-convexity gives both a wide basin of attraction and a robust
    optimum.  This closes the accuracy gap between the algebraic DLT
    minimum and the geometric optimum that cv2's iterative SQPNP reaches —
    gated by tests/test_pose.py::test_backend_statistical_parity.
    """
    f32 = jnp.float32
    pts = pts3d.astype(f32)
    px = pixels.astype(f32)
    wv = w.astype(f32)
    if huber_px_start is None:
        huber_px_start = 8.0 * huber_px
    # geometric schedule huber_px_start -> huber_px over `iters` steps
    decay = (huber_px / huber_px_start) ** (1.0 / max(iters - 1, 1))
    # near-plane cutoff: a point with cam-z ~ 0 has Jacobian leverage
    # ~ 1/z^4 that Huber's 1/residual weight cannot cancel — one such
    # outlier swamps JtJ (diag ~ 1e20) and freezes every other direction.
    # Exclude points closer than 1% of the mean scene distance per iter.
    scene_scale = (jnp.linalg.norm(pts, axis=-1) * wv).sum() / \
        jnp.maximum(wv.sum(), 1.0)
    z_min = 0.01 * scene_scale + 1e-6

    def body(i, Rt):
        R, t = Rt
        huber_i = huber_px_start * decay ** i.astype(f32)
        cam = pts @ R.T + t                      # (N, 3)
        zc = jnp.clip(cam[:, 2], 1e-6, None)
        inv_z = 1.0 / zc
        proj = cam[:, :2] * inv_z[:, None] * focal + pp
        r = proj - px                            # (N, 2)
        zero = jnp.zeros_like(inv_z)
        dpdY = focal * jnp.stack([
            jnp.stack([inv_z, zero, -cam[:, 0] * inv_z ** 2], -1),
            jnp.stack([zero, inv_z, -cam[:, 1] * inv_z ** 2], -1),
        ], 1)                                    # (N, 2, 3)
        # cam = exp(dw) (R X) + (t + dt): d cam / d dw = -skew(R X)
        Jw = jnp.einsum("nij,njk->nik", dpdY, -_skew(cam - t))
        J = jnp.concatenate([Jw, dpdY], -1)      # (N, 2, 6)
        rn = jnp.linalg.norm(r, axis=-1)
        hub = jnp.minimum(1.0, huber_i / jnp.maximum(rn, 1e-9))
        hub = hub * (cam[:, 2] > z_min)          # near-plane leverage guard
        ww = (wv * hub)[:, None]                 # (N, 1) per-point weight
        Jf = J.reshape(-1, 6)
        rf = r.reshape(-1)
        wf = jnp.repeat(ww[:, 0], 2)
        JtJ = (Jf * wf[:, None]).T @ Jf
        # Levenberg damping relative to the problem scale (guards the
        # singular JtJ that a fully down-weighted residual set produces)
        lam = damping * (jnp.trace(JtJ) / 6.0 + 1.0)
        JtJ = JtJ + lam * jnp.eye(6, dtype=f32)
        Jtr = (Jf * wf[:, None]).T @ rf
        delta = -jnp.linalg.solve(JtJ, Jtr)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta,
                          jnp.zeros_like(delta))
        R_new = _exp_so3(delta[:3]) @ R
        t_new = t + delta[3:]
        return (R_new, t_new)

    R1, t1 = jax.lax.fori_loop(0, iters, body, (R.astype(f32), t.astype(f32)))
    return R1.astype(pts3d.dtype), t1.astype(pts3d.dtype)


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

    # Multi-start LO-RANSAC: EVERY minimal-sample hypothesis is locally
    # optimized (truncated-L1 IRLS refit + graduated Gauss-Newton) before
    # ranking.  The 8-point algebraic DLT alone degrades badly under narrow
    # FOV + pixel noise (tens of degrees off, sometimes into the mirror
    # basin); polishing only the count-best hypothesis inherits that basin.
    # Polishing all of them and ranking by the truncated robust cost
    # sum(min(err, thr) * mask) lets any hypothesis that lands in the true
    # basin win — inlier counts are not used for ranking because they
    # saturate (e.g. along-ray depth outliers reproject well under ANY pose
    # and jitter counts at the threshold).
    logits = jnp.where(mask, 0.0, -1e9)
    keys = jax.random.split(key, iters)

    def one_model(k):
        idx = jax.random.categorical(k, logits, shape=(sample_size,))
        w = jnp.ones((sample_size,), pts3d.dtype)
        R, t = _dlt_pose(pts3d[idx], rays[idx], w)
        # graduated-robust geometric polish (Huber width 8x->0.5x thresh);
        # the raw 8-point pose is only a basin seed — the polish does the
        # actual estimation on all masked points
        R, t = _gauss_newton_polish(
            pts3d, pixels, mf, focal, pp, R, t,
            iters=12, huber_px=reproj_thresh / 2.0,
            huber_px_start=8.0 * reproj_thresh)
        err = _reproj_errors(pts3d, pixels, R, t, focal, pp)
        cost = jnp.sum(jnp.minimum(err, reproj_thresh) * mf)
        return R, t, cost

    Rs, ts, costs = jax.vmap(one_model)(keys)
    best = jnp.argmin(costs)
    R0, t0 = Rs[best], ts[best]

    # refit on inliers of the best model (weighted DLT), then polish the
    # geometric optimum with damped Gauss-Newton + inlier re-estimation
    # (cv2's SOLVEPNP_SQPNP also iterates to the geometric minimum).
    # Candidate acceptance uses the TRUNCATED robust cost sum(min(err, thr))
    # over valid points — inlier COUNTS saturate (points that reproject well
    # under any pose, e.g. along-ray depth outliers, jitter the count at the
    # threshold and would veto strictly better geometric fits).
    def robust_cost(err):
        return jnp.sum(jnp.minimum(err, reproj_thresh) * mf)

    err = _reproj_errors(pts3d, pixels, R0, t0, focal, pp)
    w_in = ((err < reproj_thresh) & mask).astype(pts3d.dtype)
    cost = robust_cost(err)
    enough = w_in.sum() >= 6
    R1, t1 = _dlt_pose(pts3d, rays, w_in + 1e-9)
    err1 = _reproj_errors(pts3d, pixels, R1, t1, focal, pp)
    cost1 = robust_cost(err1)
    take = enough & (cost1 < cost)
    R = jnp.where(take, R1, R0)
    t = jnp.where(take, t1, t0)
    cost = jnp.where(take, cost1, cost)
    w_in = jnp.where(take, ((err1 < reproj_thresh) & mask), w_in > 0
                     ).astype(pts3d.dtype)

    for _ in range(2):  # GN polish / inlier re-estimation alternation
        Rp, tp = _gauss_newton_polish(pts3d, pixels, w_in, focal, pp, R, t,
                                      huber_px=reproj_thresh / 2.0,
                                      huber_px_start=reproj_thresh)
        errp = _reproj_errors(pts3d, pixels, Rp, tp, focal, pp)
        costp = robust_cost(errp)
        better = costp <= cost
        R = jnp.where(better, Rp, R)
        t = jnp.where(better, tp, t)
        cost = jnp.where(better, costp, cost)
        w_in = jnp.where(better, ((errp < reproj_thresh) & mask), w_in > 0
                         ).astype(pts3d.dtype)

    inl = w_in.sum().astype(jnp.int32)

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
