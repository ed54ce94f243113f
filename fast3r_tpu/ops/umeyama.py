"""Weighted rigid/similarity point-set registration (Umeyama).

Replaces `roma.rigid_points_registration(x, y, weights, compute_scaling=True)`
used by the reference for local->global alignment
(multiview_dust3r_module.py:518-521) and conf-weighted ICP-style alignment to
GT (:661).  Closed-form weighted Umeyama: fully jittable (the reference
threadpools per (view, batch) on host; here one vmap).

Returns (R, t, s) such that  y ≈ s * (x @ R^T) + t.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def rigid_points_registration(
    x: jnp.ndarray,
    y: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    compute_scaling: bool = True,
    eps: float = 1e-12,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Weighted Umeyama alignment x -> y.

    Args:
      x, y: (N, 3) corresponding points.
      weights: (N,) nonnegative weights (default uniform).  Zero-weight rows
        are ignored, which is how masked/static-shape callers drop invalid
        points without changing shapes.

    Returns:
      (R (3,3), t (3,), s scalar).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    if weights is None:
        w = jnp.ones(x.shape[:-1], x.dtype)
    else:
        w = weights.astype(x.dtype)
    wsum = jnp.maximum(w.sum(), eps)
    wn = (w / wsum)[..., None]  # (N, 1)

    mu_x = (wn * x).sum(axis=-2)
    mu_y = (wn * y).sum(axis=-2)
    xc = x - mu_x
    yc = y - mu_y

    # weighted cross-covariance  cov = sum_n w_n * yc_n xc_n^T
    cov = jnp.einsum("n,ni,nj->ij", wn[..., 0], yc, xc)
    u, d, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(u @ vt)
    sgn = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), jnp.sign(det)])
    R = (u * sgn[None, :]) @ vt

    if compute_scaling:
        var_x = (wn[..., 0] * jnp.sum(xc * xc, axis=-1)).sum()
        s = (d * sgn).sum() / jnp.maximum(var_x, eps)
    else:
        s = jnp.ones_like(det)

    t = mu_y - s * (R @ mu_x)
    return R, t, s


def apply_similarity(x: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
                     s: jnp.ndarray) -> jnp.ndarray:
    """y = s * (x @ R^T) + t."""
    return s * (x @ R.T) + t
