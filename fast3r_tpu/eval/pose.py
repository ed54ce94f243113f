"""Camera pose estimation from predicted pointmaps.

Behavioral reference: MultiViewDUSt3RLitModule.estimate_camera_poses
(multiview_dust3r_module.py:807-869): per sample — estimate the focal from the
first view's global-head pointmap (Weiszfeld, conf-percentile 10), then
RANSAC-PnP per view using the conf > 1.0 mask; failures return identity.

Backends: "jax" (default — on-device, fully jitted batch PnP, no host round
trip; the BASELINE north star "pose extraction never round-trips to host")
and "cv2" (host, SQPNP — the reference-parity oracle).  Statistical
RRA@15/RTA@15 agreement between the two is gated by
tests/test_pose.py::test_backend_statistical_parity (50 randomized
noisy/outlier scenes).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fast3r_tpu.ops.geometry import xy_grid
from fast3r_tpu.ops.pnp import (
    estimate_focal_weiszfeld,
    fast_pnp_cv2,
    pnp_ransac_jax,
)


def _maybe_untranspose(arr: np.ndarray, hw) -> np.ndarray:
    """Swap a landscape-stored map back to its true portrait orientation.

    The model stores portrait head outputs transposed to landscape
    (models/fast3r.py:_run_head_oriented, mirroring transpose_to_landscape);
    pose estimation needs the pixel-grid <-> 3D correspondence in the TRUE
    orientation (reference correct_preds_orientation,
    multiview_dust3r_module.py:871-938).  Idempotent: only swaps when the
    stored shape is exactly the landscape-transposed one, so maps already
    corrected (or landscape views) pass through unchanged.
    """
    if hw is None:
        return arr
    h, w = int(hw[0]), int(hw[1])
    if h != w and arr.shape[0] == w and arr.shape[1] == h:
        return np.swapaxes(arr, 0, 1)
    return arr


def correct_preds_orientation(preds: Sequence[Dict],
                              views: Optional[Sequence[Dict]]) -> None:
    """*In-place* portrait un-transpose of predicted maps.

    Behavioral reference: MultiViewDUSt3RLitModule.correct_preds_orientation
    (multiview_dust3r_module.py:871-938) — the data loader transposes
    portrait inputs to landscape, so portrait samples' predicted pointmaps /
    confidence maps must be swapped back before pose estimation.  Each
    affected entry becomes a per-sample list (one batch may mix
    orientations, so per-sample shapes can differ), matching the reference's
    list-of-tensors output.  Safe to call twice (see _maybe_untranspose).
    """
    if views is None:
        return
    for pred, view in zip(preds, views):
        ts = np.asarray(view["true_shape"])
        keys = ["conf", "pts3d_in_other_view"]
        if "pts3d_local" in pred:
            keys += ["conf_local", "pts3d_local"]
            if "pts3d_local_aligned_to_global" in pred:
                keys.append("pts3d_local_aligned_to_global")
        for key in keys:
            arr = pred[key]
            pred[key] = [
                _maybe_untranspose(np.asarray(arr[i]), ts[i])
                for i in range(ts.shape[0])
            ]


def estimate_camera_poses(
    preds: Sequence[Dict],
    views: Optional[Sequence[Dict]] = None,
    niter_PnP: int = 10,
    focal_length_estimation_method: str = "first_view_from_global_head",
    backend: str = "jax",
    seed: int = 0,
) -> Tuple[List[List[np.ndarray]], List[List[Optional[float]]]]:
    """Estimate per-view c2w poses + focals.

    Args:
      preds: list over views of dicts with "pts3d_in_other_view" (B, H, W, 3)
        and "conf" (B, H, W) (numpy or jax arrays, or per-sample lists after
        correct_preds_orientation).
      views: list over views of dicts with "true_shape" (B, 2) — when given,
        portrait samples' maps are un-transposed to their true orientation
        before PnP (the reference applies correct_preds_orientation before
        calling this, module.py:748; passing views here folds that in) and
        the local-head focal path can auto-align.

    Returns:
      (poses_c2w [B][V] 4x4 arrays, focals [B][V]).
    """
    V = len(preds)
    # entries are (B, H, W, ...) arrays, or per-sample lists after
    # correct_preds_orientation — len() gives B for both
    B = len(preds[0]["pts3d_in_other_view"])

    use_local = focal_length_estimation_method == "first_view_from_local_head"
    if use_local and "pts3d_local_aligned_to_global" not in preds[0]:
        # the reference aligns local->global before pose eval
        # (module.py:743-745); do it here when the caller hasn't
        from fast3r_tpu.eval.recon import align_local_pts3d_to_global
        align_local_pts3d_to_global(preds, views)

    def sample_map(v: int, key: str, b: int) -> np.ndarray:
        arr = np.asarray(preds[v][key][b], np.float32)
        hw = np.asarray(views[v]["true_shape"])[b] if views is not None else None
        return _maybe_untranspose(arr, hw)

    poses_all, focals_all = [], []
    for b in range(B):
        sample = [
            {
                "pts3d": sample_map(v, "pts3d_in_other_view", b),
                "conf": sample_map(v, "conf", b),
            }
            for v in range(V)
        ]
        # focal from the first view (module.py:823-849): global-head maps, or
        # the aligned local-head maps for 'first_view_from_local_head'
        # (module.py:828-831: pts3d_local_aligned_to_global + conf_local)
        focal = None
        if use_local:
            focal = float(estimate_focal_weiszfeld(
                jnp.asarray(sample_map(0, "pts3d_local_aligned_to_global", b)),
                jnp.asarray(sample_map(0, "conf_local", b)),
                min_conf_percentile=10.0,
            ))
        elif focal_length_estimation_method == "first_view_from_global_head":
            focal = float(estimate_focal_weiszfeld(
                jnp.asarray(sample[0]["pts3d"]),
                jnp.asarray(sample[0]["conf"]),
                min_conf_percentile=10.0,
            ))
        elif focal_length_estimation_method != "individual":
            raise ValueError(focal_length_estimation_method)

        poses, focals = [], []
        if backend == "cv2":
            for v in range(V):
                mask = sample[v]["conf"] > 1.0  # module.py:1045
                f, c2w = fast_pnp_cv2(sample[v]["pts3d"], focal, mask,
                                      niter_PnP=niter_PnP)
                if c2w is None:
                    poses.append(np.eye(4))
                    focals.append(focal)
                else:
                    poses.append(c2w)
                    focals.append(f)
        elif backend == "jax":
            if focal is None:  # "individual": single Weiszfeld focal on-device
                focal = float(estimate_focal_weiszfeld(
                    jnp.asarray(sample[0]["pts3d"]),
                    jnp.asarray(sample[0]["conf"]),
                    min_conf_percentile=10.0))
            shapes = {s["pts3d"].shape for s in sample}
            if len(shapes) == 1:
                pts = jnp.asarray(np.stack([s["pts3d"] for s in sample]))
                conf = jnp.asarray(np.stack([s["conf"] for s in sample]))
                c2w, inl, f_used = _estimate_poses_jax_jit(
                    pts, conf, jnp.asarray(focal, pts.dtype),
                    jax.random.key(seed), max(niter_PnP, 32),
                )
                poses = [np.asarray(c2w[v]) for v in range(V)]
            else:
                # mixed per-view resolutions (e.g. mixed-orientation
                # scenes): one single-view jitted solve per distinct shape
                poses = []
                for v in range(V):
                    c2w, _, _ = _estimate_poses_jax_jit(
                        jnp.asarray(sample[v]["pts3d"])[None],
                        jnp.asarray(sample[v]["conf"])[None],
                        jnp.asarray(focal, jnp.float32),
                        jax.random.fold_in(jax.random.key(seed), v),
                        max(niter_PnP, 32),
                    )
                    poses.append(np.asarray(c2w[0]))
            focals = [float(focal)] * V
        else:
            raise ValueError(backend)
        poses_all.append(poses)
        focals_all.append(focals)
    return poses_all, focals_all


@functools.partial(jax.jit, static_argnames=("niter",))
def _estimate_poses_jax_jit(pts3d, conf, focal, key, niter):
    """Jit-cached device path (one compile per (V, H, W) shape)."""
    return estimate_poses_jax(pts3d, conf, focal=focal, niter=niter, key=key)


def estimate_poses_jax(
    pts3d: jnp.ndarray,
    conf: jnp.ndarray,
    focal: Optional[float] = None,
    niter: int = 32,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fully on-device pose estimation for V views of one sample.

    Args:
      pts3d: (V, H, W, 3) global-frame pointmaps; conf: (V, H, W).

    Returns:
      (c2w (V, 4, 4), inlier_counts (V,), focal used).
    """
    V, H, W, _ = pts3d.shape
    if key is None:
        key = jax.random.key(0)
    if focal is None:
        focal = estimate_focal_weiszfeld(pts3d[0], conf[0],
                                         min_conf_percentile=10.0)
    focal = jnp.asarray(focal, pts3d.dtype)
    pp = jnp.array([W / 2.0, H / 2.0], pts3d.dtype)
    pixels = xy_grid(W, H, dtype=pts3d.dtype).reshape(-1, 2)

    def per_view(args):
        p, c, k = args
        mask = c.reshape(-1) > 1.0
        return pnp_ransac_jax(p.reshape(-1, 3), pixels, mask, focal, pp, k,
                              iters=niter)

    keys = jax.random.split(key, V)
    c2w, inl = jax.lax.map(per_view, (pts3d, conf, keys))
    return c2w, inl, focal
