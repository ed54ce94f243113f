"""Scene assembly for visualization/serving.

Behavioral reference: fast3r/viz/viser_visualizer.py — per-frame point clouds
from the global or aligned-local head, confidence-percentile filtering, HSV
sky masking for outdoor scenes (:24-83), camera frustums from the PnP pose
estimates, PLY export (:228).  The interactive Viser server itself is gated on
the `viser` package (not bundled); everything else here is headless.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from fast3r_tpu.serve.ply import write_ply
from fast3r_tpu.utils.image import unnormalize_rgb


def detect_sky_mask(img_rgb: np.ndarray) -> np.ndarray:
    """HSV + morphology sky detection (viser_visualizer.py:24-83).

    img_rgb: (H, W, 3) in [-1, 1].  Returns int8 mask, 1 = NOT sky.
    """
    import cv2
    from scipy import ndimage

    img = ((img_rgb + 1) * 127.5).astype(np.uint8)
    hsv = cv2.cvtColor(cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                       cv2.COLOR_BGR2HSV)
    mask = cv2.inRange(hsv, np.array([105, 50, 140]),
                       np.array([135, 255, 255]))
    mask |= cv2.inRange(hsv, np.array([95, 5, 150]),
                        np.array([145, 100, 255]))
    mask |= cv2.inRange(hsv, np.array([0, 0, 235]),
                        np.array([180, 10, 255]))
    upper_third = int(mask.shape[0] * 0.4)
    upper = hsv[:upper_third]
    mask[:upper_third] |= ((upper[:, :, 1] < 50) & (upper[:, :, 2] > 150))
    kernel = np.ones((7, 7), np.uint8)
    mask = cv2.dilate(mask, kernel, iterations=1)
    mask = cv2.morphologyEx(mask, cv2.MORPH_OPEN, kernel).astype(bool)

    labels, num = ndimage.label(mask)
    if num > 0:
        top = set(labels[0, :]) - {0}
        if top:
            mask = np.isin(labels, list(top))
            labels, num = ndimage.label(mask)
            if num > 0:
                sizes = ndimage.sum(mask, labels, range(1, num + 1))
                mask = np.isin(labels, np.where(sizes > mask.size * 0.01)[0] + 1)
    return (~mask).astype(np.int8)


def is_outdoor_scene(not_sky_masks: Sequence[np.ndarray]) -> bool:
    """>= 1/4 of frames with > 20% sky (viser_visualizer.py:77-83)."""
    ratios = [1.0 - float(np.mean(m)) for m in not_sky_masks]
    return sum(r > 0.2 for r in ratios) >= len(ratios) / 4


def assemble_scene(
    views: Sequence[Dict],
    preds: Sequence[Dict],
    use_local_head: bool = True,
    conf_percentile: float = 10.0,
    mask_sky: bool = False,
) -> Dict:
    """Build a merged colored point cloud from per-view predictions.

    Returns {"points" (N,3), "colors" (N,3 in [0,1]), "per_frame": [...]}.
    """
    all_pts, all_cols, per_frame = [], [], []
    sky_masks = []
    for view, pred in zip(views, preds):
        key = ("pts3d_local_aligned_to_global"
               if use_local_head and "pts3d_local_aligned_to_global" in pred
               else "pts3d_in_other_view")
        conf_key = "conf_local" if "local" in key else "conf"
        pts = np.asarray(pred[key])[0]          # (H, W, 3)
        conf = np.asarray(pred[conf_key])[0]    # (H, W)
        img = np.asarray(view["img"])
        if img.ndim == 4:
            img = img[0]
        colors = unnormalize_rgb(img)

        thr = np.quantile(conf.reshape(-1), conf_percentile / 100.0)
        mask = conf >= thr
        if mask_sky:
            not_sky = detect_sky_mask(img).astype(bool)
            sky_masks.append(not_sky)
            mask &= not_sky
        per_frame.append({
            "points": pts[mask], "colors": colors[mask], "mask": mask,
        })
        all_pts.append(pts[mask])
        all_cols.append(colors[mask])
    return {
        "points": np.concatenate(all_pts) if all_pts else np.zeros((0, 3)),
        "colors": np.concatenate(all_cols) if all_cols else np.zeros((0, 3)),
        "per_frame": per_frame,
        "outdoor": is_outdoor_scene(sky_masks) if sky_masks else False,
    }


def export_scene_ply(path: str, scene: Dict) -> str:
    write_ply(path, scene["points"], scene["colors"])
    return path


def start_visualization(output: Dict, port: int = 8020, **kwargs):
    """Launch an interactive Viser server (reference viser_visualizer.py:267).

    Requires the optional `viser` package; the headless pipeline above covers
    environments without it.
    """
    try:
        import viser  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "viser is not installed; use assemble_scene/export_scene_ply for "
            "headless output, or install viser for the interactive server"
        ) from e

    from fast3r_tpu.serve.viser_server import run_viser_server

    return run_viser_server(output, port=port, **kwargs)


def confidence_colors(conf: np.ndarray, vmin: Optional[float] = None,
                      vmax: Optional[float] = None) -> np.ndarray:
    """Confidence-heatmap coloring (reference viser_visualizer.py's
    'confidence' color mode): JET colormap over log-confidence.

    conf: (N,) confidences (>= 1 from the 1+exp head).  Returns (N, 3) RGB
    in [0, 1].
    """
    import cv2

    x = np.log(np.maximum(np.asarray(conf, np.float64), 1e-8))
    lo = np.min(x) if vmin is None else np.log(max(vmin, 1e-8))
    hi = np.max(x) if vmax is None else np.log(max(vmax, 1e-8))
    t = np.clip((x - lo) / max(hi - lo, 1e-12), 0.0, 1.0)
    lut = cv2.applyColorMap(np.arange(256, dtype=np.uint8)[:, None],
                            cv2.COLORMAP_JET)[:, 0, ::-1]  # BGR -> RGB
    return lut[(t * 255).astype(np.uint8)].astype(np.float32) / 255.0


def _look_at(eye: np.ndarray, target: np.ndarray, up=(0.0, -1.0, 0.0)):
    fwd = target - eye
    fwd = fwd / (np.linalg.norm(fwd) + 1e-12)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right = right / (np.linalg.norm(right) + 1e-12)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd])  # world->cam rows (OpenCV convention)
    t = -R @ eye
    return R, t


def render_scene_frame(scene: Dict, eye: np.ndarray, target: np.ndarray,
                       hw=(480, 640), focal: float = 500.0,
                       background=(255, 255, 255)) -> np.ndarray:
    """Software point-splat render of the merged cloud from one camera.

    Headless equivalent of the reference's viser client render; z-buffered
    1-px splats.  Returns (H, W, 3) uint8.
    """
    H, W = hw
    pts = np.asarray(scene["points"], np.float64)
    cols = (np.asarray(scene["colors"]) * 255).astype(np.uint8)
    frame = np.full((H, W, 3), background, np.uint8)
    if len(pts) == 0:
        return frame
    R, t = _look_at(eye, target)
    cam = pts @ R.T + t
    z = cam[:, 2]
    front = z > 1e-6
    cam, z, cols = cam[front], z[front], cols[front]
    u = np.round(cam[:, 0] / z * focal + W / 2).astype(np.int64)
    v = np.round(cam[:, 1] / z * focal + H / 2).astype(np.int64)
    ok = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    u, v, z, cols = u[ok], v[ok], z[ok], cols[ok]
    order = np.argsort(-z)  # paint far->near so near wins
    frame[v[order], u[order]] = cols[order]
    return frame


def render_scene_gif(scene: Dict, path: str, n_frames: int = 24,
                     hw=(480, 640), fps: int = 8,
                     elevation: float = 0.35) -> str:
    """Render an orbit of the scene to a GIF (the reference's GIF export,
    viser_visualizer.py render tab) without a GPU/GL stack."""
    import PIL.Image

    pts = np.asarray(scene["points"], np.float64)
    if len(pts) == 0:
        center, radius = np.zeros(3), 1.0
    else:
        center = np.median(pts, axis=0)
        radius = float(np.quantile(
            np.linalg.norm(pts - center, axis=-1), 0.9)) + 1e-6
    frames = []
    for i in range(n_frames):
        ang = 2 * np.pi * i / n_frames
        eye = center + 2.5 * radius * np.array([
            np.sin(ang), -elevation, -np.cos(ang)])
        frames.append(PIL.Image.fromarray(
            render_scene_frame(scene, eye, center, hw=hw)))
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=int(1000 / fps), loop=0)
    return path
