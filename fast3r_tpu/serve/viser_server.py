"""Interactive Viser 3D visualization server.

Behavioral reference: fast3r/viz/viser_visualizer.py:267+ (start_visualization):
per-frame point clouds (global or aligned-local head), camera frustums from
the PnP pose estimates, confidence-percentile filtering slider, frame
playback, PLY export.  Requires the optional `viser` package.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

import numpy as np


def run_viser_server(output: Dict, port: int = 8020,
                     use_local_head: bool = True,
                     conf_percentile: float = 10.0,
                     point_size: float = 0.002,
                     blocking: bool = True):
    """Serve the reconstruction interactively.

    output: the `inference()` result dict ({"views", "preds"}).
    """
    import viser

    from fast3r_tpu.eval.pose import estimate_camera_poses
    from fast3r_tpu.serve.visualizer import assemble_scene

    views, preds = output["views"], output["preds"]
    server = viser.ViserServer(port=port)

    scene = assemble_scene(views, preds, use_local_head=use_local_head,
                           conf_percentile=conf_percentile)

    # point clouds per frame
    handles = []
    for i, frame in enumerate(scene["per_frame"]):
        handles.append(server.scene.add_point_cloud(
            f"/frames/{i}/points",
            points=frame["points"].reshape(-1, 3),
            colors=frame["colors"].reshape(-1, 3),
            point_size=point_size,
        ))

    # camera frustums from PnP (reference calls estimate_camera_poses inside
    # the visualizer, viser_visualizer.py)
    poses, focals = estimate_camera_poses(preds)
    for i, c2w in enumerate(poses[0]):
        img = np.asarray(views[i]["img"])
        if img.ndim == 4:
            img = img[0]
        h, w = img.shape[:2]
        import viser.transforms as tf

        server.scene.add_camera_frustum(
            f"/frames/{i}/camera",
            fov=2 * np.arctan2(h / 2, float(focals[0][i] or max(h, w))),
            aspect=w / h,
            scale=0.05,
            wxyz=tf.SO3.from_matrix(c2w[:3, :3]).wxyz,
            position=c2w[:3, 3],
            image=np.clip(img * 0.5 + 0.5, 0, 1),
        )

    # conf slider re-filtering
    slider = server.gui.add_slider("conf percentile", 0.0, 99.0, 1.0,
                                   conf_percentile)

    @slider.on_update
    def _(_evt) -> None:
        new_scene = assemble_scene(views, preds,
                                   use_local_head=use_local_head,
                                   conf_percentile=float(slider.value))
        for h, frame in zip(handles, new_scene["per_frame"]):
            h.points = frame["points"].reshape(-1, 3)
            h.colors = frame["colors"].reshape(-1, 3)

    print(f"viser server on port {port}")
    if blocking:
        while True:
            time.sleep(1.0)
    return server
