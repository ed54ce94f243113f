"""Headless reconstruction CLI: images/video -> pointmaps + poses + PLY.

This is the serving path of the reference demo (fast3r/viz/demo.py
process_images: load_images -> inference -> align local to global -> pose
estimation -> visualization) without the Gradio/Viser UI:

    python -m fast3r_tpu.cli.reconstruct IMAGE_DIR --out OUT_DIR \
        [--checkpoint HF_DIR] [--size 512] [--backend cv2|jax]

Writes: scene.ply (merged colored cloud), poses.json (per-view c2w + focals),
and per-view .npz pointmaps.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="Fast3R reconstruction")
    ap.add_argument("images", help="image folder, list, or video file")
    ap.add_argument("--out", default="recon_out")
    ap.add_argument("--checkpoint", default=None,
                    help="HF-format checkpoint dir/repo or a fast3r_tpu run "
                         "dir; random weights if omitted")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--backend", default="jax", choices=["jax", "cv2"],
                    help="pose extraction: on-device jitted RANSAC-PnP "
                         "(default) or host cv2 SQPNP (parity oracle)")
    ap.add_argument("--conf-percentile", type=float, default=10.0)
    ap.add_argument("--frame", type=int, default=None,
                    help="export only frames [0..FRAME] — the headless "
                         "equivalent of the viser playback timestep "
                         "(serve/viser_server.py)")
    ap.add_argument("--head", default="local", choices=["local", "global"],
                    help="point source: aligned local head (default) or the "
                         "global head — the viser Global/Local toggles")
    ap.add_argument("--mask-sky", action="store_true")
    ap.add_argument("--save-npz", action="store_true")
    ap.add_argument("--gif", action="store_true",
                    help="also render an orbit GIF of the merged cloud")
    ap.add_argument("--color-mode", default="rgb", choices=["rgb", "conf"],
                    help="point colors: image RGB or confidence heatmap")
    ap.add_argument("--host-preprocess", action="store_true",
                    help="resize/crop/normalize on host with PIL (the parity "
                         "oracle) instead of fused on device; the device path "
                         "is automatic only when all frames share one raw "
                         "shape")
    args = ap.parse_args(argv)

    import numpy as np

    from fast3r_tpu.eval.pose import estimate_camera_poses
    from fast3r_tpu.eval.recon import align_local_pts3d_to_global
    from fast3r_tpu.inference import Fast3R, inference
    from fast3r_tpu.models.fast3r import Fast3RConfig
    from fast3r_tpu.serve.visualizer import assemble_scene, export_scene_ply
    from fast3r_tpu.utils.image import load_images

    src = args.images
    if src.endswith((".mp4", ".mov", ".avi", ".webm")):
        from fast3r_tpu.serve.video import extract_frames_from_video

        src = extract_frames_from_video(src, os.path.join(args.out, "frames"))

    if args.checkpoint:
        # load_model handles both run dirs (config.yaml + orbax checkpoint)
        # and HF-format dirs/repos
        from fast3r_tpu.utils.checkpoint_utils import load_model

        model = load_model(args.checkpoint)
    else:
        print("WARNING: no checkpoint given; using random weights (smoke run)")
        model = Fast3R.from_random(Fast3RConfig.tiny())

    # fused device-ingest path (one XLA program from raw uint8 frames to
    # pointmaps) whenever all frames share one raw shape; PIL host path
    # otherwise or on request
    raw = None
    if not args.host_preprocess:
        from fast3r_tpu.utils.image import load_images_raw

        frames = load_images_raw(src, verbose=True)
        if len({f.shape for f in frames}) == 1:
            raw = frames
        else:
            print(" (mixed raw shapes -> host preprocessing)")

    if raw is not None:
        from fast3r_tpu.inference import inference_from_raw

        result = inference_from_raw(raw, model, size=args.size, verbose=True)
        views = result["views"]
    else:
        views = load_images(src, size=args.size)
        result = inference(views, model, verbose=True)
    preds = result["preds"]
    align_local_pts3d_to_global(preds, min_conf_thr_percentile=85.0)

    poses, focals = estimate_camera_poses(preds, backend=args.backend)

    os.makedirs(args.out, exist_ok=True)
    scene_views, scene_preds = views, preds
    if args.frame is not None:
        t = max(0, min(args.frame, len(views) - 1))
        scene_views, scene_preds = views[:t + 1], preds[:t + 1]
    scene = assemble_scene(scene_views, scene_preds,
                           use_local_head=args.head == "local",
                           conf_percentile=args.conf_percentile,
                           mask_sky=args.mask_sky)
    if args.color_mode == "conf":
        from fast3r_tpu.serve.visualizer import confidence_colors

        confs = np.concatenate([
            np.asarray(p["conf_local" if args.head == "local"
                         and "pts3d_local_aligned_to_global" in p
                         else "conf"])[0][f["mask"]]
            for p, f in zip(scene_preds, scene["per_frame"])
        ])
        scene["colors"] = confidence_colors(confs)
    ply_path = export_scene_ply(os.path.join(args.out, "scene.ply"), scene)
    if args.gif:
        from fast3r_tpu.serve.visualizer import render_scene_gif

        render_scene_gif(scene, os.path.join(args.out, "orbit.gif"))
    with open(os.path.join(args.out, "poses.json"), "w") as f:
        json.dump({
            "poses_c2w": [p.tolist() for p in poses[0]],
            "focals": [float(x) if x is not None else None
                       for x in focals[0]],
        }, f, indent=2)
    if args.save_npz:
        for i, p in enumerate(preds):
            np.savez(os.path.join(args.out, f"view_{i:04d}.npz"), **p)

    print(f"wrote {ply_path} ({len(scene['points'])} points) and poses.json")


if __name__ == "__main__":
    main()
