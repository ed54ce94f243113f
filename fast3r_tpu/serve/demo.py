"""Gradio web demo.

Behavioral reference: fast3r/viz/demo.py — upload images or a video, run
inference, align local->global (percentile 85), launch a per-session Viser
server, show profiling info.  Requires the optional `gradio` (+`viser`)
packages; the headless equivalent is fast3r_tpu.cli.reconstruct.

    python -m fast3r_tpu.serve.demo --checkpoint HF_DIR [--port 7860]
"""

from __future__ import annotations

import argparse
import os
import tempfile
from typing import List, Optional


def create_demo(model, viser_port_range=(8020, 8100)):
    import gradio as gr

    from fast3r_tpu.eval.recon import align_local_pts3d_to_global
    from fast3r_tpu.inference import inference
    from fast3r_tpu.serve.visualizer import assemble_scene, export_scene_ply
    from fast3r_tpu.utils.image import load_images

    from fast3r_tpu.serve.server_manager import ViserServerManager, save_feedback

    try:
        import viser  # noqa: F401

        manager = ViserServerManager(port_range=viser_port_range)
    except ImportError:
        manager = None  # PLY viewer only

    feedback_path = os.path.join(tempfile.gettempdir(),
                                 "fast3r_tpu_feedback.jsonl")

    def process_images(files: Optional[List], video,
                       conf_percentile: float,
                       request: "gr.Request" = None):
        paths = [f.name for f in (files or [])]
        workdir = tempfile.mkdtemp()
        if video is not None:
            from fast3r_tpu.serve.video import extract_frames_from_video

            frame_dir = extract_frames_from_video(video,
                                                  os.path.join(workdir, "fr"))
            paths = [os.path.join(frame_dir, p)
                     for p in sorted(os.listdir(frame_dir))]
        if not paths:
            return None, "upload images or a video"

        views = load_images(paths, size=512, verbose=False)
        result, info = inference(views, model, verbose=False, profiling=True)
        preds = result["preds"]
        align_local_pts3d_to_global(preds, min_conf_thr_percentile=85.0)
        scene = assemble_scene(views, preds, conf_percentile=conf_percentile)
        ply = export_scene_ply(os.path.join(workdir, "scene.ply"), scene)
        status = (f"{len(views)} views, {len(scene['points'])} points, "
                  f"forward {info['total_time']:.2f}s")
        if manager is not None:
            # per-session interactive Viser server (reference demo.py:64-235)
            session = getattr(request, "session_hash", None) or "default"
            manager.gc(max_age_s=3600.0)
            port = manager.start_server(
                session, {"views": views, "preds": preds})
            status += f"; viser on port {port}"
        return ply, status

    def submit_feedback(text: str, request: "gr.Request" = None):
        if not text:
            return "enter feedback first"
        save_feedback(feedback_path, text,
                      {"session": getattr(request, "session_hash", None)})
        return "thanks — feedback saved"

    with gr.Blocks(title="Fast3R (TPU)") as demo:
        gr.Markdown("# Fast3R — 3D reconstruction from unposed images")
        with gr.Row():
            files = gr.File(file_count="multiple", label="images")
            video = gr.Video(label="or a video")
        conf = gr.Slider(0, 99, value=10, label="confidence percentile")
        btn = gr.Button("Reconstruct")
        out_ply = gr.Model3D(label="reconstruction")
        status = gr.Textbox(label="status")
        btn.click(process_images, [files, video, conf], [out_ply, status])
        with gr.Row():
            fb = gr.Textbox(label="feedback")
            fb_btn = gr.Button("Send feedback")
        fb_status = gr.Textbox(label="", interactive=False)
        fb_btn.click(submit_feedback, [fb], [fb_status])
    return demo


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args(argv)

    try:
        import gradio  # noqa: F401
    except ImportError:
        raise SystemExit(
            "gradio is not installed; use `python -m fast3r_tpu.cli.reconstruct`"
            " for headless reconstruction")

    from fast3r_tpu.utils.checkpoint_utils import load_model

    model = load_model(args.checkpoint)
    create_demo(model).launch(server_port=args.port)


if __name__ == "__main__":
    main()
