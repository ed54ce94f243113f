"""Gradio web demo.

Behavioral reference: fast3r/viz/demo.py:271-1100 — upload images (with a
gallery preview) or a video, pick an inference resolution, run inference,
align local->global (percentile 85), launch a per-session Viser server,
report the per-phase processing speed, collect thumbs-up/down + free-text
feedback, and clean sessions up (explicit delete callback + periodic GC).
Requires the optional `gradio` (+`viser`) packages; the headless equivalent
is fast3r_tpu.cli.reconstruct.

    python -m fast3r_tpu.serve.demo --checkpoint HF_DIR [--port 7860]
"""

from __future__ import annotations

import argparse
import os
import tempfile
import threading
from typing import List, Optional

RESOLUTION_CHOICES = (512, 384, 224)
GC_INTERVAL_S = 600.0
GC_MAX_AGE_S = 3600.0


def _speed_report(views, info) -> str:
    """The reference's 'Processing Speed' box (demo.py:594-637): total +
    per-phase breakdown from the inference profiling keys."""
    lines = [f"{len(views)} views in {info['total_time']:.2f}s "
             f"({len(views) / max(info['total_time'], 1e-9):.1f} img/s)"]
    for key in ("encode_images_time", "decoder_time", "head_forward_time"):
        if key in info:
            lines.append(f"  {key.replace('_time', '')}: {info[key]:.2f}s")
    return "\n".join(lines)


def create_demo(model, viser_port_range=(8020, 8100)):
    import gradio as gr

    from fast3r_tpu.eval.recon import align_local_pts3d_to_global
    from fast3r_tpu.inference import inference
    from fast3r_tpu.serve.server_manager import ViserServerManager, save_feedback
    from fast3r_tpu.serve.visualizer import assemble_scene, export_scene_ply
    from fast3r_tpu.utils.image import load_images

    try:
        import viser  # noqa: F401

        manager = ViserServerManager(port_range=viser_port_range)
    except ImportError:
        manager = None  # PLY viewer only

    feedback_path = os.path.join(tempfile.gettempdir(),
                                 "fast3r_tpu_feedback.jsonl")

    # periodic session GC (the reference's delete-timer equivalent,
    # demo.py:650-694): a daemon timer chain reaps idle viser sessions
    def _gc_tick():
        if manager is not None:
            manager.gc(max_age_s=GC_MAX_AGE_S)
        t = threading.Timer(GC_INTERVAL_S, _gc_tick)
        t.daemon = True
        t.start()
        return t

    gc_timer = _gc_tick()

    def update_gallery(files: Optional[List]):
        """Gallery preview of the uploaded images (demo.py:253-268)."""
        return [f.name for f in (files or [])]

    def process_images(files: Optional[List], video,
                       conf_percentile: float,
                       resolution=512,
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

        views = load_images(paths, size=int(resolution), verbose=False)
        result, info = inference(views, model, verbose=False, profiling=True)
        preds = result["preds"]
        align_local_pts3d_to_global(preds, min_conf_thr_percentile=85.0)
        scene = assemble_scene(views, preds, conf_percentile=conf_percentile)
        ply = export_scene_ply(os.path.join(workdir, "scene.ply"), scene)
        status = (f"{len(scene['points'])} points @ {resolution}px\n"
                  + _speed_report(views, info))
        if manager is not None:
            # per-session interactive Viser server (reference demo.py:64-235)
            session = getattr(request, "session_hash", None) or "default"
            manager.gc(max_age_s=GC_MAX_AGE_S)
            port = manager.start_server(
                session, {"views": views, "preds": preds})
            status += f"\nviser on port {port}"
        return ply, status

    def submit_feedback(text: str, rating: str = "",
                        request: "gr.Request" = None):
        if not text and not rating:
            return "enter feedback first"
        save_feedback(feedback_path, text,
                      {"session": getattr(request, "session_hash", None),
                       "rating": rating})
        return "thanks — feedback saved"

    def end_session(request: "gr.Request" = None):
        """Explicit per-session viser cleanup (the reference's gr.State
        delete_callback, demo.py:650-658 + :963)."""
        if manager is None:
            return "no viser sessions"
        session = getattr(request, "session_hash", None) or "default"
        manager.stop_server(session)
        return f"session {session!r} released"

    with gr.Blocks(title="Fast3R (TPU)") as demo:
        gr.Markdown("# Fast3R — 3D reconstruction from unposed images")
        with gr.Row():
            files = gr.File(file_count="multiple", label="images")
            video = gr.Video(label="or a video")
        gallery = gr.Gallery(label="uploaded scene", columns=6)
        resolution = gr.Radio(
            choices=[str(r) for r in RESOLUTION_CHOICES], value="512",
            label="inference resolution (px)")
        conf = gr.Slider(0, 99, value=10, label="confidence percentile")
        btn = gr.Button("Reconstruct")
        out_ply = gr.Model3D(label="reconstruction")
        status = gr.Textbox(label="processing speed", lines=5)
        if hasattr(files, "change"):
            files.change(update_gallery, [files], [gallery])
        btn.click(process_images, [files, video, conf, resolution],
                  [out_ply, status])
        with gr.Row():
            up = gr.Button("\U0001F44D Love it!")
            down = gr.Button("\U0001F44E Not quite there")
            fb = gr.Textbox(label="feedback")
            fb_btn = gr.Button("Send feedback")
        fb_status = gr.Textbox(label="", interactive=False)
        up.click(lambda request=None: submit_feedback(
            "", "thumbs_up", request), [], [fb_status])
        down.click(lambda request=None: submit_feedback(
            "", "thumbs_down", request), [], [fb_status])
        fb_btn.click(submit_feedback, [fb], [fb_status])
        end_btn = gr.Button("End session")
        end_btn.click(end_session, [], [fb_status])
    demo._fast3r = {"gc_timer": gc_timer, "manager": manager,
                    "update_gallery": update_gallery,
                    "end_session": end_session}
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
