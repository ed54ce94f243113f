"""Video frame extraction (reference fast3r/viz/video_utils.py:16-60)."""

from __future__ import annotations

import os
import shutil
import subprocess


def extract_frames_from_video(video_path: str, output_dir: str,
                              fps: float = 2.0) -> str:
    """Extract frames with ffmpeg (preferred) or OpenCV fallback; returns the
    output directory for load_images()."""
    os.makedirs(output_dir, exist_ok=True)
    if shutil.which("ffmpeg"):
        subprocess.run(
            ["ffmpeg", "-y", "-loglevel", "error", "-i", video_path,
             "-vf", f"fps={fps}",
             os.path.join(output_dir, "frame_%05d.jpg")],
            check=True,
        )
        return output_dir

    import cv2

    cap = cv2.VideoCapture(video_path)
    native_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    step = max(1, int(round(native_fps / fps)))
    i = saved = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % step == 0:
            cv2.imwrite(os.path.join(output_dir, f"frame_{saved:05d}.jpg"),
                        frame)
            saved += 1
        i += 1
    cap.release()
    if saved == 0:
        raise IOError(f"no frames extracted from {video_path}")
    return output_dir
