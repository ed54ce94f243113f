"""PLY point-cloud export (reference viser_visualizer.py:228 export path)."""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np


def write_ply(path: str, points: np.ndarray,
              colors: Optional[np.ndarray] = None) -> None:
    """Write an (N, 3) point cloud (+ optional float [0,1] or uint8 colors)
    as binary little-endian PLY."""
    points = np.asarray(points, np.float32).reshape(-1, 3)
    n = len(points)
    has_color = colors is not None
    if has_color:
        colors = np.asarray(colors)
        if colors.dtype != np.uint8:
            colors = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
        colors = colors.reshape(-1, 3)
        assert len(colors) == n

    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}",
              "property float x", "property float y", "property float z"]
    if has_color:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header.append("end_header")

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if has_color:
            rec = np.zeros(n, dtype=[("xyz", np.float32, 3),
                                     ("rgb", np.uint8, 3)])
            rec["xyz"] = points
            rec["rgb"] = colors
            f.write(rec.tobytes())
        else:
            f.write(points.tobytes())


def read_ply(path: str):
    """Minimal reader for the files written by write_ply (tests)."""
    with open(path, "rb") as f:
        line = f.readline().strip()
        assert line == b"ply"
        n = 0
        has_color = False
        while True:
            line = f.readline().strip()
            if line.startswith(b"element vertex"):
                n = int(line.split()[-1])
            if line.startswith(b"property uchar"):
                has_color = True
            if line == b"end_header":
                break
        if has_color:
            rec = np.frombuffer(
                f.read(), dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)],
                count=n)
            return rec["xyz"].copy(), rec["rgb"].copy()
        pts = np.frombuffer(f.read(), dtype=np.float32, count=n * 3)
        return pts.reshape(n, 3).copy(), None
