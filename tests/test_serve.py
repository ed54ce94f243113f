"""Serving layer tests: PLY round-trip, scene assembly, sky mask."""

import numpy as np

from fast3r_tpu.serve.ply import read_ply, write_ply
from fast3r_tpu.serve.visualizer import assemble_scene, detect_sky_mask


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((100, 3)).astype(np.float32)
    cols = rng.random((100, 3)).astype(np.float32)
    path = str(tmp_path / "x.ply")
    write_ply(path, pts, cols)
    pts2, cols2 = read_ply(path)
    np.testing.assert_allclose(pts2, pts)
    assert cols2.dtype == np.uint8 and cols2.shape == (100, 3)


def test_assemble_scene_filters_by_confidence():
    rng = np.random.default_rng(1)
    H, W = 16, 24
    views, preds = [], []
    for v in range(2):
        conf = np.full((1, H, W), 2.0, np.float32)
        conf[0, :8] = 1.0  # low-confidence top half
        views.append({"img": rng.uniform(-1, 1, (1, H, W, 3)).astype(np.float32)})
        preds.append({
            "pts3d_in_other_view": rng.standard_normal((1, H, W, 3)).astype(np.float32),
            "conf": conf,
        })
    scene = assemble_scene(views, preds, use_local_head=False,
                           conf_percentile=60.0)
    assert len(scene["points"]) == 2 * (H // 2) * W
    assert scene["colors"].min() >= 0 and scene["colors"].max() <= 1


def test_sky_mask_detects_blue_sky():
    H, W = 32, 48
    img = np.full((H, W, 3), -1.0, np.float32)
    # top half: light blue sky (RGB ~ [0.55, 0.75, 0.95])
    img[:16] = np.array([0.1, 0.5, 0.9])
    not_sky = detect_sky_mask(img)
    assert not_sky.shape == (H, W)
    assert not_sky[:8].mean() < 0.5      # sky rows mostly masked
    assert not_sky[20:].mean() > 0.9     # ground rows kept


def test_confidence_colors_and_gif(tmp_path):
    from fast3r_tpu.serve.visualizer import (
        confidence_colors, render_scene_frame, render_scene_gif,
    )

    conf = 1.0 + np.exp(np.random.default_rng(0).standard_normal(100))
    cols = confidence_colors(conf)
    assert cols.shape == (100, 3)
    assert cols.min() >= 0.0 and cols.max() <= 1.0
    # monotone mapping endpoints: lowest conf -> blue-ish, highest -> red-ish
    lo, hi = np.argmin(conf), np.argmax(conf)
    assert cols[lo][2] > cols[lo][0]  # blue end of JET
    assert cols[hi][0] > cols[hi][2]  # red end of JET

    rng = np.random.default_rng(1)
    scene = {
        "points": rng.standard_normal((500, 3)),
        "colors": rng.random((500, 3)),
    }
    frame = render_scene_frame(scene, eye=np.array([0.0, 0.0, -5.0]),
                               target=np.zeros(3), hw=(64, 96))
    assert frame.shape == (64, 96, 3)
    assert (frame != 255).any()  # something was splatted

    path = render_scene_gif(scene, str(tmp_path / "orbit.gif"),
                            n_frames=4, hw=(48, 64))
    import PIL.Image

    im = PIL.Image.open(path)
    assert im.is_animated and im.n_frames == 4


def _sleepy_server(*args, port=None, **kwargs):  # spawn target for tests
    import time as _t

    _t.sleep(60)


def test_viser_server_manager_lifecycle():
    from fast3r_tpu.serve.server_manager import ViserServerManager

    m = ViserServerManager(port_range=(9000, 9002), target=_sleepy_server)
    try:
        p1 = m.start_server("alice")
        p2 = m.start_server("bob")
        assert p1 != p2 and len(m) == 2
        # restarting a session reuses the registry slot
        p1b = m.start_server("alice")
        assert len(m) == 2 and p1b in (9000, 9001, 9002)
        # port pool exhaustion is a clean error
        m.start_server("carol")
        import pytest as _pt

        with _pt.raises(RuntimeError):
            m.start_server("dave")
        assert m.stop_server("bob") and not m.stop_server("bob")
        # gc with age 0 collects everything
        assert m.gc(max_age_s=0.0) == 2 and len(m) == 0
    finally:
        m.shutdown()


def test_save_feedback(tmp_path):
    import json

    from fast3r_tpu.serve.server_manager import save_feedback

    path = str(tmp_path / "fb" / "feedback.jsonl")
    save_feedback(path, "great tool", {"session": "a"})
    save_feedback(path, "second")
    rows = [json.loads(l) for l in open(path)]
    assert [r["text"] for r in rows] == ["great tool", "second"]
    assert rows[0]["session"] == "a"
