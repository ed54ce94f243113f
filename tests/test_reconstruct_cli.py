"""End-to-end drive of the headless serving CLI (cli/reconstruct.py) in both
ingest modes: fused device preprocessing (uint8 -> one XLA program) and the
PIL host oracle.  Reference flow: fast3r/viz/demo.py process_images."""

import json
import os

import numpy as np
import PIL.Image
import pytest


def _write_images(tmp_path, shapes, n=3):
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        h, w = shapes[i % len(shapes)]
        small = rng.uniform(0, 255, (h // 8, w // 8, 3)).astype(np.uint8)
        img = PIL.Image.fromarray(small).resize((w, h), PIL.Image.BICUBIC)
        img.save(d / f"frame_{i:03d}.png")
    return str(d)


@pytest.mark.parametrize("host_preprocess", [False, True])
def test_reconstruct_cli_end_to_end(tmp_path, host_preprocess):
    from fast3r_tpu.cli.reconstruct import main

    src = _write_images(tmp_path, [(96, 128)])
    out = str(tmp_path / ("out_host" if host_preprocess else "out_dev"))
    argv = [src, "--out", out, "--size", "64", "--save-npz"]
    if host_preprocess:
        argv.append("--host-preprocess")
    main(argv)

    assert os.path.exists(os.path.join(out, "scene.ply"))
    with open(os.path.join(out, "poses.json")) as f:
        poses = json.load(f)
    assert len(poses["poses_c2w"]) == 3
    assert np.isfinite(np.asarray(poses["poses_c2w"])).all()
    npz = np.load(os.path.join(out, "view_0000.npz"))
    assert npz["pts3d_in_other_view"].shape[-1] == 3


def test_reconstruct_cli_mixed_shapes_falls_back_to_host(tmp_path, capsys):
    from fast3r_tpu.cli.reconstruct import main

    src = _write_images(tmp_path, [(96, 128), (128, 96)], n=2)
    out = str(tmp_path / "out_mixed")
    main([src, "--out", out, "--size", "64"])
    assert "mixed raw shapes -> host preprocessing" in capsys.readouterr().out
    assert os.path.exists(os.path.join(out, "scene.ply"))


def test_reconstruct_cli_frame_and_head_knobs(tmp_path):
    """--frame (playback-timestep export) and --head (global/local source)
    parity knobs (VERDICT r4 #5; viser timestep + head toggles)."""
    from fast3r_tpu.cli.reconstruct import main
    from fast3r_tpu.serve.ply import read_ply

    src = _write_images(tmp_path, [(96, 128)])
    out_all = str(tmp_path / "out_all")
    out_one = str(tmp_path / "out_one")
    main([src, "--out", out_all, "--size", "64", "--head", "global"])
    main([src, "--out", out_one, "--size", "64", "--head", "global",
          "--frame", "0"])
    pts_all, _ = read_ply(os.path.join(out_all, "scene.ply"))
    pts_one, _ = read_ply(os.path.join(out_one, "scene.ply"))
    # frame 0 only -> exactly one view's worth of the 3-view cloud
    assert len(pts_one) == len(pts_all) // 3
