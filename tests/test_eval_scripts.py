"""End-to-end smoke tests for the standalone eval scripts (BASELINE configs
3-4) on synthetic fixtures with a tiny random model in HF checkpoint format."""

import json
import os
import os.path as osp
import sys

import numpy as np
import PIL.Image
import pytest

SCRIPTS = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "scripts")
sys.path.insert(0, SCRIPTS)


@pytest.fixture(scope="module")
def tiny_hf_checkpoint(tmp_path_factory):
    from fast3r_tpu.inference import Fast3R
    from fast3r_tpu.models.fast3r import Fast3RConfig
    from fast3r_tpu.utils.checkpoint_utils import convert_checkpoint_to_hf

    model = Fast3R.from_random(Fast3RConfig.tiny())
    out = str(tmp_path_factory.mktemp("ckpt") / "tiny_hf")
    convert_checkpoint_to_hf(model, out)
    return out


def test_re10k_pose_eval_end_to_end(tiny_hf_checkpoint, tmp_path):
    import re10k_pose_eval

    rng = np.random.default_rng(0)
    scene = "000c09e7ea8d8fb9"
    vroot = tmp_path / "videos"
    troot = tmp_path / "txts"
    os.makedirs(vroot / scene)
    os.makedirs(troot)
    H0, W0 = 96, 128
    lines = ["https://example.com/watch"]
    for i in range(4):
        fid = f"{i * 1000}"
        PIL.Image.fromarray(
            rng.integers(0, 255, (H0, W0, 3), dtype=np.uint8)
        ).save(vroot / scene / f"{fid}.jpg")
        # normalized intrinsics + row-major 3x4 w2c
        w2c = np.eye(4)[:3]
        w2c[0, 3] = 0.1 * i
        vals = [fid, "0.8", "1.0", "0.5", "0.5", "0", "0"] + [
            f"{v:.9f}" for v in w2c.reshape(-1)
        ]
        lines.append(" ".join(vals))
    (troot / f"{scene}.txt").write_text("\n".join(lines) + "\n")
    scene_list = tmp_path / "list.txt"
    scene_list.write_text(scene + "\n")

    out = str(tmp_path / "res.json")
    re10k_pose_eval.main([
        "--video-root", str(vroot), "--txt-root", str(troot),
        "--checkpoint", tiny_hf_checkpoint, "--scene-list", str(scene_list),
        "--num-frames", "4", "--out", out,
    ])
    res = json.load(open(out))
    assert scene in res["per_scene"]
    assert {"RRA_at_15", "RTA_at_15", "mAA_30"} <= set(res["aggregate"])
    assert all(np.isfinite(v) for v in res["aggregate"].values())


def test_robustmvd_eval_end_to_end(tiny_hf_checkpoint, tmp_path):
    import robustmvd_eval

    rng = np.random.default_rng(1)
    root = tmp_path / "rmvd"
    scene = root / "scene0"
    os.makedirs(scene / "images")
    os.makedirs(scene / "depth")
    H0, W0 = 96, 128
    for i in range(3):
        PIL.Image.fromarray(
            rng.integers(0, 255, (H0, W0, 3), dtype=np.uint8)
        ).save(scene / "images" / f"{i:04d}.jpg")
    np.save(scene / "depth" / "0000.npy",
            rng.uniform(1.0, 5.0, (H0, W0)).astype(np.float32))

    out = str(tmp_path / "rmvd.json")
    robustmvd_eval.main([
        "--checkpoint", tiny_hf_checkpoint, "--data-root", str(root),
        "--views", "3", "--out", out,
    ])
    res = json.load(open(out))
    assert "scene0" in res["per_scene"]
    m = res["per_scene"]["scene0"]
    assert {"absrel", "inliers_1.03"} <= set(m)
    assert all(np.isfinite(v) for v in m.values())
