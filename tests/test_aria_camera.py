"""Fisheye624 camera model + ASE loader tests."""

import os
import os.path as osp

import numpy as np
import pytest

from fast3r_tpu.data.aria_camera import (
    FISHEYE_CAM_PARAMS,
    PINHOLE_CAM_PARAMS,
    fisheye624_project,
    fisheye624_unproject,
    pinhole_project,
    pinhole_unproject,
    undistort_fisheye_to_pinhole_rgbd,
)


def test_fisheye624_project_unproject_roundtrip():
    """unproject(project(ray)) recovers the ray; pixel round trip < 1e-3 px."""
    rng = np.random.default_rng(0)
    # rays within the fisheye FoV
    ab = rng.uniform(-1.5, 1.5, size=(500, 2))
    rays = np.concatenate([ab, np.ones((500, 1))], axis=-1)
    uv = fisheye624_project(rays, FISHEYE_CAM_PARAMS)
    rays2 = fisheye624_unproject(uv, FISHEYE_CAM_PARAMS)
    uv2 = fisheye624_project(rays2, FISHEYE_CAM_PARAMS)
    np.testing.assert_allclose(uv2, uv, atol=1e-3)
    # ray direction recovered (unit-z normalization)
    np.testing.assert_allclose(rays2[:, :2] / rays2[:, 2:3], ab, atol=1e-4)


def test_reference_fisheye_math_parity():
    """Project matches the reference torch implementation bit-for-bit-ish."""
    import sys

    import torch

    from tests.ref_loader import REF_ROOT, install_ref_stubs

    install_ref_stubs()  # the aria package parent imports torchvision etc.
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from fast3r.dust3r.datasets.aria.camera_utils import (
        fisheye624_project as ref_project,
    )

    rng = np.random.default_rng(1)
    rays = np.concatenate(
        [rng.uniform(-1.0, 1.0, size=(200, 2)), np.ones((200, 1))], axis=-1
    ).astype(np.float32)
    params_t = torch.tensor(FISHEYE_CAM_PARAMS, dtype=torch.float32)[None]
    ref = ref_project(torch.from_numpy(rays)[None], params_t)[0].numpy()
    mine = fisheye624_project(rays, FISHEYE_CAM_PARAMS)
    np.testing.assert_allclose(mine, ref, atol=1e-2)


def test_undistort_preserves_center():
    """The principal-point neighborhood maps ~identically (distortion ~ 0 at
    the center), so a bright dot at the center survives rectification."""
    h = w = 128
    # shrink the camera to a 128x128 toy by scaling f and c
    scale = 128 / 704.0
    fish = FISHEYE_CAM_PARAMS.copy()
    fish[0] *= scale
    fish[1:3] = [w / 2, h / 2]
    pin = PINHOLE_CAM_PARAMS.copy()
    pin[0:2] *= scale
    pin[2:4] = [w / 2, h / 2]

    img = np.zeros((h, w, 3), np.float32)
    img[h // 2 - 2:h // 2 + 2, w // 2 - 2:w // 2 + 2] = 255.0
    depth = np.full((h, w), 2000.0, np.float32)
    out_img, out_depth = undistort_fisheye_to_pinhole_rgbd(img, depth, fish, pin)
    assert out_img[h // 2, w // 2].max() > 200
    # center ray is on-axis: z-depth == range
    np.testing.assert_allclose(out_depth[h // 2, w // 2], 2000.0, rtol=1e-3)


def test_ase_loader_fixture(tmp_path):
    import cv2
    from scipy.spatial.transform import Rotation as R

    from fast3r_tpu.data.dsl import build_dataset

    rng = np.random.default_rng(2)
    scene = tmp_path / "ase" / "scene0000"
    os.makedirs(scene / "rgb")
    os.makedirs(scene / "depth")
    lines = ["header"]
    for i in range(5):
        img = rng.integers(0, 255, (704, 704, 3), dtype=np.uint8)
        cv2.imwrite(str(scene / "rgb" / f"vignette{i:07d}.jpg"), img)
        cv2.imwrite(str(scene / "depth" / f"depth{i:07d}.png"),
                    rng.integers(800, 4000, (704, 704)).astype(np.uint16))
        q = R.from_euler("y", 0.1 * i).as_quat()  # xyzw
        lines.append(
            f"dev,{i},graph,{0.2 * i},0,0,{q[0]},{q[1]},{q[2]},{q[3]},x")
    (scene / "trajectory.csv").write_text("\n".join(lines) + "\n")

    ds = build_dataset(
        f"ASE_Multiview(ROOT='{tmp_path / 'ase'}', split='train', num_views=3, "
        f"window_size=5, num_samples_per_window=2, resolution=[(64, 48)], "
        f"seed=777)"
    )
    assert len(ds) > 0
    views = ds[(0, 0)]
    assert len(views) == 3
    assert views[0]["dataset"] == "ASE"
    assert views[0]["img"].shape == (48, 64, 3)
    assert views[0]["valid_mask"].any()
    assert np.isfinite(views[0]["camera_pose"]).all()


def test_vignette_corrector_with_calibration(tmp_path):
    """Correction math vs the reference (camera_utils.py:101-116): divide by
    the clamped vignette, clip to [0,255], zero where the vignette is zero."""
    import cv2

    from fast3r_tpu.data.aria_camera import VignetteCorrector

    H, W = 8, 10
    vig = np.full((H, W, 3), 128, np.uint8)   # 0.5 gain everywhere...
    vig[0, 0] = 0                              # ...except a dead pixel
    path = str(tmp_path / "vig.png")
    cv2.imwrite(path, vig)

    vc = VignetteCorrector(path)
    img = np.full((H, W, 3), 100, np.float32)
    out = vc.correct(img)
    # 100 / (128/255) = 199.2...
    np.testing.assert_allclose(out[1, 1], 100 / (128 / 255), rtol=1e-5)
    assert (out[0, 0] == 0).all()              # dead pixel zeroed
    out2 = vc.correct(np.full((H, W, 3), 250, np.float32))
    assert out2.max() <= 255.0                 # clipped

    # identity without a calibration file
    vc_id = VignetteCorrector(None)
    np.testing.assert_array_equal(vc_id.correct(img), img)
