"""Real dataset loaders exercised against synthetic on-disk fixtures in the
documented file formats (no real data ships with the repo)."""

import json
import os
import os.path as osp

import cv2
import numpy as np
import PIL.Image
import pytest

from fast3r_tpu.data.dsl import build_dataset

H_SRC, W_SRC = 96, 128
RES = [(64, 48)]


def _write_jpg(path, rng):
    os.makedirs(osp.dirname(path), exist_ok=True)
    PIL.Image.fromarray(
        rng.integers(0, 255, (H_SRC, W_SRC, 3), dtype=np.uint8)
    ).save(path)


def _intrinsics():
    return np.array([[100.0, 0, W_SRC / 2], [0, 100.0, H_SRC / 2], [0, 0, 1]],
                    np.float32)


def _pose(i):
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0.1 * i, 0, 0]
    return T


@pytest.fixture
def scannetpp_root(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "scannetpp"
    n_imgs = 8
    scenes = np.array(["scene_a"])
    sceneids = np.zeros(n_imgs, np.int64)
    images = np.array([f"frame_{i:05d}" for i in range(n_imgs)])
    intrinsics = np.stack([_intrinsics()] * n_imgs)
    trajectories = np.stack([_pose(i) for i in range(n_imgs)])
    os.makedirs(root, exist_ok=True)
    np.savez(root / "all_metadata.npz", scenes=scenes, sceneids=sceneids,
             images=images, intrinsics=intrinsics, trajectories=trajectories)
    for i in range(n_imgs):
        _write_jpg(str(root / "scene_a" / "images" / f"frame_{i:05d}.jpg"), rng)
        dpath = root / "scene_a" / "depth" / f"frame_{i:05d}.png"
        os.makedirs(dpath.parent, exist_ok=True)
        depth_mm = rng.integers(500, 5000, (H_SRC, W_SRC)).astype(np.uint16)
        cv2.imwrite(str(dpath), depth_mm)
    return str(root)


def test_scannetpp_loader(scannetpp_root):
    ds = build_dataset(
        f"ScanNetpp_Multiview(split='train', num_views=3, window_size=8, "
        f"num_samples_per_window=2, ROOT='{scannetpp_root}', "
        f"resolution={RES!r}, seed=777)"
    )
    assert len(ds) > 0
    views = ds[(0, 0)]
    assert len(views) == 3
    v = views[0]
    assert v["img"].shape == (48, 64, 3)
    assert v["depthmap"].shape == (48, 64)
    assert v["valid_mask"].any()
    assert v["dataset"] == "ScanNet++"
    # determinism with seed
    views2 = ds[(0, 0)]
    np.testing.assert_array_equal(views[1]["img"], views2[1]["img"])


@pytest.fixture
def co3d_root(tmp_path):
    rng = np.random.default_rng(1)
    root = tmp_path / "co3d"
    os.makedirs(root, exist_ok=True)
    n_frames = 100
    frames = list(range(1, n_frames + 1))
    with open(root / "selected_seqs_train.json", "w") as f:
        json.dump({"teddybear": {"seq1": frames}}, f)
    for i in frames[:30]:  # only first 30 frames exist -> exercises retry
        imdir = root / "teddybear" / "seq1"
        _write_jpg(str(imdir / "images" / f"frame{i:06d}.jpg"), rng)
        np.savez(imdir / "images" / f"frame{i:06d}.npz",
                 camera_pose=_pose(i), camera_intrinsics=_intrinsics(),
                 maximum_depth=np.float32(10.0))
        ddir = imdir / "depths"
        os.makedirs(ddir, exist_ok=True)
        cv2.imwrite(str(ddir / f"frame{i:06d}.jpg.geometric.png"),
                    rng.integers(1000, 60000, (H_SRC, W_SRC)).astype(np.uint16))
        mdir = imdir / "masks"
        os.makedirs(mdir, exist_ok=True)
        cv2.imwrite(str(mdir / f"frame{i:06d}.png"),
                    np.full((H_SRC, W_SRC), 255, np.uint8))
    return str(root)


def test_co3d_loader(co3d_root):
    ds = build_dataset(
        f"Co3d_Multiview(split='train', num_views=4, window_degree_range=360, "
        f"num_samples_per_window=2, ROOT='{co3d_root}', mask_bg='rand', "
        f"resolution={RES!r}, seed=777)"
    )
    views = ds[(0, 0)]
    assert len(views) == 4
    assert views[0]["dataset"] == "Co3d_v2"
    assert views[0]["depthmap"].max() <= 10.0
    assert views[0]["valid_mask"].any()


@pytest.fixture
def sevenscenes_root(tmp_path):
    rng = np.random.default_rng(2)
    root = tmp_path / "7scenes"
    scene = root / "chess" / "seq-01"
    os.makedirs(scene, exist_ok=True)
    with open(root / "chess" / "TestSplit.txt", "w") as f:
        f.write("sequence1\n")
    # 7-Scenes uses fixed 640x480 intrinsics (cx=320, cy=240)
    for i in range(6):
        img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        cv2.imwrite(str(scene / f"frame-{i:06d}.color.png"), img)
        depth = rng.integers(500, 5000, (480, 640)).astype(np.uint16)
        depth[0, 0] = 65535  # invalid marker
        cv2.imwrite(str(scene / f"frame-{i:06d}.depth.proj.png"), depth)
        np.savetxt(str(scene / f"frame-{i:06d}.pose.txt"), _pose(i))
    return str(root)


def test_sevenscenes_loader(sevenscenes_root):
    ds = build_dataset(
        f"SevenScenes(split='test', ROOT='{sevenscenes_root}', "
        f"resolution={RES!r}, num_seq=1, full_video=True, kf_every=2, "
        f"seed=777)"
    )
    assert len(ds) == 1
    views = ds[(0, 0)]
    assert len(views) == 3  # 6 frames, kf_every=2
    assert views[0]["dataset"] == "7scenes"
    assert views[0]["valid_mask"].any()


@pytest.fixture
def nrgbd_root(tmp_path):
    rng = np.random.default_rng(3)
    root = tmp_path / "nrgbd"
    scene = root / "kitchen"
    os.makedirs(scene / "images", exist_ok=True)
    os.makedirs(scene / "depth", exist_ok=True)
    poses = []
    # NRGBD uses fixed 640x480 intrinsics
    for i in range(4):
        img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        cv2.imwrite(str(scene / "images" / f"img{i}.png"), img)
        cv2.imwrite(str(scene / "depth" / f"depth{i}.png"),
                    rng.integers(500, 5000, (480, 640)).astype(np.uint16))
        poses.append(_pose(i))
    with open(scene / "poses.txt", "w") as f:
        for p in poses:
            for row in p:
                f.write(" ".join(str(x) for x in row) + "\n")
    return str(root)


def test_nrgbd_loader(nrgbd_root):
    ds = build_dataset(
        f"NRGBD(split='test', ROOT='{nrgbd_root}', resolution={RES!r}, "
        f"num_seq=1, full_video=True, kf_every=1, seed=777)"
    )
    views = ds[(0, 0)]
    assert len(views) == 4
    assert views[0]["dataset"] == "nrgbd"
    assert views[0]["valid_mask"].any()


@pytest.fixture
def dtu_root(tmp_path):
    rng = np.random.default_rng(4)
    root = tmp_path / "dtu"
    scene = root / "scan1"
    for sub in ("images", "depths", "binary_masks", "cams"):
        os.makedirs(scene / sub, exist_ok=True)
    for i in range(4):
        name = f"{i:08d}"
        _write_jpg(str(scene / "images" / f"{name}.jpg"), rng)
        np.save(scene / "depths" / f"{name}.npy",
                rng.uniform(1, 5, (H_SRC, W_SRC)).astype(np.float32))
        cv2.imwrite(str(scene / "binary_masks" / f"{name}.png"),
                    np.full((H_SRC, W_SRC), 255, np.uint8))
        w2c = np.linalg.inv(_pose(i))
        K = _intrinsics()
        with open(scene / "cams" / f"{name}_cam.txt", "w") as f:
            f.write("extrinsic\n")
            for r in range(4):
                f.write(" ".join(str(x) for x in w2c[r]) + "\n")
            f.write("\nintrinsic\n")
            for r in range(3):
                f.write(" ".join(str(x) for x in K[r]) + "\n")
            f.write("\n425.0 2.5\n")
    return str(root)


def test_dtu_loader(dtu_root):
    ds = build_dataset(
        f"DTU(split='test', ROOT='{dtu_root}', resolution={RES!r}, "
        f"num_seq=1, full_video=True, kf_every=1, seed=777)"
    )
    views = ds[(0, 0)]
    assert len(views) == 4
    assert views[0]["dataset"] == "dtu"
    assert views[0]["valid_mask"].any()
    # c2w pose round trip: pose stored as inv(extrinsic)
    np.testing.assert_allclose(views[-1]["camera_pose"], _pose(0), atol=1e-5)
