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
from fast3r_tpu.data.exr import write_exr

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


def make_co3d_root(root, declare_missing=True):
    """Plain builder (also imported by tests/test_eval_scripts.py to drive
    the eval presets through the CLI on CO3D-format fixtures).  With
    declare_missing the index lists 100 frames of which only 30 exist on
    disk (exercises the invalid-scene retry); without it every declared
    frame exists (for tests that must iterate the whole dataset)."""
    rng = np.random.default_rng(1)
    os.makedirs(root, exist_ok=True)
    n_frames = 100 if declare_missing else 30
    frames = list(range(1, n_frames + 1))
    with open(root / "selected_seqs_train.json", "w") as f:
        json.dump({"teddybear": {"seq1": frames}}, f)
    for i in frames[:30]:  # under declare_missing frames 31+ do not exist
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


@pytest.fixture
def co3d_root(tmp_path):
    return make_co3d_root(tmp_path / "co3d")


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


def make_sevenscenes_root(root):
    rng = np.random.default_rng(2)
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


@pytest.fixture
def sevenscenes_root(tmp_path):
    return make_sevenscenes_root(tmp_path / "7scenes")


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


def make_nrgbd_root(root):
    rng = np.random.default_rng(3)
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


@pytest.fixture
def nrgbd_root(tmp_path):
    return make_nrgbd_root(tmp_path / "nrgbd")


def test_nrgbd_loader(nrgbd_root):
    ds = build_dataset(
        f"NRGBD(split='test', ROOT='{nrgbd_root}', resolution={RES!r}, "
        f"num_seq=1, full_video=True, kf_every=1, seed=777)"
    )
    views = ds[(0, 0)]
    assert len(views) == 4
    assert views[0]["dataset"] == "nrgbd"
    assert views[0]["valid_mask"].any()


def make_dtu_root(root):
    rng = np.random.default_rng(4)
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


@pytest.fixture
def dtu_root(tmp_path):
    return make_dtu_root(tmp_path / "dtu")


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


@pytest.fixture
def blendmvs_root(tmp_path):
    """spann3r raw BlendedMVS layout: ROOT/scene/{blended_images,
    rendered_depth_maps,cams} + {split}_list.txt."""
    rng = np.random.default_rng(3)
    root = tmp_path / "blendmvs"
    scene = "5a0271884e62597cdee0d0eb"
    base = root / scene
    n = 6
    for i in range(n):
        name = f"{i:08d}"
        _write_jpg(str(base / "blended_images" / f"{name}.jpg"), rng)
        ddir = base / "rendered_depth_maps"
        os.makedirs(ddir, exist_ok=True)
        cv2.imwrite(str(ddir / f"{name}.pfm"),
                    rng.uniform(1.0, 5.0, (H_SRC, W_SRC)).astype(np.float32))
        cdir = base / "cams"
        os.makedirs(cdir, exist_ok=True)
        w2c = np.linalg.inv(_pose(i))
        K = _intrinsics()
        lines = ["extrinsic"]
        lines += [" ".join(f"{v:.6f}" for v in row) for row in w2c]
        lines += ["", "intrinsic"]
        lines += [" ".join(f"{v:.6f}" for v in row) for row in K]
        lines += ["", "1.0 0.01"]
        (cdir / f"{name}_cam.txt").write_text("\n".join(lines) + "\n")
    # pair.txt: each image lists all others as scored neighbors
    pair_lines = [str(n)]
    for i in range(n):
        others = [j for j in range(n) if j != i]
        pair_lines.append(str(i))
        pair_lines.append(
            f"{len(others)} " + " ".join(f"{j} {100 - abs(i - j)}"
                                         for j in others))
    (base / "cams" / "pair.txt").write_text("\n".join(pair_lines) + "\n")
    (root / "train_list.txt").write_text(scene + "\n")
    return str(root)


def test_blendmvs_spann3r_loader(blendmvs_root):
    ds = build_dataset(
        f"BlendMVS(split='train', num_frames=4, num_seq=2, "
        f"ROOT='{blendmvs_root}', resolution={RES!r}, seed=777)"
    )
    assert len(ds) == 2
    views = ds[(0, 0)]
    assert len(views) == 4  # never short despite retry paths
    v = views[0]
    assert v["img"].shape == (48, 64, 3)
    assert v["valid_mask"].any()
    assert v["dataset"] == "blendmvs"
    np.testing.assert_allclose(  # pose is inv(w2c) = cam2world
        views[0]["camera_pose"][:3, :3], np.eye(3), atol=1e-5)


@pytest.fixture
def blendedmvs_multiview_root(tmp_path):
    """dust3r-processed flat layout: ROOT/<24-hex>/<idx>.{jpg,exr,npz} +
    structured blendedmvs_pairs.npy."""
    rng = np.random.default_rng(4)
    root = tmp_path / "blendedmvs_proc"
    os.makedirs(root, exist_ok=True)
    # two scenes: seq_low 1 (train) and 10 (val, %10==0)
    scenes = [(0x5A, 1), (0x5B, 10)]
    rows = []
    for seqh, seql in scenes:
        scene_id = f"{seqh:08x}{seql:016x}"
        sdir = root / scene_id
        for i in range(6):
            name = f"{i:08d}"
            _write_jpg(str(sdir / f"{name}.jpg"), rng)
            write_exr(str(sdir / f"{name}.exr"),
                      np.full((H_SRC, W_SRC), 2.0, np.float32))
            np.savez(sdir / f"{name}.npz", intrinsics=_intrinsics(),
                     R_cam2world=np.eye(3, dtype=np.float32),
                     t_cam2world=np.float32([0.1 * i, 0, 0]))
        for a, b in [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5)]:
            rows.append((seqh, seql, a, b, 0.5))
    pairs = np.array(rows, dtype=[("seq_high", "u4"), ("seq_low", "u8"),
                                  ("img1", "u2"), ("img2", "u2"),
                                  ("score", "f4")])
    np.save(root / "blendedmvs_pairs.npy", pairs)
    return str(root)


def test_blendedmvs_multiview_pairs_parsing(blendedmvs_multiview_root,
                                            monkeypatch):
    import fast3r_tpu.data.datasets.multiview as mv

    root = blendedmvs_multiview_root
    ds = build_dataset(
        f"BlendedMVS_Multiview(split='train', num_views=3, window_size=8, "
        f"num_samples_per_window=4, ROOT='{root}', resolution={RES!r}, "
        f"seed=777)"
    )
    # the %10==0 scene must be filtered out of the train split
    assert list(ds.scene_to_indices) == [f"{0x5A:08x}{1:016x}"]
    assert ds.scene_to_indices[f"{0x5A:08x}{1:016x}"] == [0, 1, 2, 3, 4, 5]
    assert len(ds) > 0

    ds_val = build_dataset(
        f"BlendedMVS_Multiview(split='val', num_views=3, window_size=8, "
        f"num_samples_per_window=4, ROOT='{root}', resolution={RES!r}, "
        f"seed=777)"
    )
    assert list(ds_val.scene_to_indices) == [f"{0x5B:08x}{10:016x}"]

    # depth comes from REAL .exr bytes (fixture writes them via the bundled
    # codec; imread_cv2 decodes them through its EXR fallback)
    views = ds[(0, 0)]
    assert len(views) == 3
    assert views[0]["img"].shape == (48, 64, 3)
    assert views[0]["dataset"] == "BlendedMVS"
    assert views[0]["valid_mask"].all()


@pytest.fixture
def wildrgbd_root(tmp_path):
    """WildRGBD layout: rgb/depth/masks/metadata with 5-digit names."""
    rng = np.random.default_rng(5)
    root = tmp_path / "wildrgbd"
    os.makedirs(root, exist_ok=True)
    frames = list(range(100))
    with open(root / "selected_seqs_train.json", "w") as f:
        json.dump({"cup": {"s1": frames}}, f)
    base = root / "cup" / "s1"
    for i in frames[:40]:
        _write_jpg(str(base / "rgb" / f"{i:05d}.jpg"), rng)
        for sub in ("depth", "masks", "metadata"):
            os.makedirs(base / sub, exist_ok=True)
        cv2.imwrite(str(base / "depth" / f"{i:05d}.png"),
                    rng.integers(500, 5000, (H_SRC, W_SRC)).astype(np.uint16))
        cv2.imwrite(str(base / "masks" / f"{i:05d}.png"),
                    np.full((H_SRC, W_SRC), 255, np.uint8))
        np.savez(base / "metadata" / f"{i:05d}.npz",
                 camera_pose=_pose(i), camera_intrinsics=_intrinsics())
    return str(root)


def test_wildrgbd_pairwise_loader(wildrgbd_root):
    ds = build_dataset(
        f"WildRGBD(split='train', ROOT='{wildrgbd_root}', "
        f"resolution={RES!r}, seed=777)"
    )
    assert len(ds) > 0
    views = ds[(0, 0)]
    assert len(views) == 2
    assert views[0]["dataset"] == "WildRGBD"
    assert views[0]["img"].shape == (48, 64, 3)
    assert views[0]["valid_mask"].any()
    # depth scale: png mm / 1000
    assert 0.1 < views[0]["depthmap"][views[0]["valid_mask"]].mean() < 10.0


@pytest.fixture
def waymo_root(tmp_path, monkeypatch):
    rng = np.random.default_rng(6)
    root = tmp_path / "waymo"
    scene = "segment-001"
    os.makedirs(root / scene, exist_ok=True)
    frames = [f"cam1_{i:03d}" for i in range(4)]
    for i, name in enumerate(frames):
        _write_jpg(str(root / scene / f"{name}.jpg"), rng)
        write_exr(str(root / scene / f"{name}.exr"),
                  np.full((H_SRC, W_SRC), 3.0, np.float32))
        np.savez(root / scene / f"{name}.npz",
                 intrinsics=_intrinsics(), cam2world=_pose(i))
    pairs = np.array([[0, 0, 1], [0, 1, 2], [0, 2, 3]])
    np.savez(root / "waymo_pairs.npz",
             scenes=np.array([scene]), frames=np.array(frames), pairs=pairs)
    return str(root)


def test_waymo_pairwise_loader(waymo_root):
    ds = build_dataset(
        f"Waymo(ROOT='{waymo_root}', resolution={RES!r}, seed=777)"
    )
    assert len(ds) == 3
    views = ds[(1, 0)]
    assert len(views) == 2
    assert views[0]["dataset"] == "Waymo"
    assert views[0]["valid_mask"].all()


@pytest.fixture
def staticthings_root(tmp_path):
    rng = np.random.default_rng(7)
    root = tmp_path / "st3d"
    os.makedirs(root, exist_ok=True)
    pairs = np.array([(b"A/X", 1, b"l", 0, b"r", 1)],
                     dtype=[("scene", "S8"), ("seq", "i4"), ("cam1", "S1"),
                            ("im1", "i4"), ("cam2", "S1"), ("im2", "i4")])
    # the reference stores a plain structured recarray; row unpacking works
    np.save(root / "staticthings_pairs.npy", pairs)
    for cam in ("left", "right"):
        base = root / "TRAIN" / "A/X" / "0001" / cam
        for i in range(2):
            _write_jpg(str(base / f"{i:04d}_clean.jpg"), rng)
            _write_jpg(str(base / f"{i:04d}_final.jpg"), rng)
            write_exr(str(base / f"{i:04d}.exr"),
                      np.full((H_SRC, W_SRC), 2.0, np.float32))
            np.savez(base / f"{i:04d}.npz",
                     intrinsics=_intrinsics(), cam2world=_pose(i))
    return str(root)


def test_staticthings3d_pairwise_loader(staticthings_root):
    ds = build_dataset(
        f"StaticThings3D(ROOT='{staticthings_root}', resolution={RES!r}, "
        f"seed=777)"
    )
    assert len(ds) == 1
    views = ds[(0, 0)]
    assert len(views) == 2
    assert views[0]["dataset"] == "StaticThings3D"
    assert views[0]["instance"].startswith(("left_", "right_"))


@pytest.fixture
def arkitscenes_root(tmp_path):
    """ARKitScenes layout: <split>/all_metadata.npz + per-scene
    vga_wide/*.jpg + lowres_depth/*.png (mm)."""
    rng = np.random.default_rng(8)
    root = tmp_path / "arkit"
    split_dir = root / "Training"
    n = 8
    scenes = np.array(["40753679"])
    sceneids = np.zeros(n, np.int64)
    images = np.array([f"40753679_{i:07d}.png" for i in range(n)])
    intrinsics = np.stack([_intrinsics()] * n)
    trajectories = np.stack([_pose(i) for i in range(n)])
    os.makedirs(split_dir, exist_ok=True)
    np.savez(split_dir / "all_metadata.npz", scenes=scenes, sceneids=sceneids,
             images=images, intrinsics=intrinsics, trajectories=trajectories)
    sdir = split_dir / "40753679"
    for i in range(n):
        _write_jpg(str(sdir / "vga_wide" / f"40753679_{i:07d}.jpg"), rng)
        os.makedirs(sdir / "lowres_depth", exist_ok=True)
        cv2.imwrite(str(sdir / "lowres_depth" / f"40753679_{i:07d}.png"),
                    rng.integers(500, 5000, (H_SRC, W_SRC)).astype(np.uint16))
    return str(root)


def test_arkitscenes_multiview_loader(arkitscenes_root):
    ds = build_dataset(
        f"ARKitScenes_Multiview(split='Training', num_views=3, window_size=8, "
        f"num_samples_per_window=2, ROOT='{arkitscenes_root}', "
        f"resolution={RES!r}, seed=777)"
    )
    assert len(ds) > 0
    views = ds[(0, 0)]
    assert len(views) == 3
    assert views[0]["dataset"] == "arkitscenes"
    assert views[0]["img"].shape == (48, 64, 3)
    assert views[0]["valid_mask"].any()
    assert 0.1 < views[0]["depthmap"][views[0]["valid_mask"]].mean() < 10.0


@pytest.fixture
def megadepth_root(tmp_path):
    """MegaDepth layout: all_metadata_for_multiview.npz + scene/subscene
    dirs with <img>.jpg/.exr/.npz."""
    rng = np.random.default_rng(9)
    root = tmp_path / "megadepth"
    os.makedirs(root, exist_ok=True)
    n = 6
    scenes = np.array(["0001/dense0"])
    sceneids = np.zeros(n, np.int64)
    images = np.array([f"im{i:04d}" for i in range(n)])
    np.savez(root / "all_metadata_for_multiview.npz", scenes=scenes,
             sceneids=sceneids, images=images)
    sdir = root / "0001" / "dense0"
    for i in range(n):
        _write_jpg(str(sdir / f"im{i:04d}.jpg"), rng)
        write_exr(str(sdir / f"im{i:04d}.exr"),
                  np.full((H_SRC, W_SRC), 4.0, np.float32))
        np.savez(sdir / f"im{i:04d}.npz", intrinsics=_intrinsics(),
                 cam2world=_pose(i))
    return str(root)


def test_megadepth_multiview_loader(megadepth_root):
    ds = build_dataset(
        f"MegaDepth_Multiview(split='train', num_views=3, window_size=8, "
        f"num_samples_per_window=2, ROOT='{megadepth_root}', "
        f"resolution={RES!r}, seed=777)"
    )
    assert len(ds) > 0
    views = ds[(0, 0)]
    assert len(views) == 3
    assert views[0]["dataset"] == "MegaDepth"
    assert views[0]["valid_mask"].all()


@pytest.fixture
def habitat_root(tmp_path):
    """Habitat layout: Habitat_<size>_scenes_<split>.txt listing scene keys;
    per-key files <key>_<i>.jpeg + _depth.exr + _camera_params.json."""
    rng = np.random.default_rng(10)
    root = tmp_path / "habitat"
    sdir = root / "sceneA"
    os.makedirs(sdir, exist_ok=True)
    for i in range(1, 6):  # file indices 1..5
        _write_jpg(str(sdir / f"key_{i}.jpeg"), rng)
        write_exr(str(sdir / f"key_{i}_depth.exr"),
                  np.full((H_SRC, W_SRC), 2.5, np.float32))
        with open(sdir / f"key_{i}_camera_params.json", "w") as f:
            json.dump({
                "camera_intrinsics": _intrinsics().tolist(),
                "R_cam2world": np.eye(3).tolist(),
                "t_cam2world": [0.1 * i, 0, 0],
            }, f)
    (root / "Habitat_1000_scenes_train.txt").write_text("sceneA/key\n")
    return str(root)


def test_habitat_multiview_loader(habitat_root):
    ds = build_dataset(
        f"Habitat_Multiview(1000, split='train', num_views=3, "
        f"ROOT='{habitat_root}', resolution={RES!r}, seed=777)"
    )
    assert len(ds) == 1
    views = ds[(0, 0)]
    assert len(views) == 3
    assert views[0]["dataset"] == "Habitat"
    assert views[0]["valid_mask"].all()


def make_co3d_multi_scene_root(root, good_scenes, bad_scenes,
                               bad_mode="truncated_npz"):
    """Multi-scene CO3D fixture with controllable pathology: bad scenes get
    truncated npz metadata (or fully missing files), good scenes are
    complete.  Exercises the clustered-invalid-scene recovery
    (reference co3d_multiview.py:97-130)."""
    rng = np.random.default_rng(2)
    os.makedirs(root, exist_ok=True)
    frames = list(range(1, 31))
    index = {}
    for name in list(bad_scenes) + list(good_scenes):
        index.setdefault("obj", {})[name] = frames
    with open(root / "selected_seqs_train.json", "w") as f:
        json.dump(index, f)
    for name in good_scenes:
        for i in frames:
            imdir = root / "obj" / name
            _write_jpg(str(imdir / "images" / f"frame{i:06d}.jpg"), rng)
            np.savez(imdir / "images" / f"frame{i:06d}.npz",
                     camera_pose=_pose(i), camera_intrinsics=_intrinsics(),
                     maximum_depth=np.float32(10.0))
            ddir = imdir / "depths"
            os.makedirs(ddir, exist_ok=True)
            cv2.imwrite(
                str(ddir / f"frame{i:06d}.jpg.geometric.png"),
                rng.integers(1000, 60000, (H_SRC, W_SRC)).astype(np.uint16))
    for name in bad_scenes:
        if bad_mode == "missing":
            continue  # declared in the index, nothing on disk
        for i in frames:
            imdir = root / "obj" / name
            _write_jpg(str(imdir / "images" / f"frame{i:06d}.jpg"), rng)
            # TRUNCATED npz: np.load must raise, the loader must recover
            os.makedirs(imdir / "images", exist_ok=True)
            with open(imdir / "images" / f"frame{i:06d}.npz", "wb") as f:
                f.write(b"PK\x03\x04 truncated")
    return str(root)


@pytest.mark.parametrize("bad_mode", ["truncated_npz", "missing"])
def test_co3d_clustered_invalid_scenes_recover(tmp_path, bad_mode):
    """VERDICT r4 #8: > max_scene_retries CONSECUTIVE bad scenes (truncated
    npz metadata or wholly missing files) must not raise — the loader falls
    back to resampling the remaining scenes like the reference
    (co3d_multiview.py:107-130) and finds the one good scene."""
    bad = [f"bad{i}" for i in range(7)]   # > the 5-retry linear window
    root = make_co3d_multi_scene_root(tmp_path / "co3d_bad", ["good"], bad,
                                      bad_mode=bad_mode)
    ds = build_dataset(
        f"Co3d_Multiview(split='train', num_views=4, window_degree_range=360,"
        f" num_samples_per_window=2, ROOT='{root}', mask_bg=False, "
        f"resolution={RES!r}, seed=777)"
    )
    views = ds[(0, 0)]
    assert len(views) == 4
    assert all(v["label"].endswith("good") for v in views)
    # the bad scenes are persistently invalidated (no rework next epoch)
    assert len(ds.invalid_scene_tracker) >= 5


def test_co3d_all_scenes_invalid_raises_loudly(tmp_path):
    """When EVERY scene is bad the loader must raise with a diagnostic, not
    hang or loop (our documented divergence from the reference's unbounded
    resampling, eval_many_view.py:33-36 convention)."""
    root = make_co3d_multi_scene_root(tmp_path / "co3d_allbad", [],
                                      [f"bad{i}" for i in range(4)])
    ds = build_dataset(
        f"Co3d_Multiview(split='train', num_views=4, window_degree_range=360,"
        f" num_samples_per_window=2, ROOT='{root}', mask_bg=False, "
        f"resolution={RES!r}, seed=777)"
    )
    with pytest.raises(ValueError, match="scenes invalidated"):
        ds[(0, 0)]
