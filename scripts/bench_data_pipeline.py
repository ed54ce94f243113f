"""Host data-pipeline throughput: decode -> crop/resize -> pts3d -> collate.

SURVEY §7 lists data-loading throughput as a hard part: the accelerator
sustains ~46.8 img/s (bench.py headline) and a 20-view train step consumes
20 views / 2.43 s ~ 8.2 img/s/chip — the host pipeline must beat the
inference rate with headroom or it becomes the binding constraint on a pod
(reference runs 6 workers/rank, configs/data/multiview_dust3r.yaml).

This measures the REAL per-view path of BaseViewDataset.__getitem__
(data/base.py): JPEG decode (on-disk fixture written at setup), principal
-point center crop + Lanczos rescale (_crop_resize_if_necessary), ImgNorm,
native back-projection to pts3d (pointmap_from_depth_native -> the OpenMP
C++ kernel when built), landscape transpose, and collate_views — through
the production DataLoader (spawned process pool, prefetching) at the
flagship batch shape (1 scene x 20 views @ 512x384 from 640x480 captures).

    python scripts/bench_data_pipeline.py [--scenes 36] [--views 20]
        [--workers 0,6,12] [--json]

Prints one line per worker count: images/sec plus the ratio to the 46.8
img/s accelerator rate.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np
import PIL.Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fast3r_tpu.data.base import BaseViewDataset  # noqa: E402

SRC_W, SRC_H = 640, 480
RES_W, RES_H = 512, 384
ACCEL_IMG_S = 46.8  # bench.py headline, r4


def write_fixture(root: str, scenes: int, views: int) -> None:
    """On-disk capture tree: scene_%d/view_%d.jpg + depth_%d.npy.  Distinct
    random content per view so JPEG decode cost is honest (uniform noise is
    roughly the worst case for DCT coding)."""
    rng = np.random.default_rng(0)
    for s in range(scenes):
        d = os.path.join(root, f"scene_{s:04d}")
        os.makedirs(d, exist_ok=True)
        for v in range(views):
            img = rng.integers(0, 255, size=(SRC_H, SRC_W, 3), dtype=np.uint8)
            PIL.Image.fromarray(img).save(
                os.path.join(d, f"view_{v:02d}.jpg"), quality=90)
            depth = rng.uniform(1.0, 4.0, size=(SRC_H, SRC_W)).astype(
                np.float32)
            np.save(os.path.join(d, f"depth_{v:02d}.npy"), depth)


class JpegSceneDataset(BaseViewDataset):
    """Fixture-backed multiview dataset exercising the full production
    ingest path (JPEG file decode included) of data/base.py."""

    def __init__(self, root: str, num_scenes: int, **kwargs):
        super().__init__(**kwargs)
        self.root = root
        self.scenes = [f"scene_{i:04d}" for i in range(num_scenes)]

    def _get_views(self, idx, resolution, rng):
        d = os.path.join(self.root, self.scenes[idx])
        f = 0.9 * SRC_W
        intr = np.array([[f, 0, SRC_W / 2], [0, f, SRC_H / 2], [0, 0, 1]],
                        np.float32)
        views = []
        for v in range(self.num_views):
            img = PIL.Image.open(os.path.join(d, f"view_{v:02d}.jpg"))
            depth = np.load(os.path.join(d, f"depth_{v:02d}.npy"))
            pose = np.eye(4, dtype=np.float32)
            pose[:3, 3] = (0.1 * v, 0.0, 0.0)
            img, depth, k = self._crop_resize_if_necessary(
                img, depth, intr.copy(), resolution, rng=rng,
                info=f"{self.scenes[idx]}/{v}")
            views.append(dict(
                img=img, depthmap=depth, camera_intrinsics=k,
                camera_pose=pose, dataset="bench", label=self.scenes[idx],
                instance=str(v)))
        return views


def run_epoch(loader, epoch: int) -> int:
    loader.set_epoch(epoch)
    n = 0
    for batch in loader:
        n += int(np.prod(batch["imgs"].shape[:2]))
    return n


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=36)
    ap.add_argument("--views", type=int, default=20)
    ap.add_argument("--workers", default="0,6,12")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    from fast3r_tpu.data.loader import DataLoader
    from fast3r_tpu.native import native_available

    ncores = len(os.sched_getaffinity(0)) if hasattr(os, "sched_getaffinity") \
        else os.cpu_count()
    results = {"host_cores": ncores}
    with tempfile.TemporaryDirectory(prefix="f3r_databench_") as root:
        t0 = time.perf_counter()
        write_fixture(root, args.scenes, args.views)
        print(f"fixture: {args.scenes} scenes x {args.views} views "
              f"({time.perf_counter() - t0:.1f} s to write), native kernel "
              f"{'BUILT' if native_available() else 'FALLBACK (numpy)'}, "
              f"host cores: {ncores}", flush=True)
        if ncores == 1:
            print("NOTE: single-core host — worker counts cannot scale here; "
                  "the img/s/core rate is the transferable number "
                  "(production hosts: rate x min(workers, cores))",
                  flush=True)

        for nw in (int(w) for w in args.workers.split(",")):
            # workers=0 is the inline debug path; scale its scene count down
            scenes = args.scenes if nw else max(4, args.scenes // 4)
            ds = JpegSceneDataset(
                root, scenes, num_views=args.views,
                resolution=(RES_W, RES_H), seed=777)
            loader = DataLoader(ds, batch_size=1, num_workers=nw, prefetch=4)
            try:
                run_epoch(loader, 0)  # warm: spawn pool, import costs
                t0 = time.perf_counter()
                n = run_epoch(loader, 1)
                dt = time.perf_counter() - t0
            finally:
                loader.close()
            rate = n / dt
            results[f"workers_{nw}"] = round(rate, 1)
            per_core = rate / min(max(nw, 1), ncores)
            print(f"workers={nw:2d}: {n} imgs in {dt:6.2f} s = "
                  f"{rate:7.1f} img/s ({per_core:.1f}/core; "
                  f"{rate / ACCEL_IMG_S:4.2f}x the {ACCEL_IMG_S} img/s "
                  f"accelerator rate)", flush=True)

    if args.json:
        print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
