"""Pure-python EXR codec (VERDICT r1 item 9): real-bytes round trips for
every supported compression/pixel-type combination, plus the imread_cv2
fallback path the MegaDepth/Habitat loaders hit in this environment."""

import struct

import numpy as np
import pytest

from fast3r_tpu.data.exr import (
    MAGIC,
    _predict_interleave,
    _unpredict_deinterleave,
    read_exr,
    write_exr,
)


def test_zip_pretransform_inverts():
    rng = np.random.default_rng(0)
    for n in (1, 2, 7, 256, 1001):
        raw = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert _unpredict_deinterleave(_predict_interleave(raw)) == raw


@pytest.mark.parametrize("compression", ["none", "zips", "zip"])
@pytest.mark.parametrize("dtype", [np.float32, np.float16])
def test_roundtrip(tmp_path, compression, dtype):
    rng = np.random.default_rng(1)
    # 37 rows: exercises a partial final 16-line ZIP chunk
    depth = rng.uniform(0.5, 80.0, (37, 53)).astype(dtype)
    p = str(tmp_path / f"d_{compression}_{np.dtype(dtype).name}.exr")
    write_exr(p, depth, compression=compression)
    out = read_exr(p)
    assert out.dtype == dtype
    np.testing.assert_array_equal(out, depth)


def test_file_is_valid_exr_container(tmp_path):
    p = str(tmp_path / "d.exr")
    write_exr(p, np.ones((4, 6), np.float32))
    blob = open(p, "rb").read()
    magic, version = struct.unpack_from("<ii", blob, 0)
    assert magic == MAGIC and version == 2


def test_incompressible_chunk_stored_raw(tmp_path):
    # pure noise bytes: zlib expands them, the writer stores the chunk raw
    # and the reader must detect that by size
    rng = np.random.default_rng(2)
    noise = rng.integers(0, 2**32 - 1, (5, 11), dtype=np.uint32)
    p = str(tmp_path / "noise.exr")
    write_exr(p, noise, compression="zips")
    np.testing.assert_array_equal(read_exr(p), noise)


def test_imread_cv2_exr_fallback(tmp_path):
    """The loader-facing entry point: this cv2 build has no OpenEXR codec
    (getBuildInformation -> OpenEXR: NO), so imread_cv2 must transparently
    decode real EXR bytes through the bundled codec."""
    from fast3r_tpu.data.io import imread_cv2

    depth = np.linspace(1.0, 9.0, 48).reshape(6, 8).astype(np.float32)
    p = str(tmp_path / "depth.exr")
    write_exr(p, depth, compression="zip")
    out = imread_cv2(p)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, depth)
    # half-precision files are promoted to float32 like cv2 would
    write_exr(p, depth.astype(np.float16), compression="zips")
    out16 = imread_cv2(p)
    assert out16.dtype == np.float32
    np.testing.assert_allclose(out16, depth, rtol=1e-3)


def test_read_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.exr")
    open(p, "wb").write(b"not an exr at all")
    with pytest.raises(IOError):
        read_exr(p)
