"""Native C++ ops vs python/torch references."""

import numpy as np
import pytest
import torch

from tests.ref_loader import ref_module

from fast3r_tpu.native import (
    img_normalize_native,
    native_available,
    pointmap_from_depth_native,
    rope2d_native,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="native lib unavailable (no toolchain)"
)


@needs_native
def test_rope2d_native_matches_torch_fallback():
    ref_pe = ref_module("fast3r.croco.models.pos_embed")
    rope = ref_pe.RoPE2D(freq=100.0)
    rng = np.random.default_rng(0)
    B, H, N, D = 2, 4, 24, 64
    tokens = rng.standard_normal((B, H, N, D)).astype(np.float32)
    pos = rng.integers(0, 32, size=(B, N, 2))
    ref = rope(torch.from_numpy(tokens), torch.from_numpy(pos)).numpy()
    out = rope2d_native(tokens, pos, base=100.0)
    np.testing.assert_allclose(out, ref, atol=3e-6)


@needs_native
def test_rope2d_native_self_inverse():
    rng = np.random.default_rng(1)
    tokens = rng.standard_normal((1, 2, 16, 32)).astype(np.float32)
    pos = rng.integers(0, 16, size=(1, 16, 2))
    fwd = rope2d_native(tokens, pos, forward=True)
    back = rope2d_native(fwd, pos, forward=False)
    np.testing.assert_allclose(back, tokens, atol=1e-5)


@needs_native
def test_img_normalize_native():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    out = img_normalize_native(img)
    ref = (img.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(out, ref, atol=1e-7)
    assert out.dtype == np.float32


@needs_native
def test_pointmap_native_matches_numpy():
    from fast3r_tpu.data.base import depthmap_to_absolute_camera_coordinates_np

    rng = np.random.default_rng(3)
    depth = rng.uniform(0, 5, (24, 32)).astype(np.float32)
    depth[depth < 1] = 0
    K = np.array([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [1, 2, 3]
    pts, valid = pointmap_from_depth_native(depth, K, pose)
    ref_pts, ref_valid = depthmap_to_absolute_camera_coordinates_np(
        depth, K, pose)
    np.testing.assert_allclose(pts, ref_pts, atol=1e-4)
    np.testing.assert_array_equal(valid, ref_valid)
