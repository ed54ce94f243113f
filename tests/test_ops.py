"""Golden parity tests for core ops vs the PyTorch reference (fp32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from tests.ref_loader import ref_module

from fast3r_tpu.ops.postprocess import postprocess
from fast3r_tpu.ops.resize import resize_bilinear_align_corners
from fast3r_tpu.ops.rope2d import apply_rope2d_positions
from fast3r_tpu.ops.sincos import sincos_1d_table_np


def test_sincos_table_matches_reference():
    ref_pe = ref_module("fast3r.croco.models.pos_embed")
    ref = ref_pe.get_1d_sincos_pos_embed_from_grid(256, np.arange(1000))
    mine = sincos_1d_table_np(256, 1000)
    np.testing.assert_allclose(mine, ref.astype(np.float32), atol=1e-7)


def test_rope2d_matches_torch_fallback():
    ref_pe = ref_module("fast3r.croco.models.pos_embed")
    rope = ref_pe.RoPE2D(freq=100.0)
    assert rope.__class__.__name__ == "RoPE2D" and hasattr(rope, "get_cos_sin"), \
        "expected the pure-torch fallback (curope must not be installed)"

    rng = np.random.default_rng(0)
    B, H, N, D = 2, 4, 24, 64
    tokens = rng.standard_normal((B, H, N, D)).astype(np.float32)
    pos = rng.integers(0, 32, size=(B, N, 2))

    ref_out = rope(torch.from_numpy(tokens), torch.from_numpy(pos)).numpy()
    jax_out = np.asarray(
        apply_rope2d_positions(jnp.asarray(tokens), jnp.asarray(pos), base=100.0)
    )
    np.testing.assert_allclose(jax_out, ref_out, atol=2e-6)


def test_postprocess_matches_reference():
    ref_pp = ref_module("fast3r.dust3r.heads.postprocess")
    rng = np.random.default_rng(1)
    out = rng.standard_normal((2, 8, 12, 4)).astype(np.float32) * 3

    depth_mode = ("exp", -float("inf"), float("inf"))
    conf_mode = ("exp", 1, float("inf"))
    # reference expects B,C,H,W
    ref = ref_pp.postprocess(
        torch.from_numpy(out.transpose(0, 3, 1, 2)), depth_mode, conf_mode
    )
    mine = postprocess(jnp.asarray(out), depth_mode, conf_mode)
    np.testing.assert_allclose(
        np.asarray(mine["pts3d"]), ref["pts3d"].numpy(), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mine["conf"]), ref["conf"].numpy(), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("shape,out_hw", [
    ((2, 8, 12, 5), (16, 24)),   # 2x upsample
    ((1, 7, 9, 3), (14, 18)),    # odd sizes, 2x
    ((2, 16, 24, 4), (32, 48)),
    ((1, 5, 5, 2), (10, 13)),    # non-integer ratio
])
def test_bilinear_align_corners_matches_torch(shape, out_hw):
    rng = np.random.default_rng(2)
    x = rng.standard_normal(shape).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=out_hw,
        mode="bilinear", align_corners=True,
    ).numpy().transpose(0, 2, 3, 1)
    mine = np.asarray(
        resize_bilinear_align_corners(jnp.asarray(x), out_hw[0], out_hw[1])
    )
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_conv_transpose_matches_torch():
    from fast3r_tpu.nn.layers import conv_transpose2d, init_conv

    for k in (2, 4):
        p = init_conv(jax.random.key(0), k, k, 6, 10)
        x = np.random.default_rng(3).standard_normal((2, 5, 7, 6)).astype(np.float32)
        tmod = torch.nn.ConvTranspose2d(6, 10, kernel_size=k, stride=k)
        tmod.weight.data = torch.from_numpy(
            np.asarray(p["w"]).transpose(2, 3, 0, 1).copy()
        )
        tmod.bias.data = torch.from_numpy(np.asarray(p["b"]).copy())
        ref = tmod(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
        mine = np.asarray(conv_transpose2d(p, jnp.asarray(x), stride=k))
        np.testing.assert_allclose(mine.transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_vit_block_matches_reference():
    from fast3r_tpu.nn.layers import init_vit_block, vit_block
    from tests.ref_loader import build_ref_vit_block, load_block

    dim, heads = 64, 4
    jp = init_vit_block(jax.random.key(1), dim, heads)
    tblock = build_ref_vit_block(torch, dim, heads, ln_eps=1e-6)
    load_block(tblock, jp)
    tblock.eval()

    x = np.random.default_rng(4).standard_normal((2, 10, dim)).astype(np.float32)
    with torch.no_grad():
        ref = tblock(torch.from_numpy(x), None).numpy()
    mine = np.asarray(
        vit_block(jp, jnp.asarray(x), heads, scale=(dim // heads) ** -0.5,
                  attn_impl="naive", ln_eps=1e-6)
    )
    np.testing.assert_allclose(mine, ref, atol=2e-5)


def test_vit_block_with_rope_matches_reference():
    from fast3r_tpu.nn.layers import init_vit_block, vit_block
    from fast3r_tpu.ops.rope2d import rope2d_cos_sin
    from tests.ref_loader import build_ref_vit_block, load_block

    ref_pe = ref_module("fast3r.croco.models.pos_embed")
    dim, heads = 64, 4
    jp = init_vit_block(jax.random.key(2), dim, heads)
    tblock = build_ref_vit_block(torch, dim, heads, rope=ref_pe.RoPE2D(freq=100.0))
    load_block(tblock, jp)
    tblock.eval()

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 12, dim)).astype(np.float32)
    pos = rng.integers(0, 8, size=(2, 12, 2))
    with torch.no_grad():
        ref = tblock(torch.from_numpy(x), torch.from_numpy(pos)).numpy()
    cos_sin = rope2d_cos_sin(jnp.asarray(pos), dim // heads, 100.0)
    mine = np.asarray(
        vit_block(jp, jnp.asarray(x), heads, scale=(dim // heads) ** -0.5,
                  rope_cos_sin=cos_sin, attn_impl="naive", ln_eps=1e-6)
    )
    np.testing.assert_allclose(mine, ref, atol=2e-5)


def test_attention_entropy_scale_matches_reference():
    """Inference attn bias scale (blocks.py:118-124)."""
    import math

    from fast3r_tpu.models.decoder import DecoderConfig

    cfg = DecoderConfig(embed_dim=64, num_heads=4)
    hd = 16
    expected = hd ** -0.5 * (math.log(137) / math.log(20)) ** 0.5
    assert abs(cfg.attn_scale(is_training=False) - expected) < 1e-12
    assert abs(cfg.attn_scale(is_training=True) - hd ** -0.5) < 1e-12


@pytest.mark.parametrize("shape,out_hw", [
    ((2, 8, 12, 5), (16, 24)),
    ((1, 16, 24, 3), (7, 9)),    # downsample
    ((1, 5, 5, 2), (10, 13)),
    ((1, 1, 4, 2), (3, 8)),      # degenerate in_size=1 axis
    ((1, 4, 4, 2), (1, 4)),      # degenerate out_size=1 axis
])
def test_bilinear_gather_matches_matmul_form(shape, out_hw):
    """The gather+lerp formulation (kept for measurement) and the dense-matrix
    default share their tap/weight math (ops/resize.py) — fp32 results agree
    to rounding."""
    from fast3r_tpu.ops.resize import _resize_gather

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    a = np.asarray(resize_bilinear_align_corners(x, *out_hw))
    b = np.asarray(_resize_gather(x, *out_hw))
    np.testing.assert_allclose(a, b, atol=1e-6)
