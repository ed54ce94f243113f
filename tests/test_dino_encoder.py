"""DINOv2-style encoder architecture tests."""

import numpy as np

import jax
import jax.numpy as jnp

from fast3r_tpu.models.dino_encoder import (
    DinoEncoderConfig,
    dino_encoder_forward,
    init_dino_encoder,
)


def _cfg():
    return DinoEncoderConfig(embed_dim=64, depth=2, num_heads=2,
                             pos_embed_size=6, attn_impl="naive")


def test_dino_forward_shapes_and_portrait():
    cfg = _cfg()
    params = init_dino_encoder(jax.random.key(0), cfg)
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 42, 56, 3)), jnp.float32)
    ts = jnp.asarray(np.array([[42, 56], [56, 42]], np.int32))
    tok, pos = dino_encoder_forward(params, cfg, img, ts)
    assert tok.shape == (2, 12, 64)
    assert pos.shape == (2, 12, 2)
    assert np.isfinite(np.asarray(tok)).all()
    # landscape grid 3x4 -> pos max (2, 3); portrait grid 4x3 -> pos max (3, 2)
    np.testing.assert_array_equal(np.asarray(pos[0]).max(0), [2, 3])
    np.testing.assert_array_equal(np.asarray(pos[1]).max(0), [3, 2])


def test_dino_pos_embed_interpolation():
    """Grid different from the pretrained 6x6 triggers bicubic interpolation."""
    cfg = _cfg()
    params = init_dino_encoder(jax.random.key(1), cfg)
    img = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 84, 84, 3)), jnp.float32)
    tok, pos = dino_encoder_forward(params, cfg, img)
    assert tok.shape == (1, 36, 64)  # 6x6 grid == table size (no interp)
    img2 = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 42, 42, 3)), jnp.float32)
    tok2, _ = dino_encoder_forward(params, cfg, img2)
    assert tok2.shape == (1, 9, 64)  # 3x3 grid -> interpolated
    assert np.isfinite(np.asarray(tok2)).all()
