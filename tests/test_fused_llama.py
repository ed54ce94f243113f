"""Fused llama block (nn/fused_block.fused_llama_block) vs the plain
composition, in interpreter mode on CPU (as tests/test_fused_block.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fast3r_tpu.models.llama_decoder import (
    LlamaDecoderConfig,
    freqs_cos_sin_table,
    init_llama_block,
    llama_block,
)
from fast3r_tpu.nn import fused_block as fb

B, S = 2, 128


def _setup(n_kv_heads=None):
    cfg = LlamaDecoderConfig(embed_dim=256, n_layers=1, n_heads=4,
                             n_kv_heads=n_kv_heads, multiple_of=128,
                             attn_impl="naive")
    p = init_llama_block(jax.random.key(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, S, 256)), jnp.float32)
    cos_t, sin_t = freqs_cos_sin_table(cfg.head_dim, 64, cfg.rope_theta)
    ids = jnp.asarray(
        np.random.default_rng(2).integers(0, 64, (B, S)), jnp.int32)
    cos = jnp.asarray(cos_t)[ids]
    sin = jnp.asarray(sin_t)[ids]
    return cfg, p, x, cos, sin


@pytest.mark.parametrize("n_kv_heads", [None, 2])
def test_fused_llama_matches_plain(n_kv_heads):
    cfg, p, x, cos, sin = _setup(n_kv_heads)
    assert fb.fused_llama_supported(x.shape[:2], cfg)
    ref = llama_block(p, x, cos, sin, cfg)
    out = fb.fused_llama_block(p, x, cos, sin, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_llama_grads_match_plain():
    cfg, p, x, cos, sin = _setup()

    def loss_plain(p_, x_):
        return jnp.sum(jnp.sin(llama_block(p_, x_, cos, sin, cfg)))

    def loss_fused(p_, x_):
        return jnp.sum(jnp.sin(fb.fused_llama_block(p_, x_, cos, sin, cfg)))

    gp_ref, gx_ref = jax.grad(loss_plain, argnums=(0, 1))(p, x)
    gp, gx = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=5e-4, atol=5e-5)
    for (kr, vr), (kg, vg) in zip(
            jax.tree.leaves_with_path(gp_ref), jax.tree.leaves_with_path(gp)):
        np.testing.assert_allclose(np.asarray(vg), np.asarray(vr),
                                   rtol=5e-4, atol=5e-5, err_msg=str(kr))
