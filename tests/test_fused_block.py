"""Fused ViT-block kernels (nn/fused_block.py) vs the plain composition.

Runs the Pallas kernels in interpreter mode on CPU (as test_flash_attention
does) and checks forward numerics and the block-level custom-VJP gradients
against nn/layers.vit_block.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fast3r_tpu.nn.layers import init_vit_block, vit_block
from fast3r_tpu.nn import fused_block as fb
from fast3r_tpu.ops.rope2d import rope2d_cos_sin

B, N, C, HEADS = 2, 128, 256, 4


@pytest.fixture(scope="module")
def block_setup():
    key = jax.random.key(0)
    p = init_vit_block(key, C, HEADS, mlp_ratio=4.0)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, N, C)), jnp.float32)
    return p, x


def test_ln_matmul_kernel(block_setup):
    p, x = block_setup
    x2 = x.reshape(-1, C)
    g, b = p["norm2"]["scale"], p["norm2"]["bias"]
    w, bias = p["mlp"]["fc1"]["w"], p["mlp"]["fc1"]["b"]

    out = fb.ln_matmul(x2, g, b, w, bias, 1e-6, act="gelu")
    assert out is not None

    xf = x2
    mean = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-6) * g + b
    ref = jax.nn.gelu(y @ w + bias, approximate=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ln_mlp_fused_sublayer(block_setup):
    """r4 whole-MLP kernel: x + GELU(LN(x)W1+b1)W2+b2 in one program must
    match the plain composition, and its grads (which replay through the
    two-kernel road) must match plain jax.grad."""
    p, x = block_setup
    x2 = x.reshape(-1, C)
    g, b = p["norm2"]["scale"], p["norm2"]["bias"]
    w1, b1 = p["mlp"]["fc1"]["w"], p["mlp"]["fc1"]["b"]
    w2, b2 = p["mlp"]["fc2"]["w"], p["mlp"]["fc2"]["b"]

    out = fb.ln_mlp(x2, g, b, w1, b1, w2, b2, 1e-6)
    assert out is not None

    def ref_fn(x2, g, b, w1, b1, w2, b2):
        mean = jnp.mean(x2, -1, keepdims=True)
        var = jnp.var(x2, -1, keepdims=True)
        y = (x2 - mean) * jax.lax.rsqrt(var + 1e-6) * g + b
        h = jax.nn.gelu(y @ w1 + b1, approximate=False)
        return x2 + h @ w2 + b2

    ref = ref_fn(x2, g, b, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    grads = jax.grad(lambda *a: fb.ln_mlp(*a, 1e-6).sum(),
                     argnums=(0, 3, 5))(x2, g, b, w1, b1, w2, b2)
    ref_grads = jax.grad(lambda *a: ref_fn(*a).sum(),
                         argnums=(0, 3, 5))(x2, g, b, w1, b1, w2, b2)
    for got, want in zip(grads, ref_grads):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-4, atol=5e-4)


def test_ln_qkv_split(block_setup):
    p, x = block_setup
    x2 = x.reshape(-1, C)
    g, b = p["norm1"]["scale"], p["norm1"]["bias"]
    w, bias = p["attn"]["qkv"]["w"], p["attn"]["qkv"]["b"]
    out = fb.ln_qkv(x2, g, b, w, bias, 1e-6)
    assert out is not None
    q, k, v = out

    mean = jnp.mean(x2, -1, keepdims=True)
    var = jnp.var(x2, -1, keepdims=True)
    y = (x2 - mean) * jax.lax.rsqrt(var + 1e-6) * g + b
    ref = y @ w + bias
    for got, want in zip((q, k, v), jnp.split(ref, 3, axis=-1)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_matmul_residual(block_setup):
    p, x = block_setup
    x2 = x.reshape(-1, C)
    w, bias = p["attn"]["proj"]["w"], p["attn"]["proj"]["b"]
    r = x2 * 0.5
    out = fb.matmul_residual(x2, w, bias, r)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(r + x2 @ w + bias),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("with_rope", [False, True])
def test_fused_block_matches_plain(block_setup, with_rope):
    p, x = block_setup
    hd = C // HEADS
    rope = None
    if with_rope:
        pos = np.stack(np.meshgrid(np.arange(8), np.arange(16),
                                   indexing="ij"), -1).reshape(-1, 2)
        pos = jnp.asarray(np.broadcast_to(pos[None], (B, N, 2)), jnp.int32)
        rope = rope2d_cos_sin(pos, hd, 100.0)

    ref = vit_block(p, x, HEADS, hd ** -0.5, rope_cos_sin=rope,
                    attn_impl="naive")
    out = fb.fused_vit_block(p, x, rope, HEADS, hd ** -0.5, "naive", 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ln_matmul_grads_match_autodiff(block_setup):
    """The fused backward kernel (_ln_matmul_bwd: LN-stat recompute, in-kernel
    gelu', contraction-transposed du, scratch-accumulated dgamma/dbeta)
    matches autodiff of the plain composition for every input cotangent."""
    p, x = block_setup
    x2 = x.reshape(-1, C)
    g0, b0 = p["norm2"]["scale"], p["norm2"]["bias"]
    w, bias = p["mlp"]["fc1"]["w"], p["mlp"]["fc1"]["b"]

    def plain(x_, g_, b_, w_, bias_):
        mean = jnp.mean(x_, -1, keepdims=True)
        var = jnp.var(x_, -1, keepdims=True)
        y = (x_ - mean) * jax.lax.rsqrt(var + 1e-6) * g_ + b_
        return jnp.sum(jnp.sin(jax.nn.gelu(y @ w_ + bias_,
                                           approximate=False)))

    def fused(x_, g_, b_, w_, bias_):
        return jnp.sum(jnp.sin(fb.ln_matmul(x_, g_, b_, w_, bias_, 1e-6,
                                            act="gelu")))

    ref = jax.grad(plain, argnums=(0, 1, 2, 3, 4))(x2, g0, b0, w, bias)
    got = jax.grad(fused, argnums=(0, 1, 2, 3, 4))(x2, g0, b0, w, bias)
    for a, b, name in zip(got, ref, ("dx", "dgamma", "dbeta", "dw", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=name)


def test_ln_qkv_grads_match_autodiff(block_setup):
    p, x = block_setup
    x2 = x.reshape(-1, C)
    g0, b0 = p["norm1"]["scale"], p["norm1"]["bias"]
    w, bias = p["attn"]["qkv"]["w"], p["attn"]["qkv"]["b"]

    def plain(x_, w_):
        mean = jnp.mean(x_, -1, keepdims=True)
        var = jnp.var(x_, -1, keepdims=True)
        y = (x_ - mean) * jax.lax.rsqrt(var + 1e-6) * g0 + b0
        z = y @ w_ + bias
        q, k, v = z[:, :C], z[:, C:2 * C], z[:, 2 * C:]
        return jnp.sum(jnp.sin(q) + 2 * jnp.cos(k) + 3 * jnp.sin(v))

    def fused(x_, w_):
        q, k, v = fb.ln_qkv(x_, g0, b0, w_, bias, 1e-6)
        return jnp.sum(jnp.sin(q) + 2 * jnp.cos(k) + 3 * jnp.sin(v))

    ref = jax.grad(plain, argnums=(0, 1))(x2, w)
    got = jax.grad(fused, argnums=(0, 1))(x2, w)
    for a, b, name in zip(got, ref, ("dx", "dw")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=name)


def test_fused_block_bf16_grads_close(block_setup):
    """bf16 block grads from the fused backward stay within bf16 noise of the
    plain path (the production training dtype)."""
    p, x = block_setup
    hd = C // HEADS
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p)
    xb = x.astype(jnp.bfloat16)

    def loss_plain(x_):
        return jnp.sum(vit_block(pb, x_, HEADS, hd ** -0.5,
                                 attn_impl="naive").astype(jnp.float32))

    def loss_fused(x_):
        return jnp.sum(fb.fused_vit_block(
            pb, x_, None, HEADS, hd ** -0.5, "naive",
            1e-6).astype(jnp.float32))

    gx_ref = jax.grad(loss_plain)(xb).astype(jnp.float32)
    gx = jax.grad(loss_fused)(xb).astype(jnp.float32)
    denom = float(jnp.mean(jnp.abs(gx_ref))) + 1e-8
    rel = float(jnp.mean(jnp.abs(gx - gx_ref))) / denom
    assert rel < 0.05, rel


def test_fused_block_grads_match_plain(block_setup):
    p, x = block_setup
    hd = C // HEADS

    def loss_plain(p_, x_):
        return jnp.sum(jnp.sin(vit_block(p_, x_, HEADS, hd ** -0.5,
                                         attn_impl="naive")))

    def loss_fused(p_, x_):
        return jnp.sum(jnp.sin(fb.fused_vit_block(
            p_, x_, None, HEADS, hd ** -0.5, "naive", 1e-6)))

    gp_ref, gx_ref = jax.grad(loss_plain, argnums=(0, 1))(p, x)
    gp, gx = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=5e-4, atol=5e-5)
    for path_ref, path_got in zip(
            jax.tree.leaves_with_path(gp_ref), jax.tree.leaves_with_path(gp)):
        np.testing.assert_allclose(
            np.asarray(path_got[1]), np.asarray(path_ref[1]),
            rtol=5e-4, atol=5e-5, err_msg=str(path_ref[0]))


def test_supported_gate_respects_dtype():
    """fp32 doubles the resident-weight footprint (weights are cast to
    x.dtype): the flagship shapes tile at bf16 but NOT at fp32 — the gate
    must agree with the kernels' own _pick_bm or TPU tracing asserts
    (regression: fp32 serving crashed instead of falling back)."""
    from fast3r_tpu.models.llama_decoder import LlamaDecoderConfig

    assert fb.fused_block_supported((20, 768), 1024, 4096, itemsize=2)
    # r4: the VMEM budget raise (12 -> 64 MiB, measured bm sweep) means the
    # flagship shapes now tile at fp32 too — the gate must agree with
    # _pick_bm in BOTH directions, so assert the positive...
    assert fb.fused_block_supported((20, 768), 1024, 4096, itemsize=4)
    # ...and keep a genuinely untileable fp32 case (fc1 weight alone is
    # 4096*16384*4 = 256 MiB, past any VMEM budget)
    assert not fb.fused_block_supported((20, 768), 4096, 16384, itemsize=4)
    cfg = LlamaDecoderConfig()
    assert fb.fused_llama_supported((1, 15360), cfg, itemsize=2)


def test_ln_qkv_rope_matches_plain(block_setup):
    """The fused qkv+rope kernel (packed (3, M, C) output, rope in-kernel)
    matches ln -> qkv matmul -> apply_rope2d_bnhd."""
    from fast3r_tpu.nn.layers import layernorm
    from fast3r_tpu.ops.rope2d import (
        apply_rope2d_bnhd, expand_rope_tables)

    p, x = block_setup
    hd = C // HEADS
    pos = jnp.stack(jnp.meshgrid(jnp.arange(8), jnp.arange(16),
                                 indexing="ij"), -1).reshape(-1, 2)
    pos = jnp.broadcast_to(pos[None].astype(jnp.int32), (B, N, 2))
    cos, sin = rope2d_cos_sin(pos, hd, 100.0)
    ct, st = expand_rope_tables(cos, sin, C, x.dtype)

    out = fb.ln_qkv_rope(x.reshape(-1, C), p["norm1"]["scale"],
                         p["norm1"]["bias"], p["attn"]["qkv"]["w"],
                         p["attn"]["qkv"]["b"], ct, st, HEADS, 1e-6)
    assert out is not None

    ln = layernorm(p["norm1"], x, 1e-6).reshape(-1, C)
    qkv = (ln @ p["attn"]["qkv"]["w"] + p["attn"]["qkv"]["b"]).reshape(
        B, N, 3, HEADS, hd)
    qr = apply_rope2d_bnhd(qkv[:, :, 0], cos, sin).reshape(-1, C)
    kr = apply_rope2d_bnhd(qkv[:, :, 1], cos, sin).reshape(-1, C)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(qr),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(kr),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out[2]), np.asarray(qkv[:, :, 2].reshape(-1, C)),
        rtol=2e-5, atol=2e-5)


def test_fused_block_packed_road_matches_plain(block_setup):
    """Full fused block through the single-DMA road (4-tuple rope tables +
    attn_impl='batched'): forward and gradients match the plain block."""
    from fast3r_tpu.ops.rope2d import expand_rope_tables

    p, x = block_setup
    hd = C // HEADS
    pos = jnp.stack(jnp.meshgrid(jnp.arange(8), jnp.arange(16),
                                 indexing="ij"), -1).reshape(-1, 2)
    pos = jnp.broadcast_to(pos[None].astype(jnp.int32), (B, N, 2))
    cos, sin = rope2d_cos_sin(pos, hd, 100.0)
    ct, st = expand_rope_tables(cos, sin, C, x.dtype)
    scale = hd ** -0.5

    def loss_plain(p_, x_):
        return jnp.sum(jnp.sin(vit_block(
            p_, x_, HEADS, scale, rope_cos_sin=(cos, sin),
            attn_impl="naive")))

    def loss_fused(p_, x_):
        return jnp.sum(jnp.sin(fb.fused_vit_block(
            p_, x_, (cos, sin, ct, st), HEADS, scale, "batched", 1e-6)))

    ref = vit_block(p, x, HEADS, scale, rope_cos_sin=(cos, sin),
                    attn_impl="naive")
    out = fb.fused_vit_block(p, x, (cos, sin, ct, st), HEADS, scale,
                             "batched", 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    gp_ref, gx_ref = jax.grad(loss_plain, argnums=(0, 1))(p, x)
    gp, gx = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=5e-4, atol=5e-4)
    for path_ref, path_got in zip(
            jax.tree.leaves_with_path(gp_ref), jax.tree.leaves_with_path(gp)):
        np.testing.assert_allclose(
            np.asarray(path_got[1]), np.asarray(path_ref[1]),
            rtol=5e-4, atol=5e-4, err_msg=str(path_ref[0]))
