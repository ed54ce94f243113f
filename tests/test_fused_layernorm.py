"""Fused Pallas LayerNorm vs jnp reference (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from fast3r_tpu.ops.fused_layernorm import fused_layernorm


def _ref_ln(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def test_fused_ln_forward_matches():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 256)) * 5 + 2, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(256), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(256), jnp.float32)
    out = fused_layernorm(x, scale, bias, 1e-6)
    ref = _ref_ln(x, scale, bias, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_ln_3d_and_backward():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 40, 128)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(128), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(128), jnp.float32)

    def loss_fused(x, s, b):
        return jnp.sum(jnp.sin(fused_layernorm(x, s, b, 1e-6)))

    def loss_ref(x, s, b):
        return jnp.sum(jnp.sin(_ref_ln(x, s, b, 1e-6)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, name in zip(g1, g2, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-5, err_msg=name)


def test_fused_ln_bf16():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((16, 128)), jnp.bfloat16)
    scale = jnp.ones(128, jnp.float32)
    bias = jnp.zeros(128, jnp.float32)
    out = fused_layernorm(x, scale, bias, 1e-6)
    assert out.dtype == jnp.bfloat16
    ref = _ref_ln(x, scale, bias, 1e-6)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2)


def test_fused_ln_backward_multiblock_partials():
    """nblocks in (2, 8) exclusive — the per-block (1, d) partial spec this
    regression-tests was illegal on TPU (sublane rule); the bwd now keeps
    the full (nblocks, d) partial arrays resident and row-writes them."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fast3r_tpu.ops.fused_layernorm import fused_layernorm

    rng = np.random.default_rng(3)
    # 4096 rows x 1024 -> _pick_rows = 1024 -> nblocks = 4
    x = jnp.asarray(rng.standard_normal((4096, 1024)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal(1024), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(1024), jnp.float32)

    def loss_fused(x, s, b):
        return jnp.sum(jnp.sin(fused_layernorm(x, s, b, 1e-6)))

    def loss_ref(x, s, b):
        mean = jnp.mean(x, -1, keepdims=True)
        var = jnp.var(x, -1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-6) * s + b
        return jnp.sum(jnp.sin(y))

    g = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, name in zip(g, gr, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
