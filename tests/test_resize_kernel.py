"""Interpret-mode goldens for the pallas bilinear-resize kernel
(ops/resize_kernel.py) against the dense-matrix formulation it replaces on
TPU (ops/resize.py _resize_matmul — tap/weight math shared by construction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast3r_tpu.ops.resize import _resize_matmul
from fast3r_tpu.ops.resize_kernel import (
    resize_bilinear_kernel,
    resize_kernel_supported,
)


def _mk(shape, dtype, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape) * 0.5, dtype)


@pytest.mark.parametrize("shape,out_hw", [
    ((2, 96, 128, 128), (192, 256)),   # regression-trunk shape (scaled B)
    ((1, 48, 64, 256), (96, 128)),     # fusion-block upsample2x shape
    ((1, 64, 32, 128), (96, 80)),      # non-2x ratios, both axes
    ((1, 96, 64, 128), (48, 32)),      # downsample
    ((1, 64, 64, 128), (64, 128)),     # identity H axis
])
def test_kernel_matches_matmul_form(shape, out_hw):
    x = _mk(shape, jnp.bfloat16)
    got = np.asarray(resize_bilinear_kernel(x, *out_hw), np.float32)
    ref = np.asarray(
        _resize_matmul(x.astype(jnp.float32), *out_hw), np.float32)
    assert got.shape == ref.shape
    # bf16 inputs + bf16 W-pass lerp vs fp32 matmul reference
    np.testing.assert_allclose(got, ref, atol=0.03, rtol=0.03)


def test_routing_gate():
    # the regression-trunk shape routes to the kernel ...
    assert resize_kernel_supported((4, 192, 256, 128), 384, 512, jnp.bfloat16)
    # ... fp32, non-128-multiple channels, lane-cap and small (fusion-block
    # upsample) shapes stay on the XLA matmul path
    assert not resize_kernel_supported(
        (4, 192, 256, 128), 384, 512, jnp.float32)
    assert not resize_kernel_supported((1, 8, 8, 64), 16, 16, jnp.bfloat16)
    assert not resize_kernel_supported(
        (1, 8, 512, 128), 16, 1024, jnp.bfloat16)
    assert not resize_kernel_supported((4, 96, 128, 256), 192, 256,
                                       jnp.bfloat16)


def test_gradient_is_exact_transpose():
    shape, out_hw = (1, 16, 32, 128), (32, 64)
    x = _mk(shape, jnp.bfloat16, seed=3)
    g = _mk((1, *out_hw, 128), jnp.bfloat16, seed=4)

    _, vjp = jax.vjp(lambda x_: resize_bilinear_kernel(x_, *out_hw), x)
    got = np.asarray(vjp(g)[0], np.float32)

    _, vjp_ref = jax.vjp(
        lambda x_: _resize_matmul(x_, *out_hw), x.astype(jnp.float32))
    ref = np.asarray(vjp_ref(g.astype(jnp.float32))[0], np.float32)
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)
