"""Parity tests for the single-program batched attention kernel
(ops/batched_attention.py) against the naive fp32 reference, interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast3r_tpu.ops.attention import dot_product_attention
from fast3r_tpu.ops.batched_attention import (
    _naive_reference,
    batched_attention,
    batched_attention_supported,
)


def _mk(key, shape, dtype):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


@pytest.mark.parametrize("shape", [(3, 256, 4, 64), (2, 768, 8, 64),
                                   (1, 64, 3, 64)])
def test_parity_fp32(shape):
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (_mk(x, shape, jnp.float32) for x in ks)
    scale = shape[-1] ** -0.5
    ref = dot_product_attention(q, k, v, scale, impl="naive")
    out = batched_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_parity_bf16_encoder_shape():
    """The production encoder shape at reduced batch: 4 views x 16 heads."""
    shape = (4, 768, 16, 64)
    ks = jax.random.split(jax.random.key(1), 3)
    q, k, v = (_mk(x, shape, jnp.bfloat16) for x in ks)
    scale = 0.125
    assert batched_attention_supported(shape, jnp.bfloat16)
    ref = dot_product_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        scale, impl="naive")
    out = batched_attention(q, k, v, scale)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    assert err.max() < 0.02, err.max()  # bf16 rounding scale


def test_entropy_scale_passthrough():
    """Non-default softmax scale (the inference entropy bias) is honored."""
    shape = (2, 128, 4, 64)
    ks = jax.random.split(jax.random.key(2), 3)
    q, k, v = (_mk(x, shape, jnp.float32) for x in ks)
    scale = 0.125 * np.sqrt(np.log(137.0) / np.log(20.0))
    ref = dot_product_attention(q, k, v, scale, impl="naive")
    out = batched_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_unsupported_shapes_fall_back():
    # N % 32 != 0 (224-res: 196 patches) and cross-attention both fall back
    shape = (2, 196, 4, 64)
    ks = jax.random.split(jax.random.key(3), 3)
    q, k, v = (_mk(x, shape, jnp.float32) for x in ks)
    assert not batched_attention_supported(shape, jnp.float32)
    ref = dot_product_attention(q, k, v, 0.125, impl="xla")
    out = batched_attention(q, k, v, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    kv = _mk(ks[1], (2, 256, 4, 64), jnp.float32)
    out2 = batched_attention(q, kv, kv, 0.125)
    ref2 = dot_product_attention(q, kv, kv, 0.125, impl="xla")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=1e-6)


def test_gradients_match_naive():
    shape = (2, 64, 4, 64)
    ks = jax.random.split(jax.random.key(4), 3)
    q, k, v = (_mk(x, shape, jnp.float32) for x in ks)

    def loss_kernel(q, k, v):
        return (batched_attention(q, k, v, 0.125) ** 2).sum()

    def loss_ref(q, k, v):
        return (dot_product_attention(q, k, v, 0.125, impl="naive") ** 2).sum()

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_gradients_bf16_replay_matches_naive():
    """The bf16 custom-VJP replay (bf16-logits XLA path, r3) matches naive
    fp32 gradients at bf16 rounding scale."""
    shape = (2, 64, 4, 64)
    ks = jax.random.split(jax.random.key(8), 3)
    qf, kf, vf = (_mk(x, shape, jnp.float32) for x in ks)
    qb, kb, vb = (t.astype(jnp.bfloat16) for t in (qf, kf, vf))

    def loss_kernel(q, k, v):
        return jnp.sum(jnp.sin(batched_attention(q, k, v, 0.125)
                               .astype(jnp.float32)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(dot_product_attention(q, k, v, 0.125,
                                                     impl="naive")))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(qb, kb, vb)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(qf, kf, vf)
    for a, b in zip(gk, gr):
        assert np.abs(np.asarray(a, np.float32) - np.asarray(b)).max() < 0.05


def test_bf16_replay_grads_vs_fp32_naive_replay():
    """Regression guard on the bf16-logits XLA replay (r3 advisor note):
    with IDENTICAL bf16 inputs, the custom-VJP replay's grads must stay
    within bf16 logit-rounding of the fp32-naive replay's grads (measured
    max|d| 0.0078 on O(2) grads; bound 0.02) — tight enough to catch a
    future regression in the XLA bf16 attention path that the loose 0.05
    vs-fp32-inputs test above would miss."""
    shape = (2, 64, 4, 64)
    ks = jax.random.split(jax.random.key(8), 3)
    qb, kb, vb = (_mk(x, shape, jnp.float32).astype(jnp.bfloat16)
                  for x in ks)

    def loss_kernel(q, k, v):
        return jnp.sum(jnp.sin(batched_attention(q, k, v, 0.125)
                               .astype(jnp.float32)))

    def loss_naive(q, k, v):
        return jnp.sum(jnp.sin(_naive_reference(q, k, v, 0.125)
                               .astype(jnp.float32)))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(qb, kb, vb)
    gn = jax.grad(loss_naive, argnums=(0, 1, 2))(qb, kb, vb)
    for a, b in zip(gk, gn):
        d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
        assert d.max() < 0.02


def test_packed_vs_padded_kernels():
    """The zero-relayout packed kernel and the padded kernel agree with the
    naive reference (and with each other at kernel-exact level: identical
    sub-chain math, different data paths)."""
    from fast3r_tpu.ops.batched_attention import (
        _batched_bnhd,
        _packed_bnhd,
        packed_attention_supported,
    )

    shape = (2, 768, 16, 64)
    assert packed_attention_supported(shape, jnp.bfloat16)
    ks = jax.random.split(jax.random.key(5), 3)
    q, k, v = (_mk(x, shape, jnp.bfloat16) for x in ks)
    scale = 0.125
    packed = np.asarray(_packed_bnhd(q, k, v, scale), np.float32)
    padded = np.asarray(_batched_bnhd(q, k, v, scale), np.float32)
    ref = np.asarray(dot_product_attention(
        q.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32), scale, impl="naive"))
    assert np.abs(packed - ref).max() < 0.02
    # same sub-chain softmax math -> bit-comparable up to the lane layout
    assert np.abs(packed - padded).max() < 1e-5


def test_packed_odd_head_counts_unsupported():
    # H=3 cannot form a 128-aligned lane group at D=64 -> padded kernel path
    from fast3r_tpu.ops.batched_attention import packed_attention_supported

    assert not packed_attention_supported((1, 64, 3, 64), jnp.float32)


def test_fusedqkv_single_dma_matches_packed():
    """The single-DMA fused-qkv kernel (packed_qkv_attention) computes the
    same sub-chain softmax as the packed kernel from one (3, B, N, C)
    array."""
    from fast3r_tpu.ops.batched_attention import (
        _packed_bnhd,
        packed_attention_supported,
        packed_qkv_attention,
    )

    B, N, H, D = 2, 128, 4, 64
    shape = (B, N, H, D)
    assert packed_attention_supported(shape, jnp.float32)
    ks = jax.random.split(jax.random.key(6), 3)
    q, k, v = (_mk(x, shape, jnp.float32) for x in ks)
    scale = 0.125
    qkv3 = jnp.stack([t.reshape(B, N, H * D) for t in (q, k, v)])
    out = np.asarray(packed_qkv_attention(qkv3, H, scale))
    ref = np.asarray(_packed_bnhd(q, k, v, scale)).reshape(B, N, H * D)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)
    naive = np.asarray(dot_product_attention(q, k, v, scale, impl="naive"))
    np.testing.assert_allclose(out, naive.reshape(B, N, H * D),
                               rtol=2e-5, atol=2e-5)


def test_fusedqkv_view_grouped_dma():
    """r4 view-grouped units: at B >= 2*NSLOTS_PACKED the fused-qkv kernel
    DMAs gv > 1 views per unit — the grouped path must match the naive
    reference exactly like the per-view path does."""
    from fast3r_tpu.ops import batched_attention as ba

    B, N, H, D = 8, 128, 4, 64
    assert ba._pick_gv(B, N, 4, ba._pick_pgroup(H, N, 4, D), D,
                       ba.NSLOTS_PACKED) > 1
    ks = jax.random.split(jax.random.key(11), 3)
    q, k, v = (_mk(x, (B, N, H, D), jnp.float32) for x in ks)
    scale = 0.125
    qkv3 = jnp.stack([t.reshape(B, N, H * D) for t in (q, k, v)])
    out = np.asarray(ba.packed_qkv_attention(qkv3, H, scale))
    naive = np.asarray(dot_product_attention(q, k, v, scale, impl="naive"))
    np.testing.assert_allclose(out, naive.reshape(B, N, H * D),
                               rtol=2e-5, atol=2e-5)


def test_fusedqkv_gradients_match_naive():
    from fast3r_tpu.ops.batched_attention import packed_qkv_attention

    B, N, H, D = 1, 64, 2, 64
    ks = jax.random.split(jax.random.key(7), 3)
    q, k, v = (_mk(x, (B, N, H, D), jnp.float32) for x in ks)
    scale = D ** -0.5
    qkv3 = jnp.stack([t.reshape(B, N, H * D) for t in (q, k, v)])

    def loss_kernel(t):
        return jnp.sum(jnp.sin(packed_qkv_attention(t, H, scale)))

    def loss_naive(t):
        qq, kk, vv = (t[i].reshape(B, N, H, D) for i in range(3))
        o = dot_product_attention(qq, kk, vv, scale, impl="naive")
        return jnp.sum(jnp.sin(o.reshape(B, N, H * D)))

    g1 = jax.grad(loss_kernel)(qkv3)
    g2 = jax.grad(loss_naive)(qkv3)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=2e-4, atol=2e-5)


def test_fusedqkv_bwd_kernel_bf16_vs_fp32_naive():
    """r4 manual-DMA backward kernel: bf16 grads must sit at bf16-input
    rounding distance from the fp32 naive grads — the kernel keeps fp32
    logits in VMEM, so it is TIGHTER than the bf16-logits XLA replay it
    superseded (whose documented bound was 0.05)."""
    from fast3r_tpu.ops import batched_attention as ba

    B, N, H, D = 2, 128, 4, 64
    assert ba.packed_qkv_bwd_supported((B, N, H, D), jnp.bfloat16)
    ks = jax.random.split(jax.random.key(9), 3)
    q, k, v = (_mk(x, (B, N, H, D), jnp.float32) for x in ks)
    scale = D ** -0.5
    qkv3 = jnp.stack([t.reshape(B, N, H * D) for t in (q, k, v)])

    def loss_kernel(t):
        return jnp.sum(jnp.sin(
            ba.packed_qkv_attention(t.astype(jnp.bfloat16), H,
                                    scale).astype(jnp.float32)))

    def loss_naive(t):
        qq, kk, vv = (t[i].reshape(B, N, H, D) for i in range(3))
        o = dot_product_attention(qq, kk, vv, scale, impl="naive")
        return jnp.sum(jnp.sin(o.reshape(B, N, H * D).astype(jnp.float32)))

    g1 = np.asarray(jax.grad(loss_kernel)(qkv3), np.float32)
    g2 = np.asarray(jax.grad(loss_naive)(qkv3), np.float32)
    assert np.abs(g1 - g2).max() < 0.02, np.abs(g1 - g2).max()


def test_fusedqkv_bwd_supported_at_flagship_shape():
    from fast3r_tpu.ops.batched_attention import packed_qkv_bwd_supported

    assert packed_qkv_bwd_supported((20, 768, 16, 64), jnp.bfloat16)
