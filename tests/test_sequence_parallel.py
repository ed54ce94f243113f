"""Ring attention + sequence-sharded forward tests on the virtual 8-dev mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fast3r_tpu.models.fast3r import Fast3RConfig, fast3r_forward, init_fast3r
from fast3r_tpu.ops.attention import dot_product_attention
from fast3r_tpu.parallel.sequence import (
    make_seq_sharded_forward,
    ring_flash_attention,
)


def test_ring_attention_matches_global():
    devs = jax.devices()
    assert len(devs) == 8
    mesh = Mesh(np.array(devs), ("seq",))
    rng = np.random.default_rng(0)
    B, S, H, D = 1, 8 * 32, 4, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
        for _ in range(3)
    )
    scale = D ** -0.5
    ref = dot_product_attention(q, k, v, scale, impl="naive")

    fn = jax.jit(jax.shard_map(
        lambda q, k, v: ring_flash_attention(q, k, v, scale, "seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
        check_vma=False,
    ))
    sh = NamedSharding(mesh, P(None, "seq"))
    out = fn(jax.device_put(q, sh), jax.device_put(k, sh), jax.device_put(v, sh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_seq_sharded_forward_matches_single_device():
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:4]), ("seq",))
    cfg = Fast3RConfig.tiny()
    params = init_fast3r(jax.random.key(0), cfg)
    V, H, W = 8, 48, 64
    imgs = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, V, H, W, 3)), jnp.float32
    )

    ref = fast3r_forward(params, cfg, imgs)

    fwd = make_seq_sharded_forward(cfg, mesh, num_views=V, image_hw=(H, W))
    sh = NamedSharding(mesh, P(None, "seq"))
    out = fwd(params, jax.device_put(imgs, sh))

    for key in ("pts3d_in_other_view", "conf", "pts3d_local", "conf_local"):
        np.testing.assert_allclose(
            np.asarray(out[key]), np.asarray(ref[key]),
            rtol=5e-4, atol=5e-4, err_msg=key,
        )


def test_seq_sharded_forward_with_head_chunking():
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:2]), ("seq",))
    cfg = Fast3RConfig.tiny()
    params = init_fast3r(jax.random.key(0), cfg)
    V, H, W = 8, 48, 64
    imgs = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, V, H, W, 3)), jnp.float32
    )
    ref = fast3r_forward(params, cfg, imgs)
    fwd = make_seq_sharded_forward(cfg, mesh, num_views=V, image_hw=(H, W),
                                   head_chunk_views=2)
    sh = NamedSharding(mesh, P(None, "seq"))
    out = fwd(params, jax.device_put(imgs, sh))
    np.testing.assert_allclose(
        np.asarray(out["pts3d_in_other_view"]),
        np.asarray(ref["pts3d_in_other_view"]), rtol=5e-4, atol=5e-4,
    )


def test_ring_attention_gradient_matches_global():
    """Ring attention must be differentiable (custom VJP through the partial
    merge, incl. the lse cotangent) and match single-device attention grads."""
    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("seq",))
    rng = np.random.default_rng(2)
    B, S, H, D = 1, 8 * 32, 4, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
        for _ in range(3)
    )
    w = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    scale = D ** -0.5

    def ref_loss(q, k, v):
        o = dot_product_attention(q, k, v, scale, impl="naive")
        return jnp.sum(o * w)

    ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)

    ring = jax.shard_map(
        lambda q, k, v: ring_flash_attention(q, k, v, scale, "seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
        check_vma=False,
    )

    def ring_loss(q, k, v):
        return jnp.sum(ring(q, k, v) * w)

    sh = NamedSharding(mesh, P(None, "seq"))
    grads = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(
        jax.device_put(q, sh), jax.device_put(k, sh), jax.device_put(v, sh))
    for g, r in zip(grads, ref_grads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=3e-5, atol=3e-5)


def test_ring_attention_gradient_pallas_blocks():
    """Same as above but with tileable local shapes so the Pallas bwd kernels
    (with the dlse-folded delta) run instead of the jnp fallback."""
    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("seq",))
    rng = np.random.default_rng(3)
    B, S, H, D = 1, 8 * 128, 2, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
        for _ in range(3)
    )
    w = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    scale = D ** -0.5

    def ref_loss(q, k, v):
        o = dot_product_attention(q, k, v, scale, impl="naive")
        return jnp.sum(o * w)

    ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)

    ring = jax.shard_map(
        lambda q, k, v: ring_flash_attention(q, k, v, scale, "seq"),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
        check_vma=False,
    )

    def ring_loss(q, k, v):
        return jnp.sum(ring(q, k, v) * w)

    sh = NamedSharding(mesh, P(None, "seq"))
    grads = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(
        jax.device_put(q, sh), jax.device_put(k, sh), jax.device_put(v, sh))
    for g, r in zip(grads, ref_grads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=3e-5, atol=3e-5)


def test_seq_sharded_train_step_matches_single_device():
    """One optimizer step with the view sequence sharded over 4 devices must
    match the single-device train step (same random image ids, distributed
    loss reductions via psum, ring-attention backward)."""
    from fast3r_tpu.data.dummy import make_dummy_batch
    from fast3r_tpu.parallel.sequence import make_seq_sharded_train_step
    from fast3r_tpu.train.step import (
        OptimConfig, init_train_state, make_jitted_train_step,
    )
    from fast3r_tpu.models.fast3r import init_fast3r

    devs = jax.devices()
    mesh = Mesh(np.array(devs[:4]), ("seq",))
    cfg = Fast3RConfig.tiny()
    optim_cfg = OptimConfig(warmup_steps=2, total_steps=10)
    params = init_fast3r(jax.random.key(0), cfg)

    batch_np = make_dummy_batch(batch_size=1, num_views=8, height=48,
                                width=64, seed=0)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k in ("imgs", "true_shapes", "pts3d", "valid_mask",
                      "camera_pose")}

    # both steps donate their state; give each its own param buffers
    s_ref = init_train_state(jax.tree.map(jnp.copy, params), optim_cfg,
                             jax.random.key(1))
    ref_step = make_jitted_train_step(cfg, optim_cfg, remat=False)
    s_ref2, m_ref = ref_step(s_ref, batch)

    s_seq = init_train_state(params, optim_cfg, jax.random.key(1))
    seq_step = make_seq_sharded_train_step(cfg, optim_cfg, mesh, remat=False)
    sh = NamedSharding(mesh, P(None, "seq"))
    sharded_batch = {
        k: jax.device_put(v, sh) for k, v in batch.items()
        if k != "true_shapes"
    }
    s_seq2, m_seq = seq_step(s_seq, sharded_batch)

    np.testing.assert_allclose(float(m_seq["loss"]), float(m_ref["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m_seq["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=1e-3)
    # updated params agree (AdamW normalizes grads, so compare values)
    ref_leaves = jax.tree.leaves(s_ref2.params)
    seq_leaves = jax.tree.leaves(s_seq2.params)
    for a, b in zip(seq_leaves, ref_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_seq_sharded_train_step_2d_mesh_matches_single_device():
    """2D (data x seq) pod topology: batch sharded over 'data', views over
    'seq' — one optimizer step must still match the single-device step
    (batch-pooled per-view loss means psum over the data axis)."""
    from fast3r_tpu.data.dummy import make_dummy_batch
    from fast3r_tpu.parallel.sequence import make_seq_sharded_train_step
    from fast3r_tpu.train.step import (
        OptimConfig, init_train_state, make_jitted_train_step,
    )
    from fast3r_tpu.models.fast3r import init_fast3r

    devs = jax.devices()
    mesh = Mesh(np.array(devs[:4]).reshape(2, 2), ("data", "seq"))
    cfg = Fast3RConfig.tiny()
    optim_cfg = OptimConfig(warmup_steps=2, total_steps=10)
    params = init_fast3r(jax.random.key(0), cfg)

    batch_np = make_dummy_batch(batch_size=2, num_views=4, height=48,
                                width=64, seed=0)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k in ("imgs", "true_shapes", "pts3d", "valid_mask",
                      "camera_pose")}

    s_ref = init_train_state(jax.tree.map(jnp.copy, params), optim_cfg,
                             jax.random.key(1))
    ref_step = make_jitted_train_step(cfg, optim_cfg, remat=False)
    s_ref2, m_ref = ref_step(s_ref, batch)

    s_seq = init_train_state(params, optim_cfg, jax.random.key(1))
    seq_step = make_seq_sharded_train_step(cfg, optim_cfg, mesh,
                                           data_axis="data", remat=False)
    sh = NamedSharding(mesh, P("data", "seq"))
    sharded_batch = {k: jax.device_put(v, sh) for k, v in batch.items()
                     if k != "true_shapes"}
    s_seq2, m_seq = seq_step(s_seq, sharded_batch)

    np.testing.assert_allclose(float(m_seq["loss"]), float(m_ref["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s_seq2.params),
                    jax.tree.leaves(s_ref2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


@pytest.mark.parametrize("n", [1, 2, 3, 8])
def test_rdma_ring_attention_matches_global(n):
    """In-kernel RDMA ring (parallel/ring_rdma.py) vs global attention —
    interpreter mode exercises the real hop schedule (local copy, per-slot
    remote copies + semaphore waits, tile double buffering).  n covers the
    protocol's regimes: 1 (no hops — the single-chip hardware-lowering
    config), 2 (hops, no slot reuse), 3 (first reuse + capacity tokens),
    8 (steady-state back-pressure over the two reusable slots)."""
    from fast3r_tpu.parallel.ring_rdma import ring_flash_attention_rdma

    devs = jax.devices()
    assert len(devs) == 8
    mesh = Mesh(np.array(devs[:n]), ("seq",))
    rng = np.random.default_rng(7)
    B, S, H, D = 1, n * 32 * max(1, 8 // n), 4, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
        for _ in range(3)
    )
    scale = D ** -0.5
    ref = dot_product_attention(q, k, v, scale, impl="naive")

    fn = jax.jit(jax.shard_map(
        lambda q, k, v: ring_flash_attention_rdma(q, k, v, scale, "seq", n),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
        check_vma=False,
    ))
    sh = NamedSharding(mesh, P(None, "seq"))
    out = fn(jax.device_put(q, sh), jax.device_put(k, sh), jax.device_put(v, sh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_rdma_self_ring_matches_plain():
    """Single-device self-ring (every hop RDMAs the device's own slots):
    output must equal plain attention — the configuration used to exercise
    the remote-copy lowering on one real chip (scripts/bench_rdma_single)."""
    from fast3r_tpu.parallel.ring_rdma import ring_flash_attention_rdma

    mesh = Mesh(np.array(jax.devices()[:1]), ("seq",))
    rng = np.random.default_rng(9)
    B, S, H, D = 1, 256, 4, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
        for _ in range(3)
    )
    scale = D ** -0.5
    ref = dot_product_attention(q, k, v, scale, impl="naive")
    fn = jax.jit(jax.shard_map(
        lambda q, k, v: ring_flash_attention_rdma(
            q, k, v, scale, "seq", 1, self_ring_epochs=4),
        mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(),
        check_vma=False,
    ))
    out = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_seq_sharded_forward_rdma_matches_single_device():
    """The full 1000-view-path forward with ring_impl='rdma' must equal the
    single-device forward (and therefore the xla-ring variant)."""
    devs = jax.devices()
    mesh = Mesh(np.array(devs[:4]), ("seq",))
    cfg = Fast3RConfig.tiny()
    params = init_fast3r(jax.random.key(0), cfg)
    V, H, W = 8, 48, 64
    imgs = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, V, H, W, 3)), jnp.float32
    )

    ref = fast3r_forward(params, cfg, imgs)

    fwd = make_seq_sharded_forward(cfg, mesh, num_views=V, image_hw=(H, W),
                                   ring_impl="rdma")
    sh = NamedSharding(mesh, P(None, "seq"))
    out = fwd(params, jax.device_put(imgs, sh))

    for key in ("pts3d_in_other_view", "conf", "pts3d_local", "conf_local"):
        np.testing.assert_allclose(
            np.asarray(out[key]), np.asarray(ref[key]),
            rtol=5e-4, atol=5e-4, err_msg=key,
        )


@pytest.mark.parametrize("n", [1, 2, 3, 8])
def test_rdma_ring_gradient_matches_global(n):
    """r5: the differentiable RDMA ring (forward kernel + dq/dkv backward
    ring kernels, parallel/ring_rdma.py) must match single-device attention
    gradients.  n covers the same protocol regimes as the forward test."""
    from fast3r_tpu.parallel.ring_rdma import ring_flash_attention_rdma_diff

    devs = jax.devices()
    mesh = Mesh(np.array(devs[:n]), ("seq",))
    rng = np.random.default_rng(11)
    B, S, H, D = 1, n * 32 * max(1, 8 // n), 4, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
        for _ in range(3)
    )
    w = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    scale = D ** -0.5

    def ref_loss(q, k, v):
        o = dot_product_attention(q, k, v, scale, impl="naive")
        return jnp.sum(o * w)

    ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)

    ring = jax.shard_map(
        lambda q, k, v: ring_flash_attention_rdma_diff(q, k, v, scale,
                                                       "seq", n),
        mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq")),
        out_specs=P(None, "seq"),
        check_vma=False,
    )

    def ring_loss(q, k, v):
        return jnp.sum(ring(q, k, v) * w)

    sh = NamedSharding(mesh, P(None, "seq"))
    grads = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(
        jax.device_put(q, sh), jax.device_put(k, sh), jax.device_put(v, sh))
    for g, r in zip(grads, ref_grads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=3e-5, atol=3e-5)


def test_seq_sharded_train_step_rdma_matches_xla():
    """VERDICT r4 #4 gate: make_seq_sharded_train_step(ring_impl='rdma')
    matches the XLA ppermute ring's step on the virtual mesh — same loss,
    grad norm, and updated params."""
    from fast3r_tpu.data.dummy import make_dummy_batch
    from fast3r_tpu.parallel.sequence import make_seq_sharded_train_step
    from fast3r_tpu.train.step import OptimConfig, init_train_state

    devs = jax.devices()
    mesh = Mesh(np.array(devs[:4]), ("seq",))
    cfg = Fast3RConfig.tiny()
    optim_cfg = OptimConfig(warmup_steps=2, total_steps=10)
    params = init_fast3r(jax.random.key(0), cfg)

    batch_np = make_dummy_batch(batch_size=1, num_views=8, height=48,
                                width=64, seed=3)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k in ("imgs", "pts3d", "valid_mask", "camera_pose")}
    sh = NamedSharding(mesh, P(None, "seq"))
    sharded_batch = {k: jax.device_put(v, sh) for k, v in batch.items()}

    s_xla = init_train_state(jax.tree.map(jnp.copy, params), optim_cfg,
                             jax.random.key(1))
    xla_step = make_seq_sharded_train_step(cfg, optim_cfg, mesh,
                                           remat=False, ring_impl="xla")
    s_xla2, m_xla = xla_step(s_xla, sharded_batch)

    s_rdma = init_train_state(params, optim_cfg, jax.random.key(1))
    rdma_step = make_seq_sharded_train_step(cfg, optim_cfg, mesh,
                                            remat=False, ring_impl="rdma")
    s_rdma2, m_rdma = rdma_step(s_rdma, sharded_batch)

    np.testing.assert_allclose(float(m_rdma["loss"]), float(m_xla["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_rdma["grad_norm"]),
                               float(m_xla["grad_norm"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s_rdma2.params),
                    jax.tree.leaves(s_xla2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)
