"""Ring attention + sequence-sharded forward tests on the virtual 8-dev mesh."""

import numpy as np

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
