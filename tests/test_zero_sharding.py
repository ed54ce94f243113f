"""ZeRO optimizer-state sharding over the data axis (8-dev virtual mesh)."""

import numpy as np

import jax
import jax.numpy as jnp

from fast3r_tpu.data.dummy import make_dummy_batch
from fast3r_tpu.models.fast3r import Fast3RConfig, init_fast3r
from fast3r_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_params,
    zero_init_opt_state,
    zero_opt_state_shardings,
)
from fast3r_tpu.train.step import OptimConfig, TrainState, make_jitted_train_step, make_optimizer


def test_zero_opt_state_is_sharded_and_trains():
    mesh = make_mesh(data=4, model=2)
    cfg = Fast3RConfig.tiny()
    optim_cfg = OptimConfig(warmup_steps=2, total_steps=50)
    tx = make_optimizer(optim_cfg)

    params = shard_params(init_fast3r(jax.random.key(0), cfg), mesh)
    opt_state = zero_init_opt_state(tx, params, mesh)

    # adam moments for the big tensors must actually be sharded over "data"
    shardings = zero_opt_state_shardings(tx, params, mesh)
    specs = [str(s.spec) for s in jax.tree.leaves(shardings)
             if hasattr(s, "spec")]
    assert any("data" in s for s in specs), specs

    mu_leaves = jax.tree.leaves(opt_state)
    sharded_bytes = sum(
        np.prod(l.sharding.shard_shape(l.shape)) for l in mu_leaves
        if hasattr(l, "sharding")
    )
    total = sum(np.prod(l.shape) for l in mu_leaves)
    assert sharded_bytes < 0.6 * total, (sharded_bytes, total)  # ~1/4 for big leaves

    # the train step runs with the ZeRO state and PRESERVES its sharding
    from fast3r_tpu.parallel.mesh import train_state_shardings

    state = TrainState(params=params, opt_state=opt_state,
                       step=jnp.zeros((), jnp.int32), rng=jax.random.key(1))
    batch_np = make_dummy_batch(4, 2, 48, 64, seed=0)
    bshard = batch_sharding(mesh)
    batch = {k: jax.device_put(jnp.asarray(batch_np[k]), bshard)
             for k in ("imgs", "true_shapes", "pts3d", "valid_mask",
                       "camera_pose")}
    sshard = train_state_shardings(state, mesh, tx)
    step = make_jitted_train_step(cfg, optim_cfg, state_shardings=sshard)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    post_specs = [
        str(l.sharding.spec) for l in jax.tree.leaves(state.opt_state)
        if hasattr(l, "sharding") and hasattr(l.sharding, "spec")
    ]
    assert any("data" in s_ for s_ in post_specs), post_specs
