"""Training-step tests: single device + sharded over a virtual 8-device mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from fast3r_tpu.data.dummy import make_dummy_batch
from fast3r_tpu.models.fast3r import Fast3RConfig, init_fast3r
from fast3r_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_params,
)
from fast3r_tpu.train.step import (
    OptimConfig,
    init_train_state,
    make_jitted_train_step,
)


def _tiny_setup(B=2, V=3):
    cfg = Fast3RConfig.tiny()
    params = init_fast3r(jax.random.key(0), cfg)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_dummy_batch(B, V, 48, 64, seed=0).items()
        if k in ("imgs", "true_shapes", "pts3d", "valid_mask", "camera_pose")
    }
    optim_cfg = OptimConfig(warmup_steps=5, total_steps=100)
    return cfg, params, batch, optim_cfg


def test_train_step_runs_and_decreases_loss():
    cfg, params, batch, optim_cfg = _tiny_setup()
    state = init_train_state(params, optim_cfg, jax.random.key(1))
    step = make_jitted_train_step(cfg, optim_cfg)

    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_lr_scales_per_param_group():
    """r4: OptimConfig.lr_scales reproduces optim_factory's per-group
    `lr * lr_scale` (reference dust3r/optim_factory.py:15-20): a group's
    param delta scales exactly, other groups are bit-identical."""
    from fast3r_tpu.train.step import make_optimizer

    cfg, params, batch, optim_cfg = _tiny_setup()
    scaled_cfg = OptimConfig(warmup_steps=5, total_steps=100,
                             weight_decay=0.0,
                             lr_scales=(("encoder", 0.25),))
    base_cfg = OptimConfig(warmup_steps=5, total_steps=100, weight_decay=0.0)

    grads = jax.tree.map(jnp.ones_like, params)
    for oc, want_scale in ((base_cfg, 1.0), (scaled_cfg, 0.25)):
        tx = make_optimizer(oc)
        opt_state = tx.init(params)
        updates, _ = tx.update(grads, opt_state, params)
        enc = np.asarray(jax.tree.leaves(updates["encoder"])[0])
        dec = np.asarray(jax.tree.leaves(updates["decoder"])[0])
        if want_scale == 1.0:
            base_enc, base_dec = enc, dec
        else:
            np.testing.assert_allclose(enc, base_enc * want_scale, rtol=1e-6)
            np.testing.assert_array_equal(dec, base_dec)


def test_train_step_sharded_8dev():
    """DP x TP over an 8-device CPU mesh (ddp_sim equivalent, SURVEY.md §4)."""
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=4, model=2)
    cfg, params, batch, optim_cfg = _tiny_setup(B=4)

    sharded = shard_params(params, mesh)
    pshard = param_shardings(params, mesh)
    # at least one tensor should actually be model-sharded
    specs = jax.tree.leaves(
        jax.tree.map(lambda s: str(s.spec), pshard)
    )
    assert any("model" in s for s in specs), specs

    bshard = batch_sharding(mesh)
    batch = {k: jax.device_put(v, bshard) for k, v in batch.items()}

    state = init_train_state(sharded, optim_cfg, jax.random.key(1))
    step = make_jitted_train_step(cfg, optim_cfg)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    # parity with the unsharded step (same inputs, same math)
    cfg2, params2, batch2, _ = _tiny_setup(B=4)
    state2 = init_train_state(params2, optim_cfg, jax.random.key(1))
    step2 = make_jitted_train_step(cfg2, optim_cfg)
    _, metrics2 = step2(state2, batch2)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics2["loss"]), rtol=1e-4
    )


def test_random_image_ids_deterministic_given_key():
    from fast3r_tpu.models.decoder import sample_random_image_ids

    ids1 = sample_random_image_ids(jax.random.key(7), 2, 5)
    ids2 = sample_random_image_ids(jax.random.key(7), 2, 5)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))
    ids = np.asarray(ids1)
    assert (ids[:, 0] == 0).all()
    for b in range(ids.shape[0]):
        rest = ids[b, 1:]
        assert len(set(rest.tolist())) == len(rest)  # non-repeating
        assert (rest >= 1).all() and (rest <= 999).all()


def test_nonfinite_loss_skips_update():
    """A poisoned batch (NaN GT) must leave params and optimizer state
    untouched (reference skips non-finite losses, module.py:195-205)."""
    import jax
    import jax.numpy as jnp

    from fast3r_tpu.data.dummy import make_dummy_batch
    from fast3r_tpu.models.fast3r import Fast3RConfig, init_fast3r
    from fast3r_tpu.train.step import (
        OptimConfig, init_train_state, make_jitted_train_step,
    )

    cfg = Fast3RConfig.tiny()
    optim_cfg = OptimConfig(warmup_steps=1, total_steps=10)
    state = init_train_state(init_fast3r(jax.random.key(0), cfg), optim_cfg,
                             jax.random.key(1))
    params_before = jax.tree.map(np.array, state.params)
    step = make_jitted_train_step(cfg, optim_cfg, remat=False)

    batch_np = make_dummy_batch(batch_size=1, num_views=2, height=48,
                                width=64, seed=0)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k in ("imgs", "true_shapes", "pts3d", "valid_mask",
                      "camera_pose")}
    batch["pts3d"] = batch["pts3d"].at[0, 0, 0, 0].set(jnp.nan)

    state2, metrics = step(state, batch)
    assert int(metrics["skipped_nonfinite"]) == 1
    for a, b in zip(jax.tree.leaves(state2.params),
                    jax.tree.leaves(params_before)):
        np.testing.assert_array_equal(np.asarray(a), b)
    # a clean batch afterwards still trains
    batch_ok = {k: jnp.asarray(v) for k, v in batch_np.items()
                if k in ("imgs", "true_shapes", "pts3d", "valid_mask",
                         "camera_pose")}
    state3, m2 = step(state2, batch_ok)
    assert int(m2["skipped_nonfinite"]) == 0
    assert np.isfinite(float(m2["loss"]))
    # the skipped step must NOT have advanced the schedule: optimizer count
    # is still 0, so lr(0)=0 and this first clean update is a param no-op;
    # the SECOND clean step (count 1, lr>0) must move params
    state4, m3 = step(state3, {k: jnp.asarray(v) for k, v in batch_np.items()
                               if k in batch})
    assert int(m3["skipped_nonfinite"]) == 0
    changed = any(
        not np.array_equal(np.asarray(a), b)
        for a, b in zip(jax.tree.leaves(state4.params),
                        jax.tree.leaves(params_before)))
    assert changed


def test_lr_scales_unknown_key_raises():
    """r4 advisor: a typo'd lr_scales group must raise at init, not silently
    train at full LR (the reference's torch param groups make a bad key
    structurally impossible, optim_factory.py:15-20)."""
    import jax.numpy as jnp
    import pytest

    from fast3r_tpu.train.step import OptimConfig, make_optimizer

    params = {"encoder": {"w": jnp.ones((2, 2))},
              "decoder": {"w": jnp.ones((2, 2))}}
    tx = make_optimizer(OptimConfig(warmup_steps=1, total_steps=10,
                                    lr_scales=(("encodr", 0.25),)))
    with pytest.raises(ValueError, match="encodr"):
        tx.init(params)
    # a valid key still initializes
    tx_ok = make_optimizer(OptimConfig(warmup_steps=1, total_steps=10,
                                       lr_scales=(("encoder", 0.25),)))
    tx_ok.init(params)


def test_train_step_zero_valid_pixel_view():
    """VERDICT r4 #8: a view with NO valid pixels (fully-masked depth, as
    happens in the wild with bad CO3D masks) must flow through the FULL
    train step — finite loss, finite grads, update applied (the masked-mean
    reductions must not divide by zero)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fast3r_tpu.data.dummy import make_dummy_batch
    from fast3r_tpu.models.fast3r import Fast3RConfig, init_fast3r
    from fast3r_tpu.train.step import (
        OptimConfig, init_train_state, make_jitted_train_step,
    )

    cfg = Fast3RConfig.tiny()
    params = init_fast3r(jax.random.key(0), cfg)
    batch_np = make_dummy_batch(batch_size=1, num_views=4, height=48,
                                width=64, seed=9)
    batch_np["valid_mask"][:, 0] = False       # view 0: zero valid pixels
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k in ("imgs", "true_shapes", "pts3d", "valid_mask",
                      "camera_pose")}
    state = init_train_state(params, OptimConfig(warmup_steps=1,
                                                 total_steps=10),
                             jax.random.key(1))
    # snapshot BEFORE the step: the jitted step donates its input state
    a = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    step = make_jitted_train_step(cfg, OptimConfig(warmup_steps=1,
                                                   total_steps=10),
                                  remat=False)
    new_state, m = step(state, batch)
    assert np.isfinite(float(m["loss"])), m
    assert np.isfinite(float(m["grad_norm"])), m
    assert float(m["grad_norm"]) > 0.0, m
    assert int(m["skipped_nonfinite"]) == 0
    # params actually move once the warmup LR is non-zero (step 2)
    new_state, m2 = step(new_state, batch)
    assert int(m2["skipped_nonfinite"]) == 0
    b = np.asarray(jax.tree.leaves(new_state.params)[0])
    assert not np.allclose(a, b)
