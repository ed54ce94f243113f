"""Flagship training-step benchmark on the real chip.

One optimization step (forward + backward + AdamW) of the flagship model with
rematerialization, bf16 params/moments — demonstrates the training path on
hardware and measures step time.  Small view count by default so the single
execution stays under the tunneled worker's time cap.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fast3r_tpu.data.dummy import make_dummy_batch
    from fast3r_tpu.models.fast3r import Fast3RConfig, init_fast3r
    from fast3r_tpu.train.step import (
        OptimConfig,
        init_train_state,
        make_jitted_train_step,
    )

    cfg = Fast3RConfig.flagship(attn_impl="pallas")
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        init_fast3r(jax.random.key(0), cfg),
    )
    optim_cfg = OptimConfig(warmup_steps=10, total_steps=1000)
    state = init_train_state(params, optim_cfg, jax.random.key(1))
    step = make_jitted_train_step(cfg, optim_cfg, remat=True)

    batch_np = make_dummy_batch(1, args.views, args.height, args.width, seed=0)
    batch = {
        k: jnp.asarray(batch_np[k], jnp.bfloat16 if k == "imgs" else None)
        for k in ("imgs", "true_shapes", "pts3d", "valid_mask", "camera_pose")
    }

    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    first_loss = float(np.asarray(metrics["loss"]))
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    losses = []
    for _ in range(args.iters):
        state, metrics = step(state, batch)
        losses.append(float(np.asarray(metrics["loss"])))
    dt = (time.perf_counter() - t0) / args.iters

    print(json.dumps({
        "metric": f"train step ({args.views} views @ {args.width}x{args.height}, "
                  f"bf16+remat, flagship fwd+bwd+AdamW)",
        "value": round(dt, 3),
        "unit": "seconds/step",
        "compile_plus_first_step_s": round(t_compile, 1),
        "first_loss": first_loss,
        "losses": [round(l, 4) for l in losses],
    }))


if __name__ == "__main__":
    main()
