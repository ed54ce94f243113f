"""Attribute the training-forward overhead (r4: train fwd 0.497 s vs
inference fwd 0.427 s at the 20-view flagship shape — where do the ~70 ms
of ids/rng/loss go?).

Probes, each a separate chained-fori timed program (bench.py protocol):
  infer_fwd   inference forward (arange ids, entropy scale)
  train_fwd   training forward only (random ids, rng threaded, train scale)
  train_loss  training forward + conf_loss_multiview_v2 (the value pass of
              the train step, minus grad/optimizer)

train_fwd - infer_fwd  = random-id sampling + train-mode plumbing
train_loss - train_fwd = the loss pipeline itself (Regr3D normalization,
                         masked reductions, conf log terms)

    python scripts/bench_train_fwd.py [--views 20] [--iters 8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, H, W = 20, 384, 512


def timed(fn, args, iters, repeats=3):
    import jax
    import jax.numpy as jnp

    def run_n(n, *a):
        x = a[-1]

        def body(i, acc):
            xi = x * (jnp.float32(1.0) + i * jnp.float32(1e-8)).astype(x.dtype)
            return acc + fn(*a[:-1], xi)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    r1 = jax.jit(lambda *a: run_n(1, *a))
    rN = jax.jit(lambda *a: run_n(iters, *a))
    float(np.asarray(r1(*args)))
    float(np.asarray(rN(*args)))
    vals = []
    for _ in range(repeats):
        t0 = time.perf_counter(); float(np.asarray(r1(*args))); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(rN(*args))); tN = time.perf_counter() - t0
        vals.append((tN - t1) / (iters - 1))
    return float(np.median(vals))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=V)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--probes", default="infer_fwd,train_fwd,train_loss")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fast3r_tpu.models.fast3r import (
        Fast3RConfig, fast3r_forward, init_fast3r,
    )
    from fast3r_tpu.train.losses import LossConfig, conf_loss_multiview_v2

    v = args.views
    cfg = Fast3RConfig.flagship()
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_fast3r(jax.random.key(0), cfg))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((1, v, H, W, 3)) * 0.5,
                       jnp.bfloat16)
    gts = {
        "pts3d": jnp.asarray(rng.standard_normal((1, v, H, W, 3)),
                             jnp.float32),
        "valid_mask": jnp.asarray(rng.random((1, v, H, W)) > 0.2),
        "camera_pose": jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                        (1, v, 4, 4)),
    }
    key = jax.random.key(7)
    loss_cfg = LossConfig()

    def checksum(tree):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(tree))

    results = {}
    for probe in args.probes.split(","):
        if probe == "infer_fwd":
            def run(p, x):
                return checksum(fast3r_forward(p, cfg, x))
        elif probe == "train_fwd":
            def run(p, x):
                return checksum(fast3r_forward(p, cfg, x,
                                               is_training=True, rng=key))
        elif probe == "train_loss":
            def run(p, x):
                preds = fast3r_forward(p, cfg, x, is_training=True, rng=key)
                loss, _ = conf_loss_multiview_v2(gts, preds, loss_cfg)
                return loss.astype(jnp.float32)
        else:
            continue
        s = timed(run, (params, imgs), args.iters)
        results[probe] = round(s, 4)
        print(probe, results[probe], flush=True)

    print(json.dumps({"views": v, "results": results}))


if __name__ == "__main__":
    main()
