"""Train-step speed-of-light attribution at the flagship shape (real TPU).

The 20-view 512x384 train step measured 2.431 s (BENCHMARKS.md) vs a 0.426 s
forward — a 5.7x ratio where the remat-ideal is ~4x (fwd + recompute-fwd +
2x-fwd backward ~ 4x, + optimizer).  These probes decompose the step by
differentiating w.r.t. PARAM SUBSETS: jax.grad only runs the VJP along the
path to the requested params, so grads w.r.t. heads-only skips the decoder
and encoder backwards entirely (chain rule never reaches them), isolating
each stage's backward cost by subtraction:

  full        production train step (fwd + bwd-all + AdamW)   [train/step.py]
  nopt        fwd + bwd-all, optimizer skipped  (full - nopt = AdamW)
  grad_dh     bwd through heads + decoder only  (nopt - grad_dh = bwd-encoder)
  grad_h      bwd through heads only            (grad_dh - grad_h = bwd-decoder)
  fwd         loss value only                   (grad_h - fwd = bwd-heads)

All probes run the SAME remat forward; params are jit ARGUMENTS (closing
over them bakes 1.3 GB of constants into the HLO -> remote-compile HTTP
413).  Timing: chained fori_loop is unusable here (the step's donated state
threads through the loop instead), so each probe times ITERS sequential
dispatches after a warmup and subtracts nothing — at ~2.4 s/step the
~25-50 ms tunnel roundtrip is <2% and is reported alongside.

    python scripts/bench_train_ablate.py [--views 20] [--probes ...]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 384, 512
ITERS = 3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=20)
    # `full` runs LAST: its jitted step DONATES the train state, whose
    # params alias the probe params — and copying them instead OOMs the 16
    # GB chip at 20 views (caught r4)
    ap.add_argument("--probes", default="fwd,grad_h,grad_dh,nopt,full")
    args = ap.parse_args()
    probes = args.probes.split(",")

    import jax
    import jax.numpy as jnp

    from fast3r_tpu.data.dummy import make_dummy_batch
    from fast3r_tpu.models.fast3r import Fast3RConfig, init_fast3r
    from fast3r_tpu.models.fast3r import fast3r_forward
    from fast3r_tpu.train.losses import LossConfig, conf_loss_multiview_v2
    from fast3r_tpu.train.step import (
        OptimConfig, init_train_state, make_jitted_train_step,
    )

    cfg = Fast3RConfig.flagship(attn_impl="pallas")
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        init_fast3r(jax.random.key(0), cfg),
    )
    optim_cfg = OptimConfig(warmup_steps=10, total_steps=1000)
    loss_cfg = LossConfig()

    batch_np = make_dummy_batch(1, args.views, H, W, seed=0)
    batch = {
        k: jnp.asarray(batch_np[k], jnp.bfloat16 if k == "imgs" else None)
        for k in ("imgs", "true_shapes", "pts3d", "valid_mask", "camera_pose")
    }
    rng = jax.random.key(2)

    def loss_from(params_diff, params_stop):
        # stop_gradient INSIDE the trace (free); eagerly it dispatches an
        # identity op and copies ~1.3 GB of params per probe
        params_stop = jax.tree.map(jax.lax.stop_gradient, params_stop)
        merged = {**params_stop, **params_diff}
        preds = fast3r_forward(merged, cfg, batch_shape_args[0],
                               batch_shape_args[1], is_training=True,
                               rng=rng, remat=True)
        gts = {"pts3d": batch["pts3d"], "valid_mask": batch["valid_mask"],
               "camera_pose": batch["camera_pose"]}
        loss, _ = conf_loss_multiview_v2(gts, preds, loss_cfg)
        return loss

    batch_shape_args = (batch["imgs"], batch["true_shapes"])
    head_keys = tuple(k for k in params if k.startswith("head"))
    dh_keys = head_keys + ("decoder",)

    def split(keys):
        diff = {k: params[k] for k in keys}
        stop = {k: v for k, v in params.items() if k not in keys}
        return diff, stop

    def checksum(tree):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(tree))

    fns = {}
    if "fwd" in probes:
        fns["fwd"] = jax.jit(lambda pd, ps: loss_from(pd, ps))
    if "grad_h" in probes:
        fns["grad_h"] = jax.jit(
            lambda pd, ps: checksum(jax.grad(loss_from)(pd, ps)))
    if "grad_dh" in probes:
        fns["grad_dh"] = jax.jit(
            lambda pd, ps: checksum(jax.grad(loss_from)(pd, ps)))
    if "nopt" in probes:
        fns["nopt"] = jax.jit(
            lambda pd, ps: checksum(jax.grad(loss_from)(pd, ps)))

    results = {}

    def timed_dispatches(run1):
        run1()  # warm (compile)
        vals = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                run1()
            vals.append((time.perf_counter() - t0) / ITERS)
        return float(np.median(vals))

    for name in probes:
        if name == "full":
            state = init_train_state(params, optim_cfg, jax.random.key(1))
            step = make_jitted_train_step(cfg, optim_cfg, remat=True)

            def run_full():
                nonlocal state
                state, metrics = step(state, batch)
                float(np.asarray(metrics["loss"]))
            results["full"] = timed_dispatches(run_full)
        elif name in ("fwd", "grad_h"):
            pd, ps = split(head_keys)
            fn = fns[name]

            def run():
                float(np.asarray(fn(pd, ps)))
            results[name] = timed_dispatches(run)
        elif name == "grad_dh":
            pd, ps = split(dh_keys)
            fn = fns[name]

            def run():
                float(np.asarray(fn(pd, ps)))
            results[name] = timed_dispatches(run)
        elif name == "nopt":
            pd, ps = split(tuple(params))
            fn = fns[name]

            def run():
                float(np.asarray(fn(pd, ps)))
            results[name] = timed_dispatches(run)
        print(name, round(results[name], 4), "s", flush=True)

    if len(results) > 1:
        attr = {}
        if "full" in results and "nopt" in results:
            attr["adamw_plus_guard"] = results["full"] - results["nopt"]
        if "nopt" in results and "grad_dh" in results:
            attr["bwd_encoder"] = results["nopt"] - results["grad_dh"]
        if "grad_dh" in results and "grad_h" in results:
            attr["bwd_decoder"] = results["grad_dh"] - results["grad_h"]
        if "grad_h" in results and "fwd" in results:
            attr["bwd_heads"] = results["grad_h"] - results["fwd"]
        print(json.dumps({"raw_s": {k: round(v, 4) for k, v in
                                    results.items()},
                          "attribution_s": {k: round(v, 4) for k, v in
                                            attr.items()}}))


if __name__ == "__main__":
    main()
