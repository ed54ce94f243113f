"""Multi-chip benchmark harness: sequence-sharded forward + training step.

Runs on a real TPU pod slice (or the virtual CPU mesh with
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu for a
correctness-only dry run).  Measures:
  1. seq-sharded N-view forward wall-clock (ring-attention decoder) vs the
     single-chip staged numbers in BENCHMARKS.md;
  2. one seq-sharded training step (fwd+bwd+AdamW) wall-clock.

Timing uses the checksum-fetch method (see bench.py) so it is valid on the
tunneled platform too.

  python scripts/bench_pod.py --views 256 --height 192 --width 256 \
      [--train] [--config {tiny,base,flagship}]
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
    ap.add_argument("--views", type=int, default=None,
                    help="total views (default: 16 per device)")
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--config", default="base",
                    choices=["tiny", "base", "flagship"],
                    help="model size (use tiny for CPU dry runs — the "
                         "in-process CPU communicator can hit rendezvous "
                         "timeouts on deep models)")
    ap.add_argument("--train", action="store_true",
                    help="also time one seq-sharded training step")
    ap.add_argument("--head-chunk", type=int, default=25)
    ap.add_argument("--ring-impl", default="xla", choices=["xla", "rdma"],
                    help="decoder ring: ppermute between flash calls (xla) "
                         "or the in-kernel RDMA ring (rdma, forward only)")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the tunneled-TPU plugin ignores the env var; force it in-process
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from fast3r_tpu.models.fast3r import Fast3RConfig, init_fast3r
    from fast3r_tpu.parallel.sequence import (
        make_seq_sharded_forward,
        make_seq_sharded_train_step,
    )

    devs = jax.devices()
    n = len(devs)
    mesh = Mesh(np.array(devs), ("seq",))
    V = args.views or 16 * n
    H, W = args.height, args.width
    cfg = {
        "tiny": Fast3RConfig.tiny,
        "base": Fast3RConfig.base,
        "flagship": lambda: Fast3RConfig.flagship(attn_impl="pallas"),
    }[args.config]()
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    params = jax.tree.map(lambda x: x.astype(dtype),
                          init_fast3r(jax.random.key(0), cfg))
    sh = NamedSharding(mesh, P(None, "seq"))
    imgs = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal((1, V, H, W, 3)), dtype), sh)

    fwd = make_seq_sharded_forward(cfg, mesh, num_views=V, image_hw=(H, W),
                                   head_chunk_views=args.head_chunk,
                                   ring_impl=args.ring_impl)

    def checksum(p, x):
        # consume every output — conf-only checksums let XLA DCE the local
        # head (r5 audit, see bench.py)
        return sum(v.astype(jnp.float32).sum() for v in fwd(p, x).values())

    cks = jax.jit(checksum)
    t0 = time.perf_counter()
    float(np.asarray(cks(params, imgs)))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    val = float(np.asarray(cks(params, imgs)))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"seq-sharded {V}-view forward @ {W}x{H} over {n} devices",
        "value": round(dt, 3), "unit": "seconds",
        "views_per_sec": round(V / dt, 2),
        "compile_s": round(t_compile, 1), "checksum": val,
    }))

    if args.train:
        from fast3r_tpu.data.dummy import make_dummy_batch
        from fast3r_tpu.train.step import OptimConfig, init_train_state

        optim_cfg = OptimConfig(warmup_steps=5, total_steps=100)
        state = init_train_state(params, optim_cfg, jax.random.key(1))
        step = make_seq_sharded_train_step(cfg, optim_cfg, mesh)
        batch_np = make_dummy_batch(batch_size=1, num_views=V, height=H,
                                    width=W, seed=1)
        batch = {k: jax.device_put(jnp.asarray(batch_np[k]).astype(
            jnp.float32 if k != "valid_mask" else jnp.bool_), sh)
            for k in ("imgs", "pts3d", "valid_mask", "camera_pose")}
        state, m = step(state, batch)  # compile + first step
        t0 = time.perf_counter()
        state, m = step(state, batch)
        float(np.asarray(m["loss"]))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": f"seq-sharded {V}-view train step over {n} devices",
            "value": round(dt, 3), "unit": "seconds",
            "loss": float(m["loss"]),
        }))


if __name__ == "__main__":
    main()
