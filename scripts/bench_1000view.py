"""1000-view single forward pass benchmark (BASELINE.json config 5).

Runs the flagship model on N views at 256x192 (192 patches/view ->
S = N*192 fused tokens) in bf16 on the available TPU, with the Pallas flash
attention decoder and chunked heads, and reports wall-clock.

The reference's headline claim is 1000+ views in one forward on an A100-80GB
(README.md:3).  Timing uses a checksum fetch (see bench.py notes on the
tunneled-TPU platform).
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
    ap.add_argument("--views", type=int, default=1000)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--head-chunk", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fast3r_tpu.models.fast3r import Fast3RConfig, fast3r_forward, init_fast3r

    cfg = Fast3RConfig.flagship(attn_impl="pallas")
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        init_fast3r(jax.random.key(0), cfg),
    )
    V, H, W = args.views, args.height, args.width
    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, V, H, W, 3)), jnp.bfloat16
    )

    def fwd(p, x):
        out = fast3r_forward(p, cfg, x, head_chunk_views=args.head_chunk)
        return out["conf"].astype(jnp.float32).sum()

    f = jax.jit(fwd)
    t0 = time.perf_counter()
    first = float(np.asarray(f(params, imgs)))
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    val = float(np.asarray(f(params, imgs * jnp.bfloat16(1.0000001))))
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": f"wall-clock {V}-view forward @ {W}x{H} bf16 (single chip)",
        "value": round(dt, 2),
        "unit": "seconds",
        "compile_plus_first_run_s": round(t_compile, 2),
        "checksum": val,
        "views_per_sec": round(V / dt, 2),
    }))


if __name__ == "__main__":
    main()
