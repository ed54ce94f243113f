"""Hardware A/B for the conv3-folded regression-head kernel.

Times fused_regression_trunk (+XLA conv3) vs fused_regression_head at the
headline 4-view 512x384 shape, checks hardware numerics against the plain
XLA composition, and compile-checks the 12-view training shape (the shape
that caught the r3 VMEM OOM).

    python scripts/bench_trunk_fold.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 32


def timed(fn, *a, iters=ITERS):
    import jax
    import jax.numpy as jnp

    def run_n(n, *aa):
        xx = aa[0]

        def body(i, acc):
            xi = jnp.maximum(xx, (acc - jnp.float32(1e30)).astype(xx.dtype))
            return acc + fn(xi, *aa[1:]).astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    r1 = jax.jit(lambda *aa: run_n(1, *aa))
    rN = jax.jit(lambda *aa: run_n(iters, *aa))
    float(np.asarray(r1(*a))); float(np.asarray(rN(*a)))
    vals = []
    for _ in range(5):
        t0 = time.perf_counter(); float(np.asarray(r1(*a))); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(rN(*a))); tN = time.perf_counter() - t0
        vals.append((tN - t1) / (iters - 1))
    return float(np.median(vals))


def main():
    import jax
    import jax.numpy as jnp

    from fast3r_tpu.nn.layers import conv2d
    from fast3r_tpu.ops import trunk_kernel as tk

    rng = np.random.default_rng(0)
    c1 = 128
    w1 = jnp.asarray(rng.standard_normal((3, 3, 256, c1)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((c1,)) * 0.1, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c1, c1)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((c1,)) * 0.1, jnp.bfloat16)
    w3 = jnp.asarray(rng.standard_normal((1, 1, c1, 4)) * 0.05, jnp.bfloat16)
    b3 = jnp.asarray(rng.standard_normal((4,)) * 0.1, jnp.bfloat16)

    for name, (B, hh, wc, H, W) in {
            "headline": (4, 192, 256, 384, 512),
            "12v-train": (12, 128, 160, 256, 320)}.items():
        x = jnp.asarray(rng.standard_normal((B, hh, wc, 256)) * 0.2,
                        jnp.bfloat16)

        def head_fused(xx):
            return tk.fused_regression_head(xx, w1, b1, w2, b2, w3, b3, H, W)

        def head_unfused(xx):
            y = tk.fused_regression_trunk(xx, w1, b1, w2, b2, H, W)
            return conv2d({"w": w3, "b": b3}, y, padding="VALID")

        def head_plain(xx):
            return tk._plain_head(xx, w1, b1, w2, b2, w3, b3, H, W)

        ref = np.asarray(jax.jit(head_plain)(x), np.float32)
        out = np.asarray(jax.jit(head_fused)(x), np.float32)
        dev = float(np.abs(out - ref).max())
        print(f"{name}: fold-vs-plain max|d| = {dev:.4f} "
              f"(mean|y| {np.abs(ref).mean():.3f})", flush=True)

        t_f = timed(head_fused, x)
        print(f"{name}: fused_regression_head   {t_f*1000:.3f} ms", flush=True)
        if name == "headline":
            t_u = timed(head_unfused, x)
            print(f"{name}: trunk + XLA conv3      {t_u*1000:.3f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
