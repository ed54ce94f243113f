"""Microbench: XLA conv efficiency on the DPT head's hot shapes (real TPU).

The dual DPT heads run at ~91 TFLOP/s overall (BENCHMARKS.md); 81% of their
FLOPs are three 3x3 convs (refinenet1 RCUs @4x, head.conv1 @8x, head.conv2
@full-res).  This times each conv IN ISOLATION to separate "XLA convs just
run at ~90 on these shapes" (then the head needs a different conv
formulation) from "the gap is the small ops / resizes between them" (then
the head needs restructuring around the convs).

Chained fori_loop + checksum-fetch timing (bench.py protocol).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 8


def timed(fn, *args, iters=ITERS):
    import jax
    import jax.numpy as jnp

    def run_n(args, n):
        x = args[0]

        def body(i, acc):
            # sequential NONLINEAR dependency: a bare conv is linear, so a
            # multiplicative/additive perturbation gets rewritten out of the
            # loop (conv(s*x, w) = s*conv(x, w) -> one conv total; the first
            # cut of this script measured a bogus 365 TFLOP/s that way).
            # max() can't be pushed through the conv, and chaining acc into
            # x forces one conv per iteration; numerically xi == x.
            xi = jnp.maximum(x, (acc - jnp.float32(1e30)).astype(x.dtype))
            return jnp.sum(fn(xi, *args[1:]).astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    r1 = jax.jit(lambda *a: run_n(a, 1))
    rN = jax.jit(lambda *a: run_n(a, iters))
    float(np.asarray(r1(*args)))
    float(np.asarray(rN(*args)))
    vals = []
    for _ in range(3):
        t0 = time.perf_counter(); float(np.asarray(r1(*args))); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(rN(*args))); tN = time.perf_counter() - t0
        vals.append((tN - t1) / (iters - 1))
    return float(np.median(vals))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", default="rcu4x,conv1,conv2,conv2_9mm")
    args = ap.parse_args()
    probes = set(args.probes.split(","))

    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def conv(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    def conv_9mm(x, w):
        # 3x3 conv as 9 shifted 1x1 matmuls (shift-and-matmul formulation)
        B, H, W, C = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((B, H, W, w.shape[-1]), jnp.float32)
        for a in range(3):
            for b in range(3):
                acc = acc + jnp.einsum(
                    "bhwc,co->bhwo", xp[:, a:a + H, b:b + W, :], w[a, b],
                    preferred_element_type=jnp.float32)
        return acc.astype(x.dtype)

    cases = {
        # (name, input shape, w shape, fn)
        "rcu4x": ((20, 96, 128, 256), (3, 3, 256, 256), conv),
        "conv1": ((20, 192, 256, 256), (3, 3, 256, 128), conv),
        "conv2": ((20, 384, 512, 128), (3, 3, 128, 128), conv),
        "conv2_9mm": ((20, 384, 512, 128), (3, 3, 128, 128), conv_9mm),
        "rcu4x_9mm": ((20, 96, 128, 256), (3, 3, 256, 256), conv_9mm),
    }

    out = {}
    for name, (xs, ws, fn) in cases.items():
        if name not in probes:
            continue
        x = jnp.asarray(rng.standard_normal(xs), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal(ws) * 0.05, jnp.bfloat16)
        t = timed(fn, x, w)
        B, H, W, C = xs
        tflop = 2 * 9 * C * ws[-1] * B * H * W / 1e12
        out[name] = {"ms": round(t * 1e3, 2), "tflops": round(tflop / t, 1)}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
