"""A/B the fused regression-trunk kernel's slot-ring depth on hardware.

The r3 attribution left the trunk at 4.21 ms/invocation vs ~2.7 SOL with a
2-deep ring; the VMEM estimate at the headline shape is 57.6 MiB, so a
third slot (+3.9 MiB) fits the physical 128 MiB — but the Mosaic stack
margin is anchored to one measurement, so this must be tried on hardware.

    python scripts/_trunk_ns_probe.py [--ns 2,3,4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 384, 512
B = 4
ITERS = 32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="2,3")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fast3r_tpu.models import dpt_head as dh
    from fast3r_tpu.ops import trunk_kernel as tk

    cfg = dh.DPTHeadConfig(dim_tokens=(1024, 1024, 1024, 1024))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          dh.init_dpt_head(jax.random.key(0), cfg))
    rng = np.random.default_rng(0)
    # trunk input: post-refinenet feature map at (H/2, W/2), 128 ch? mirror
    # bench_head's regression probe input shape
    hh, wc = H // 2, W // 2
    x = jnp.asarray(rng.standard_normal((B, hh, wc, 256)) * 0.2, jnp.bfloat16)
    hp = params["head"]

    def timed(fn, *a, iters=ITERS):
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

    ref = None
    for ns in (int(s) for s in args.ns.split(",")):
        old_ns, old_lim = tk.NSLOTS, tk.VMEM_LIMIT
        tk.NSLOTS = ns
        if ns > 2:
            tk.VMEM_LIMIT = 124 * 1024 * 1024
        try:
            def run(xx):
                return tk.fused_regression_trunk(
                    xx, hp["conv1"]["w"], hp["conv1"]["b"],
                    hp["conv2"]["w"], hp["conv2"]["b"], H, W)
            t = timed(run, x)
            out = np.asarray(jax.jit(run)(x), np.float32)
            if ref is None:
                ref = out
            dev = float(np.abs(out - ref).max())
            print(f"ns={ns}: {t*1000:.3f} ms  max|d| vs ns2 = {dev:.2e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - report compile OOM and move on
            print(f"ns={ns}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        finally:
            tk.NSLOTS, tk.VMEM_LIMIT = old_ns, old_lim


if __name__ == "__main__":
    main()
