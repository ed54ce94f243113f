"""Re-measure the chip's bf16 matmul roof + the DPT-head phase (VERDICT r1).

Round-1 left three numbers that cannot all be true: a "64 TFLOP/s matmul
roof" (single shape, 15360x1024x4096), a 20-view forward implying ~79 TFLOP/s
effective (50.45 TFLOP / 0.637 s with the authoritative counter in
fast3r_tpu/utils/flops.py), and an implied ~107 TFLOP/s head phase.  This
script measures several matmul shapes AND the dual-head phase with the same
chained-timing protocol (bench.py notes), 3 repeats each, min/median reported.

The iteration count is a traced fori_loop bound so each probe is ONE compiled
program regardless of n (distinct programs pay a minutes-long remote compile
on the tunneled platform).

  python scripts/bench_roof.py [--probes matmul,heads]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MM_SHAPES = [
    (15360, 1024, 4096),   # the r1 "roof" shape (decoder MLP-like)
    (8192, 8192, 8192),    # square, MXU-friendly
    (4096, 4096, 4096),
    (15360, 4096, 1024),   # MLP down-projection orientation
]
REPEATS = 3


def timed_per_iter(run, args, iters):
    """(t_iters - t_1)/(iters-1), REPEATS times -> (min, median) seconds.

    run(*args, n) must chain n dependent invocations on device and return a
    scalar; fetching it forces execution (block_until_ready does not
    synchronize on this platform).
    """
    import jax.numpy as jnp

    one, many = jnp.int32(1), jnp.int32(iters)
    float(np.asarray(run(*args, one)))     # compile + warm
    float(np.asarray(run(*args, many)))
    per = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(np.asarray(run(*args, one)))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(run(*args, many)))
        tN = time.perf_counter() - t0
        per.append((tN - t1) / (iters - 1))
    return min(per), float(np.median(per))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", default="matmul,heads")
    args = ap.parse_args()
    probes = set(args.probes.split(","))

    import jax
    import jax.numpy as jnp

    results = {}

    if "matmul" in probes:
        def run_mm(a, b, n):
            def body(i, acc):
                ai = a * (jnp.float32(1.0) + i * jnp.float32(1e-8)).astype(a.dtype)
                return acc + (ai @ b).astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        run_mm = jax.jit(run_mm)
        rng = np.random.default_rng(0)
        for (M, K, N) in MM_SHAPES:
            a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
            b = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
            tflop = 2.0 * M * K * N / 1e12
            iters = max(4, int(round(1.0 / (tflop / 100.0))))  # ~1 s at 100 TF/s
            tmin, tmed = timed_per_iter(run_mm, (a, b), iters)
            key = f"matmul_{M}x{K}x{N}"
            results[key] = {
                "tflops_min": round(tflop / tmed, 1),
                "tflops_max": round(tflop / tmin, 1),
                "sec_per_iter_min": round(tmin, 5),
            }
            print(key, results[key], flush=True)

    if "heads" in probes:
        from fast3r_tpu.models.dpt_head import (
            DPTHeadConfig, dpt_head_forward, init_dpt_head,
        )
        from fast3r_tpu.utils.flops import dpt_head_flops_per_image

        V, H, W = 20, 384, 512
        chunk = 4
        cfg = DPTHeadConfig()
        kg, kl = jax.random.split(jax.random.key(0))
        params = {
            "g": jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                              init_dpt_head(kg, cfg)),
            "l": jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                              init_dpt_head(kl, cfg)),
        }
        P = (H // 16) * (W // 16)
        rng = np.random.default_rng(1)
        hooks = jnp.asarray(rng.standard_normal((4, V, P, 1024)), jnp.bfloat16)

        def run_heads(p, hk, n):
            def one(hk_i):
                # chunk views as the model does (head_chunk_views=4 in bench.py)
                # (4, V, P, D) -> (nch, 4, chunk, P, D)
                chunks = hk_i.reshape(4, V // chunk, chunk, P, -1)
                chunks = jnp.swapaxes(chunks, 0, 1)

                def per_chunk(c):
                    toks = [c[j] for j in range(4)]
                    og = dpt_head_forward(p["g"], cfg, toks, (H, W))
                    ol = dpt_head_forward(p["l"], cfg, toks, (H, W))
                    return (og["conf"].astype(jnp.float32).sum()
                            + ol["conf"].astype(jnp.float32).sum())

                return jax.lax.map(per_chunk, chunks).sum()

            def body(i, acc):
                hi = hk * (jnp.float32(1.0) + i * jnp.float32(1e-8)).astype(hk.dtype)
                return acc + one(hi)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        run_heads = jax.jit(run_heads)
        tflop = 2 * V * dpt_head_flops_per_image(cfg, H, W) / 1e12
        tmin, tmed = timed_per_iter(run_heads, (params, hooks), 8)
        results["heads_dual_20v_512x384"] = {
            "tflop": round(tflop, 2),
            "sec_per_iter_min": round(tmin, 4),
            "sec_per_iter_med": round(tmed, 4),
            "tflops_effective": round(tflop / tmed, 1),
        }
        print("heads", results["heads_dual_20v_512x384"], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
