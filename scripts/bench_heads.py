"""DPT-head phase bench on the real TPU: sweep head_chunk_views.

The r2 phase table pins the dual heads at 0.084 s (chunk 4, 89 TFLOP/s);
larger chunks mean fewer lax.map steps and fatter conv batches — this sweeps
the chunk size at the 20-view flagship shape to find the knee.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, H, W = 20, 384, 512
ITERS = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", default="4,10,20")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fast3r_tpu.models.dpt_head import dpt_head_forward, init_dpt_head
    from fast3r_tpu.models.fast3r import Fast3RConfig

    cfg = Fast3RConfig.flagship()
    P = (H // 16) * (W // 16)
    kg, kl = jax.random.split(jax.random.key(0))
    heads = {
        "g": jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_dpt_head(kg, cfg.head)),
        "l": jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_dpt_head(kl, cfg.head)),
    }
    rng = np.random.default_rng(0)
    hook_seq = jnp.asarray(
        rng.standard_normal((4, 1, V * P, cfg.decoder.embed_dim)),
        jnp.bfloat16)

    results = {}
    for cv in (int(c) for c in args.chunks.split(",")):
        if V % cv:
            print(f"skip chunk {cv}: does not divide V={V}", flush=True)
            continue
        nchunks = V // cv

        def run_all(p, hooks, cv=cv, nchunks=nchunks):
            def chunk_fn(ci):
                toks = [
                    jax.lax.dynamic_slice_in_dim(hooks[i], ci * cv * P,
                                                 cv * P, axis=1)
                    .reshape(cv, P, -1)
                    for i in range(4)
                ]
                g = dpt_head_forward(p["g"], cfg.head, toks, (H, W))
                l = dpt_head_forward(p["l"], cfg.head, toks, (H, W))
                return (g["conf"].astype(jnp.float32).sum()
                        + l["conf"].astype(jnp.float32).sum())

            return jax.lax.map(chunk_fn,
                               jnp.arange(nchunks, dtype=jnp.int32)).sum()

        def run_n(p, hooks, n):
            def body(i, acc):
                hi = hooks * (jnp.float32(1.0)
                              + i * jnp.float32(1e-8)).astype(hooks.dtype)
                return acc + run_all(p, hi)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        r1 = jax.jit(lambda p, h: run_n(p, h, 1))
        rN = jax.jit(lambda p, h: run_n(p, h, ITERS))
        try:
            float(np.asarray(r1(heads, hook_seq)))
            float(np.asarray(rN(heads, hook_seq)))
            per = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(r1(heads, hook_seq)))
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(np.asarray(rN(heads, hook_seq)))
                tN = time.perf_counter() - t0
                per.append((tN - t1) / (ITERS - 1))
            med = float(np.median(per))
            results[cv] = round(med, 4)
            print("chunk", cv, round(med, 4), flush=True)
        except Exception as e:
            results[cv] = f"FAILED {str(e)[:160]}"
            print("chunk", cv, "FAILED", str(e)[:160], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
