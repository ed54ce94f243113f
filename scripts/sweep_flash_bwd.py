"""Sweep flash-attention BACKWARD block sizes on the real TPU.

The forward was tuned in r2 ((1024,3840) split-chain, 85.8 TFLOP/s); the
backward still runs r1's conservative (512,512).  Backward flops are 2.5x
the forward (5 matmuls per dq+dkv pass vs 2), so this is the dominant cost
of large-sequence training steps.

  python scripts/sweep_flash_bwd.py [--seq 15360] [--configs 512x512,...]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_CONFIGS = "512x512,512x1024,1024x512,512x1536,256x1024"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=15360)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--head-dim", type=int, default=64)
    ap.add_argument("--configs", default=DEFAULT_CONFIGS)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fast3r_tpu.ops import flash_attention as fa

    S, H, D = args.seq, args.heads, args.head_dim
    scale = D ** -0.5
    # bwd flops: dq pass (2 matmuls + recompute s = 3) + dkv pass (4) over
    # the S x S score grid -> 7 * 2 * S^2 * D * H... count the 5 distinct
    # bk/bq-loop matmuls plus 2 score recomputes = 7 MXU passes of 2*S*S*D
    tflop = 7 * 2 * S * S * D * H / 1e12
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((1, H, S, D)), jnp.bfloat16)
    q, k, v, do = mk(), mk(), mk(), mk()

    results = {}
    for spec in args.configs.split(","):
        bq, bk = (int(x) for x in spec.split("x"))
        if S % bq or S % bk:
            print(f"skip {spec}: does not divide S={S}", flush=True)
            continue

        # forward once in its own program (the combined fwd+bwd program
        # crashed the remote compile helper); o/lse feed the timed bwd
        fwd_bk = fa._pick_block(S, fa.MAX_BLOCK_KV)
        fwd = jax.jit(lambda q, k, v: fa._flash_forward(
            q, k, v, scale, fa._pick_block(S, fa.MAX_BLOCK_Q), fwd_bk,
            split=fa._pick_split(fwd_bk)))
        o, lse = fwd(q, k, v)
        o.block_until_ready()

        def run(q, k, v, o, lse, do, n, bq=bq, bk=bk):
            def body(i, acc):
                doi = do * (jnp.float32(1.0) + i * jnp.float32(1e-8)
                            ).astype(do.dtype)
                dq, dk, dv = fa._flash_backward(q, k, v, o, lse, doi, scale,
                                                bq, bk)
                return (acc + dq.astype(jnp.float32).sum()
                        + dk.astype(jnp.float32).sum()
                        + dv.astype(jnp.float32).sum())

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        runj = functools.partial(jax.jit(run), q, k, v, o, lse)
        runj = lambda q_, k_, v_, do_, n, f=runj: f(do_, n)  # noqa: E731
        try:
            one, many = jnp.int32(1), jnp.int32(args.iters)
            float(np.asarray(runj(q, k, v, do, one)))
            per = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(runj(q, k, v, do, one)))
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(np.asarray(runj(q, k, v, do, many)))
                tN = time.perf_counter() - t0
                per.append((tN - t1) / (args.iters - 1))
            ms = float(np.median(per)) * 1e3
            results[spec] = {"ms": round(ms, 2),
                             "tflops": round(tflop / (ms / 1e3), 1)}
            print(spec, results[spec], flush=True)
        except Exception as e:  # noqa: BLE001 — record compile failures
            results[spec] = {"error": str(e)[:200]}
            print(spec, "FAILED", str(e)[:120], flush=True)

    print(json.dumps({"seq": S, "bwd_tflop_per_pass": round(tflop, 2),
                      "results": results}))


if __name__ == "__main__":
    main()
