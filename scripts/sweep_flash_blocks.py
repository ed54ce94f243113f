"""Sweep flash-attention forward block sizes on the real TPU.

Context (round 2): the re-measured bf16 matmul roof is ~190 TFLOP/s
(scripts/bench_roof.py), so the D=64 attention speed-of-light is ~95 TFLOP/s
(the QK^T/PV contractions use half the 128-wide MXU); the r1 blocks
(bq=512, bk=1536) reach 58-69 — this sweep hunts the remaining gap.

Each (bq, bk) is a separate compiled program (minutes each on the tunneled
platform), so the config list is deliberately short.

  python scripts/sweep_flash_blocks.py [--seq 15360] [--configs 512x1536,...]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_CONFIGS = "512x1536,1024x1536,1024x3072,2048x1536,1536x2048"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=15360)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--head-dim", type=int, default=64)
    ap.add_argument("--configs", default=DEFAULT_CONFIGS)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--split", type=int, default=1,
                    help="partial-softmax sub-blocks per kv block "
                         "(per-config override: 1024x15360@8)")
    ap.add_argument("--vmem-mb", type=int, default=None,
                    help="raise the kernel's scoped-VMEM limit (resident-KV "
                         "configs with bk=S need ~32-64 MB; v5e has 128)")
    ap.add_argument("--no-lse", action="store_true",
                    help="measure the primal (want_lse=False) path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fast3r_tpu.ops.flash_attention import _flash_forward

    S, H, D = args.seq, args.heads, args.head_dim
    scale = D ** -0.5
    tflop = 4 * S * S * D * H / 1e12
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, H, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, H, S, D)), jnp.bfloat16)

    results = {}
    for spec in args.configs.split(","):
        spec, _, sp = spec.partition("@")
        split = int(sp) if sp else args.split
        bq, bk = (int(x) for x in spec.split("x"))
        spec = f"{spec}@{split}"
        if S % bq or S % bk:
            print(f"skip {spec}: does not divide S={S}", flush=True)
            continue

        def run(q, k, v, n, bq=bq, bk=bk, split=split):
            def body(i, acc):
                qi = q * (jnp.float32(1.0) + i * jnp.float32(1e-8)).astype(q.dtype)
                o, _ = _flash_forward(qi, k, v, scale, bq, bk,
                                      split=split,
                                      want_lse=not args.no_lse,
                                      vmem_limit_mb=args.vmem_mb)
                return acc + o.astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        run = jax.jit(run, static_argnames=())
        try:
            one, many = jnp.int32(1), jnp.int32(args.iters)
            float(np.asarray(run(q, k, v, one)))
            per = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(run(q, k, v, one)))
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(np.asarray(run(q, k, v, many)))
                tN = time.perf_counter() - t0
                per.append((tN - t1) / (args.iters - 1))
            med = float(np.median(per))
            results[spec] = {"ms": round(med * 1e3, 2),
                             "tflops": round(tflop / med, 1)}
            print(spec, results[spec], flush=True)
        except Exception as e:  # compile failure (VMEM) — report and move on
            results[spec] = {"error": str(e)[:200]}
            print(spec, "FAILED", str(e)[:200], flush=True)

    print(json.dumps({"seq": S, "tflop_per_pass": round(tflop, 2),
                      "results": results}))


if __name__ == "__main__":
    main()
