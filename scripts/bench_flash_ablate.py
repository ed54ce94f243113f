"""Flash-forward stage attribution at the decoder shape (real TPU).

The fusion decoder's attention is 23.19 of the 50.45 TFLOP headline pass and
the flash kernel runs it at 90.5 TFLOP/s.  r4 RESOLUTION: the "~95 TFLOP/s
D=64 speed-of-light" is in fact the kernel's true ceiling — PV contracts
full-depth over the kv block BUT its ones-extended output is one 128-lane
MXU tile, so PV costs the same MXU time as the half-depth QK (the
4/(2/95 + 2/190) ~ 127 figure double-counts PV's idle-lane flops as free).
Measured here: nosoftmax (matmuls only) = 10.27 ms = the 2-matmul floor
exactly; full = 10.54 ms -> softmax/max ~97% hidden.  These probes measure
how much of the gap to that ceiling is exposed VPU time vs matmul floor:

  full       the production kernel
  nomax      local max pinned to 0 (removes the cross-lane max-reduce)
  nosoftmax  nomax + p = raw scores cast (removes exp2 too: matmuls+merges)
  nopv       PV matmul replaced by a zero fill (QK + softmax only)

Timing: chained fori_loop with a sequential dependency, (tN-t1)/(N-1),
median of 3 (the bench_convs.py protocol).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 12


def timed(fn, *args, iters=ITERS):
    import jax
    import jax.numpy as jnp

    def run_n(args, n):
        x = args[0]

        def body(i, acc):
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
    ap.add_argument("--s", type=int, default=15360)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--bq", type=int, default=1024)
    ap.add_argument("--bk", type=int, default=3840)
    ap.add_argument("--split", type=int, default=2)
    ap.add_argument("--kt", action="store_true",
                    help="pre-transposed K layout (B,H,D,S); the transpose "
                         "runs outside the timed region — it replaces the "
                         "production wrapper's BNHD->BHSD relayout of k")
    ap.add_argument("--probes", default="full,nomax,nosoftmax,nopv")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fast3r_tpu.ops.flash_attention import _flash_forward

    B, H, S, D = 1, args.heads, args.s, 64
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.3,
                           jnp.bfloat16) for _ in range(3))
    scale = D ** -0.5
    tflop = 4 * B * H * S * S * D / 1e12
    if args.kt:
        k = jnp.swapaxes(k, 2, 3)  # (B, H, D, S)

    results = {}
    for probe in args.probes.split(","):
        abl = "" if probe == "full" else probe

        def fn(q_, k_, v_, _abl=abl):
            o, _ = _flash_forward(q_, k_, v_, scale, args.bq, args.bk,
                                  split=args.split, want_lse=False,
                                  kt=args.kt, ablate=_abl)
            return o

        t = timed(fn, q, k, v)
        results[probe] = t
        print(f"{probe:10s} {t*1e3:8.3f} ms  {tflop/t:6.1f} TFLOP/s-equiv",
              flush=True)

    print(json.dumps({k: round(v, 6) for k, v in results.items()}))


if __name__ == "__main__":
    main()
