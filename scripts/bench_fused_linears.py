"""Fused-linear (ln_matmul) rate vs the XLA matmul roof (real TPU).

The encoder/decoder non-attention time rides the fused-block kernels
(nn/fused_block.py): weights resident in VMEM, token tiles streamed.  The
row-tile size bm is capped by VMEM_BUDGET (12 MB -> bm=128 at the fc1
shape); an isolated XLA matmul of the same shape hits 186-191 TFLOP/s
(scripts/bench_roof.py).  This probe measures the fused kernel's actual
rate per bm so the budget can be set from data instead of caution:

  python scripts/bench_fused_linears.py --shape fc1 --bms 128,256,512 --vmem 100

Timing: chained fori_loop, nonlinear loop dependency, (tN-t1)/(N-1),
median of 3 (bench_convs.py protocol).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 24

SHAPES = {
    "fc1": (15360, 1024, 4096),
    "fc2": (15360, 4096, 1024),
    "qkv": (15360, 1024, 3072),
    "proj": (15360, 1024, 1024),
}


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
    ap.add_argument("--shape", default="fc1")
    ap.add_argument("--bms", default="128,256,512")
    ap.add_argument("--vmem", type=int, default=100)
    ap.add_argument("--act", default="gelu",
                    help="comma list: none,gelu,gelu_logw,gelu_recip,gelu_sig")
    ap.add_argument("--xla", action="store_true", help="also time LN+matmul in XLA")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fast3r_tpu.nn import fused_block as fb

    m, k, n = SHAPES[args.shape]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)) * 0.3, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.bfloat16)
    gamma = jnp.ones((k,), jnp.bfloat16)
    beta = jnp.zeros((k,), jnp.bfloat16)
    bias = jnp.zeros((n,), jnp.bfloat16)
    tflop = 2.0 * m * k * n / 1e12

    for act_name in args.act.split(","):
        act = None if act_name == "none" else act_name

        if args.xla:
            def xla_ln_mm(x_, w_, g_, b_, bb_):
                y = fb._ln_f32(x_, g_, b_, 1e-6).astype(x_.dtype)
                out = (y @ w_).astype(jnp.float32) + bb_.astype(jnp.float32)
                if act == "gelu":
                    out = jax.nn.gelu(out, approximate=False)
                return out.astype(x_.dtype)

            t = timed(xla_ln_mm, x, w, gamma, beta, bias)
            print(f"xla_ln_mm      {t*1e3:8.3f} ms  {tflop/t:6.1f} TFLOP/s",
                  flush=True)

        for bm in (int(b) for b in args.bms.split(",")):
            if m % bm:
                continue

            def fn(x_, g_, b_, w_, bb_, _bm=bm, _act=act):
                return fb._ln_matmul_call(x_, g_, b_, w_, bb_, 1e-6, _act,
                                          _bm, vmem_limit_mb=args.vmem)

            t = timed(fn, x, gamma, beta, w, bias)
            print(f"ln_matmul act={act_name:10s} bm={bm:4d} {t*1e3:8.3f} ms  "
                  f"{tflop/t:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
