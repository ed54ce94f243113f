"""Microbench: QK^T dot_general variants inside one pallas program (real TPU).

The flash kernel's QK is dot_general(q (bq,64), k (bk,64)) contracting BOTH
minor dims — Mosaic must transpose every k tile to feed the MXU (contraction
wants the RHS's SUBLANE dim).  If that transpose is the hidden ~2.2 ms/layer
in the flash forward (scripts/bench_flash_ablate.py found full==nosoftmax
but nopv >> QK@95), storing K as (D, S) kills it for free (the wrapper
already relayouts k outside the kernel).

Variants (same flops, VMEM-resident, fori inside one program):
  kt_minor   dot(q, k (bk,64)) contracting (1,)x(1,)  — production today
  kt_major   dot(q, kT (64,bk)) contracting (1,)x(0,) — pre-transposed K
  pv_shape   dot(p (bq,bk), v (bk,128)) contracting (1,)x(0,) — PV reference
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bq", type=int, default=1024)
    ap.add_argument("--bk", type=int, default=1920)
    ap.add_argument("--inner", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bq, bk, d = args.bq, args.bk, 64
    inner = args.inner

    def make_kern(mode, inner):
        def kern(a_ref, b_ref, o_ref):
            def body(i, acc):
                # NONLINEAR loop-carried dependency: a linear perturbation
                # gets hoisted by the algebraic simplifier (s(c*a) = c*s(a),
                # the scripts/bench_convs.py pitfall — this probe's first
                # version measured negative time)
                a = jnp.maximum(a_ref[:],
                                (acc - jnp.float32(1e30)).astype(a_ref.dtype))
                if mode == "kt_minor":
                    s = jax.lax.dot_general(
                        a, b_ref[:], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                elif mode == "kt_major":
                    s = jax.lax.dot_general(
                        a, b_ref[:], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:  # pv_shape
                    s = jax.lax.dot_general(
                        a, b_ref[:], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                return acc + s[0, 0]
            o_ref[0, 0] = jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))
        return kern

    def run(mode, a_shape, b_shape, flops):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.standard_normal(a_shape) * 0.1, jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal(b_shape) * 0.1, jnp.bfloat16)

        def build(n):
            f = pl.pallas_call(
                make_kern(mode, n),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
                out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )
            return jax.jit(lambda a_, b_: f(a_, b_))

        f1, fN = build(1), build(inner)
        float(np.asarray(f1(a, b)))
        float(np.asarray(fN(a, b)))
        vals = []
        for _ in range(args.iters):
            t0 = time.perf_counter(); float(np.asarray(f1(a, b)))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); float(np.asarray(fN(a, b)))
            tN = time.perf_counter() - t0
            vals.append((tN - t1) / (inner - 1))
        t = float(np.median(vals))
        print(f"{mode:9s} {t*1e6:8.2f} us/dot  {flops/t/1e12:6.1f} TFLOP/s",
              flush=True)
        return t

    fl_qk = 2 * bq * bk * d
    run("kt_minor", (bq, d), (bk, d), fl_qk)
    run("kt_major", (bq, d), (d, bk), fl_qk)
    fl_pv = 2 * bq * bk * 128
    run("pv_shape", (bq, bk), (bk, 128), fl_pv)


if __name__ == "__main__":
    main()
