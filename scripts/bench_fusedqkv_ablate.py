"""Stage attribution for the view-grouped fused-qkv encoder-attention kernel
(ops/batched_attention.py _fusedqkv_kernel) at the flagship shape
(20, 768, 16, 64) bf16, gv=5 ns=4.

r4 context: view-grouping cut the unit count 80 -> 16 (one strided
(3, gv, N, g*d) DMA per unit) and the op from 0.990 -> 0.936 ms same-run,
but that is still ~55% of the 0.51 ms pure-MXU floor.  These probes (WRONG
NUMERICS — cost attribution only) split the residual:

  full        the production kernel
  nosoftmax   scores go straight to PV (removes VPU max/exp2/merge passes)
  dmaonly     q slab copied to out (DMA + loop floor; no compute)

    python scripts/bench_fusedqkv_ablate.py [--probes full,nosoftmax,dmaonly]
        [--gv 5] [--ns 4]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, N, H, D = 20, 768, 16, 64
ITERS = 64


def timed(fn, x, iters=ITERS):
    import jax
    import jax.numpy as jnp

    def run_n(x, n):
        def body(i, acc):
            xi = x * (jnp.float32(1.0) + i * jnp.float32(1e-8)).astype(x.dtype)
            return acc + fn(xi).astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    r1 = jax.jit(lambda x: run_n(x, 1))
    rN = jax.jit(lambda x: run_n(x, iters))
    float(np.asarray(r1(x)))
    float(np.asarray(rN(x)))
    vals = []
    for _ in range(5):
        t0 = time.perf_counter(); float(np.asarray(r1(x))); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(rN(x))); tN = time.perf_counter() - t0
        vals.append((tN - t1) / (iters - 1))
    return float(np.median(vals))


def make_ablated(gv: int, ns: int, ablate: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fast3r_tpu.ops import batched_attention as ba

    def kern(qkv_hbm, o_hbm, qkv_vmem, o_vmem, vext_vmem, in_sem, out_sem,
             *, nv, npg, g, n, d, scale):
        gd = g * d
        nvg = nv // gv

        def in_dma(slot, u):
            vi = (u // npg) * gv
            lo = (u % npg) * gd
            return pltpu.make_async_copy(
                qkv_hbm.at[:, pl.ds(vi, gv), :, pl.ds(lo, gd)],
                qkv_vmem.at[slot], in_sem.at[slot])

        def out_dma(slot, u):
            vi = (u // npg) * gv
            lo = (u % npg) * gd
            return pltpu.make_async_copy(
                o_vmem.at[slot], o_hbm.at[pl.ds(vi, gv), :, pl.ds(lo, gd)],
                out_sem.at[slot])

        ng = nvg * npg
        for u in range(min(ns - 1, ng)):
            in_dma(u % ns, u).start()
        vext_vmem[:, d:] = jnp.ones((n, d), vext_vmem.dtype)
        sub = n // ba.SPLIT

        def body(u, _):
            slot = jax.lax.rem(u, ns)
            pre = u + ns - 1

            @pl.when(pre < ng)
            def _prefetch():
                in_dma(jax.lax.rem(pre, ns), pre).start()

            in_dma(slot, u).wait()

            @pl.when(u >= ns)
            def _reclaim():
                out_dma(slot, u - ns).wait()

            if ablate == "dmaonly":
                for vi in range(gv):
                    o_vmem[slot, vi] = qkv_vmem[slot, 0, vi]
            else:
                for vi in range(gv):
                    for gi in range(g):
                        sl = slice(gi * d, (gi + 1) * d)
                        q = qkv_vmem[slot, 0, vi, :, sl]
                        vext_vmem[:, :d] = qkv_vmem[slot, 2, vi, :, sl]
                        parts = []
                        for j in range(ba.SPLIT):
                            k = qkv_vmem[slot, 1, vi,
                                         j * sub:(j + 1) * sub, sl]
                            s = jax.lax.dot_general(
                                q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            ) * (scale * ba.LOG2E)
                            if ablate == "nosoftmax":
                                m_j = jnp.zeros((n, 1), jnp.float32)
                                p = s.astype(vext_vmem.dtype)
                            else:
                                m_j = jnp.max(s, axis=-1, keepdims=True)
                                p = jnp.exp2(s - m_j).astype(vext_vmem.dtype)
                            acc_j = jax.lax.dot_general(
                                p, vext_vmem[j * sub:(j + 1) * sub],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                            parts.append((m_j, acc_j))
                        m = parts[0][0]
                        for m_j, _ in parts[1:]:
                            m = jnp.maximum(m, m_j)
                        acc = parts[0][1] * jnp.exp2(parts[0][0] - m)
                        for m_j, acc_j in parts[1:]:
                            acc = acc + acc_j * jnp.exp2(m_j - m)
                        o_vmem[slot, vi, :, gi * d:(gi + 1) * d] = (
                            acc[:, :d] / acc[:, d:d + 1]).astype(o_vmem.dtype)
            out_dma(slot, u).start()
            return 0

        jax.lax.fori_loop(0, ng, body, 0)
        for i in range(min(ns, ng)):
            u = ng - 1 - i
            out_dma(u % ns, u).wait()

    def run(qkv3):
        _, Bq, Nq, C = qkv3.shape
        Dq = D
        Hq = C // Dq
        g = ba._pick_pgroup(Hq, Nq, qkv3.dtype.itemsize, Dq)
        npg = Hq // g
        scale = Dq ** -0.5
        return pl.pallas_call(
            functools.partial(kern, nv=Bq, npg=npg, g=g, n=Nq, d=Dq,
                              scale=float(scale)),
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            out_shape=jax.ShapeDtypeStruct((Bq, Nq, C), qkv3.dtype),
            scratch_shapes=[
                pltpu.VMEM((ns, 3, gv, Nq, g * Dq), qkv3.dtype),
                pltpu.VMEM((ns, gv, Nq, g * Dq), qkv3.dtype),
                pltpu.VMEM((Nq, 2 * Dq), qkv3.dtype),
                pltpu.SemaphoreType.DMA((ns,)),
                pltpu.SemaphoreType.DMA((ns,)),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(qkv3)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", default="full,nosoftmax,dmaonly")
    ap.add_argument("--gv", type=int, default=5)
    ap.add_argument("--ns", type=int, default=4)
    args = ap.parse_args()

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    qkv3 = jnp.asarray(rng.standard_normal((3, B, N, H * D)), jnp.bfloat16)

    results = {}
    for probe in args.probes.split(","):
        fn = make_ablated(args.gv, args.ns, "" if probe == "full" else probe)
        t = timed(fn, qkv3)
        results[probe] = round(t * 1000, 4)
        print(probe, results[probe], "ms", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
