"""Encoder-attention shootout on the real TPU: XLA bf16-logits attention vs
the single-program manual-DMA batched kernel (ops/batched_attention.py).

Probes (chained fori_loop + checksum-fetch timing, see bench.py):
  1. bare attention op at the flagship encoder shape (20, 768, 16, 64) bf16
  2. full 24-block encoder-shaped ViT stack (fused blocks + rope) per impl
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, N, H, D = 20, 768, 16, 64
ITERS = 8


def timed(fn, params, x, iters=ITERS):
    import jax
    import jax.numpy as jnp

    def run_n(p, x, n):
        def body(i, acc):
            xi = x * (jnp.float32(1.0) + i * jnp.float32(1e-8)).astype(x.dtype)
            return acc + fn(p, xi)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    r1 = jax.jit(lambda p, x: run_n(p, x, 1))
    rN = jax.jit(lambda p, x: run_n(p, x, iters))
    float(np.asarray(r1(params, x)))
    float(np.asarray(rN(params, x)))
    t0 = time.perf_counter(); float(np.asarray(r1(params, x))); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(np.asarray(rN(params, x))); tN = time.perf_counter() - t0
    return (tN - t1) / (iters - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", default="op_xla,op_batched,stack_xla,"
                                        "stack_batched")
    args = ap.parse_args()
    probes = set(args.probes.split(","))

    import jax
    import jax.numpy as jnp

    from fast3r_tpu.nn.layers import run_vit_stack, init_vit_stack
    from fast3r_tpu.ops.attention import dot_product_attention
    from fast3r_tpu.ops.batched_attention import batched_attention
    from fast3r_tpu.ops.rope2d import rope2d_cos_sin

    results = {}
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((3, B, N, H, D)), jnp.bfloat16)
    scale = D ** -0.5

    impls = {
        "xla": lambda q, k, v, s: dot_product_attention(q, k, v, s, "xla"),
        "batched": batched_attention,
    }

    # diagnostic variants of the PACKED kernel (WRONG NUMERICS — cost
    # attribution only): aligned = every head reads lane slice [0:64]
    # (removes the 64-offset lane relayouts of odd heads); nosoftmax =
    # scores go straight to PV (removes the VPU max/exp2 passes);
    # dmaonly = q slab copied to out (DMA + loop floor).
    def _mk_diag(aligned=False, nosoftmax=False, dmaonly=False):
        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from fast3r_tpu.ops import batched_attention as ba

        def kern(q_hbm, k_hbm, v_hbm, o_hbm, qkv_vmem, o_vmem, vext_vmem,
                 in_sem, out_sem, *, nv, npg, g, n, d, scale):
            gd = g * d

            def in_dmas(slot, u):
                vi = u // npg
                lo = (u % npg) * gd
                return tuple(
                    pltpu.make_async_copy(
                        ref.at[vi, :, pl.ds(lo, gd)],
                        qkv_vmem.at[slot, i], in_sem.at[slot, i])
                    for i, ref in enumerate((q_hbm, k_hbm, v_hbm)))

            def out_dma(slot, u):
                vi = u // npg
                lo = (u % npg) * gd
                return pltpu.make_async_copy(
                    o_vmem.at[slot], o_hbm.at[vi, :, pl.ds(lo, gd)],
                    out_sem.at[slot])

            for u in range(ba.NSLOTS - 1):
                for dma in in_dmas(u % ba.NSLOTS, u):
                    dma.start()
            vext_vmem[:, d:] = jnp.ones((n, d), vext_vmem.dtype)
            sub = n // ba.SPLIT
            ng = nv * npg

            def body(u, _):
                slot = jax.lax.rem(u, ba.NSLOTS)
                pre = u + ba.NSLOTS - 1

                @pl.when(pre < ng)
                def _prefetch():
                    for dma in in_dmas(jax.lax.rem(pre, ba.NSLOTS), pre):
                        dma.start()

                for dma in in_dmas(slot, u):
                    dma.wait()

                @pl.when(u >= ba.NSLOTS)
                def _reclaim():
                    out_dma(slot, u - ba.NSLOTS).wait()

                if dmaonly:
                    o_vmem[slot] = qkv_vmem[slot, 0]
                else:
                    for gi in range(g):
                        sl = slice(0, d) if aligned \
                            else slice(gi * d, (gi + 1) * d)
                        q = qkv_vmem[slot, 0, :, sl]
                        vext_vmem[:, :d] = qkv_vmem[slot, 2, :, sl]
                        parts = []
                        for j in range(ba.SPLIT):
                            k = qkv_vmem[slot, 1, j * sub:(j + 1) * sub, sl]
                            s = jax.lax.dot_general(
                                q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            ) * (scale * ba.LOG2E)
                            if nosoftmax:
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
                        o_vmem[slot, :, gi * d:(gi + 1) * d] = (
                            acc[:, :d] / acc[:, d:d + 1]).astype(o_vmem.dtype)
                out_dma(slot, u).start()
                return 0

            jax.lax.fori_loop(0, ng, body, 0)
            for i in range(min(ba.NSLOTS, ng)):
                u = ng - 1 - i
                out_dma(u % ba.NSLOTS, u).wait()

        def run(q, k, v, s):
            Bq, Nq, Hq, Dq = q.shape
            g = ba._pick_pgroup(Hq, Nq, q.dtype.itemsize, Dq)
            npg = Hq // g
            qp, kp, vp = (t.reshape(Bq, Nq, Hq * Dq) for t in (q, k, v))
            out = pl.pallas_call(
                functools.partial(kern, nv=Bq, npg=npg, g=g, n=Nq, d=Dq,
                                  scale=float(s)),
                grid=(1,),
                in_specs=[pl.BlockSpec(
                    memory_space=pltpu.MemorySpace.HBM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                out_shape=jax.ShapeDtypeStruct((Bq, Nq, Hq * Dq), q.dtype),
                scratch_shapes=[
                    pltpu.VMEM((ba.NSLOTS, 3, Nq, g * Dq), q.dtype),
                    pltpu.VMEM((ba.NSLOTS, Nq, g * Dq), q.dtype),
                    pltpu.VMEM((Nq, 2 * Dq), q.dtype),
                    pltpu.SemaphoreType.DMA((ba.NSLOTS, 3)),
                    pltpu.SemaphoreType.DMA((ba.NSLOTS,)),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(qp, kp, vp)
            return out.reshape(Bq, Nq, Hq, Dq)

        return run

    impls.update({
        "packed_aligned": _mk_diag(aligned=True),
        "packed_nosoftmax": _mk_diag(nosoftmax=True),
        "packed_dmaonly": _mk_diag(dmaonly=True),
    })

    # slot-ring depth sweep on the production packed kernel: diagnostics
    # show ~10 us/unit of unhidden DMA wait at NSLOTS=2 (op_packed_dmaonly
    # 0.56 ms vs the 0.154 ms bandwidth floor); deeper rings trade VMEM for
    # prefetch distance.  Monkeypatched constants are restored after tracing.
    def _mk_depth(nslots, budget):
        from fast3r_tpu.ops import batched_attention as ba

        def run(q, k, v, s):
            old = ba.NSLOTS, ba.VMEM_BUDGET
            ba.NSLOTS, ba.VMEM_BUDGET = nslots, budget
            try:
                return ba._packed_bnhd(q, k, v, float(s))
            finally:
                ba.NSLOTS, ba.VMEM_BUDGET = old
        return run

    impls.update({
        "packed_ns3": _mk_depth(3, 14 * 1024 * 1024),
        "packed_ns4g4": _mk_depth(4, 11 * 1024 * 1024),
    })

    for name, impl in impls.items():
        key = f"op_{name}"
        if key not in probes:
            continue

        def op(p, x, impl=impl):
            return impl(x[0], x[1], x[2], scale).astype(jnp.float32).sum()

        results[key] = timed(op, jnp.zeros((1,), jnp.bfloat16), qkv)
        print(key, round(results[key], 5), flush=True)

    if "op_fusedqkv" in probes:
        # single-DMA variant: one (3, B, N, C) array, one strided copy/unit
        from fast3r_tpu.ops.batched_attention import packed_qkv_attention

        qkv3 = qkv.reshape(3, B, N, H * D)

        def op_fq(p, x):
            return packed_qkv_attention(x, H, scale).astype(
                jnp.float32).sum()

        results["op_fusedqkv"] = timed(op_fq, jnp.zeros((1,), jnp.bfloat16),
                                       qkv3)
        print("op_fusedqkv", round(results["op_fusedqkv"], 5), flush=True)

    # full encoder-shaped stack: 24 fused blocks + rope, per attention impl
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        init_vit_stack(jax.random.key(0), 24, 1024, H))
    x0 = jnp.asarray(rng.standard_normal((B, N, 1024)), jnp.bfloat16)
    hgrid, wgrid = 24, 32  # 384x512 / 16
    pos = jnp.stack(jnp.meshgrid(
        jnp.arange(hgrid), jnp.arange(wgrid), indexing="ij"),
        -1).reshape(-1, 2).astype(jnp.int32)
    pos = jnp.broadcast_to(pos[None], (B, N, 2))
    cos, sin = rope2d_cos_sin(pos, D, 100.0)

    stack_impls = dict(impls)
    # the string dispatch takes the fused qkv+rope single-DMA road when
    # viable (run_vit_stack expands the lane tables); the `batched` callable
    # entry above keeps exercising the 3-DMA packed kernel for A/B
    stack_impls["qkv1dma"] = "batched"
    for name, impl in stack_impls.items():
        key = f"stack_{name}"
        if key not in probes:
            continue

        def stack(p, x, impl=impl):
            y, _ = run_vit_stack(p, x, H, scale, rope_cos_sin=(cos, sin),
                                 attn_impl=impl, depth=24, fused=True)
            return y.astype(jnp.float32).sum()

        results[key] = timed(stack, params, x0, iters=4)
        print(key, round(results[key], 4), flush=True)

    print(json.dumps({k: round(v, 5) for k, v in results.items()}))


if __name__ == "__main__":
    main()
