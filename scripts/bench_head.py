"""Per-phase timing of the DPT head at the headline chunk shape (real TPU).

The dual heads cost 0.084 s of the 0.4645 s headline pass (89 TFLOP/s vs the
~150 TFLOP/s the same convs reach in isolation, scripts/bench_convs.py) —
this decomposes one head invocation at the bench's chunk shape (B=4 views @
512x384, hook tokens (4, 768, 1024)) into adapters / refinenet cascade /
regression trunk to find where the gap lives.

Timing protocol: chained fori_loop with a nonlinear sequential dependency
(max with a loop-carried scalar — see scripts/bench_convs.py for why a
linear perturbation gets simplified away), (tN - t1)/(N-1).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 8
H, W = 384, 512
B = 4  # bench.py head_chunk_views


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
    ap.add_argument("--probes",
                    default="full,adapters,refinenet,regression,regression_resize")
    args = ap.parse_args()
    probes = set(args.probes.split(","))

    import jax
    import jax.numpy as jnp

    from fast3r_tpu.models import dpt_head as dh
    from fast3r_tpu.nn.layers import conv2d
    from fast3r_tpu.ops.resize import resize_bilinear_align_corners

    cfg = dh.DPTHeadConfig(dim_tokens=(1024, 1024, 1024, 1024))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          dh.init_dpt_head(jax.random.key(0), cfg))
    nh, nw = H // cfg.patch_size, W // cfg.patch_size
    rng = np.random.default_rng(0)
    hooks = [jnp.asarray(rng.standard_normal((B, nh * nw, 1024)) * 0.4,
                         jnp.bfloat16) for _ in range(4)]

    results = {}

    if "full" in probes:
        def full(h0, h1, h2, h3, p):
            out = dh.dpt_head_forward(p, cfg, [h0, h1, h2, h3], (H, W))
            return out["pts3d"].astype(jnp.float32).sum()
        results["full"] = timed(full, *hooks, params)
        print("full", round(results["full"], 5), flush=True)

    # --- segment probes share the intermediate shapes of the real head ---
    def adapters(h0, h1, h2, h3, p):
        grids = [t.reshape(B, nh, nw, 1024) for t in (h0, h1, h2, h3)]
        from fast3r_tpu.nn.layers import conv_transpose2d
        l1 = conv_transpose2d(p["act1"]["up"],
                              conv2d(p["act1"]["proj"], grids[0],
                                     padding="VALID"), stride=4)
        l2 = conv_transpose2d(p["act2"]["up"],
                              conv2d(p["act2"]["proj"], grids[1],
                                     padding="VALID"), stride=2)
        l3 = conv2d(p["act3"]["proj"], grids[2], padding="VALID")
        l4 = conv2d(p["act4"]["down"],
                    conv2d(p["act4"]["proj"], grids[3], padding="VALID"),
                    stride=2, padding=[(1, 1), (1, 1)])
        layers = [l1, l2, l3, l4]
        layers = [conv2d(p["layer_rn"][i], layers[i], padding=[(1, 1), (1, 1)])
                  for i in range(4)]
        return sum(l.astype(jnp.float32).sum() for l in layers)

    if "adapters" in probes:
        results["adapters"] = timed(adapters, *hooks, params)
        print("adapters", round(results["adapters"], 5), flush=True)

    # refinenet cascade on pre-built layer tensors
    fd = cfg.feature_dim
    layer_shapes = [(B, 4 * nh, 4 * nw, fd), (B, 2 * nh, 2 * nw, fd),
                    (B, nh, nw, fd), (B, (nh + 1) // 2, (nw + 1) // 2, fd)]
    layer_in = [jnp.asarray(rng.standard_normal(s) * 0.4, jnp.bfloat16)
                for s in layer_shapes]

    def refinenet(l1, l2, l3, l4, p):
        rn = p["refinenet"]
        path4 = dh._fusion_block(rn[3], l4)
        path4 = path4[:, : l3.shape[1], : l3.shape[2], :]
        path3 = dh._fusion_block(rn[2], path4, l3)
        path2 = dh._fusion_block(rn[1], path3, l2)
        path1 = dh._fusion_block(rn[0], path2, l1)
        return path1.astype(jnp.float32).sum()

    if "refinenet" in probes:
        results["refinenet"] = timed(refinenet, *layer_in, params)
        print("refinenet", round(results["refinenet"], 5), flush=True)

    path1_in = jnp.asarray(
        rng.standard_normal((B, H // 2, W // 2, fd)) * 0.4, jnp.bfloat16)

    def regression(x, p):
        x = conv2d(p["head"]["conv1"], x, padding=[(1, 1), (1, 1)])
        x = resize_bilinear_align_corners(x, H, W)
        x = conv2d(p["head"]["conv2"], x, padding=[(1, 1), (1, 1)])
        x = jax.nn.relu(x)
        x = conv2d(p["head"]["conv3"], x, padding="VALID")
        return x.astype(jnp.float32).sum()

    def regression_resize(x, p):
        # resize alone (the conv1->resize->conv2 ordering doubles conv2's
        # pixel count; this isolates the resize's own cost)
        return resize_bilinear_align_corners(x, H, W).astype(jnp.float32).sum()

    def regression_resize_matmul(x, p):
        from fast3r_tpu.ops.resize import _resize_matmul
        return _resize_matmul(x, H, W).astype(jnp.float32).sum()

    def regression_fused(x, p):
        # the fused trunk kernel (ops/trunk_kernel.py) + the outside conv3
        from fast3r_tpu.ops.trunk_kernel import fused_regression_trunk

        hp = p["head"]
        y = fused_regression_trunk(
            x, hp["conv1"]["w"], hp["conv1"]["b"],
            hp["conv2"]["w"], hp["conv2"]["b"], H, W)
        y = conv2d(hp["conv3"], y, padding="VALID")
        return y.astype(jnp.float32).sum()

    def regression_head(x, p):
        # the SHIPPED road: conv3 folded into the kernel + the swapaxes/bias
        # layout-restore epilogue (fused_regression_head)
        from fast3r_tpu.ops.trunk_kernel import fused_regression_head

        hp = p["head"]
        y = fused_regression_head(
            x, hp["conv1"]["w"], hp["conv1"]["b"],
            hp["conv2"]["w"], hp["conv2"]["b"],
            hp["conv3"]["w"], hp["conv3"]["b"], H, W)
        return y.astype(jnp.float32).sum()

    def regression_head_raw(x, p):
        # kernel only, conv3 folded, NO epilogue (consumes the transposed
        # (B, OUT3, H*W) map directly) — regression_head minus this isolates
        # the swapaxes relayout + bias cost
        from fast3r_tpu.ops.trunk_kernel import _trunk_call

        hp = p["head"]
        y = _trunk_call(x, hp["conv1"]["w"], hp["conv1"]["b"],
                        hp["conv2"]["w"], hp["conv2"]["b"], H, W,
                        w3=hp["conv3"]["w"])
        return y.astype(jnp.float32).sum()

    # trunk-kernel stage ablations (outputs WRONG by design; timing only):
    # full - trunk_<stage> isolates that stage's cost inside the fused kernel
    for abl in ("noconv1", "now", "noh", "noconv2", "dmaonly"):
        key = f"trunk_{abl}"
        if key not in probes:
            continue
        from fast3r_tpu.ops.trunk_kernel import _trunk_call

        def trunk_abl(x, p, _abl=abl):
            hp = p["head"]
            y = _trunk_call(x, hp["conv1"]["w"], hp["conv1"]["b"],
                            hp["conv2"]["w"], hp["conv2"]["b"], H, W,
                            ablate=_abl)
            return y.astype(jnp.float32).sum()

        results[key] = timed(trunk_abl, path1_in, params)
        print(key, round(results[key], 5), flush=True)

    if "regression" in probes:
        results["regression"] = timed(regression, path1_in, params)
        print("regression", round(results["regression"], 5), flush=True)
    if "regression_fused" in probes:
        results["regression_fused"] = timed(regression_fused, path1_in,
                                            params)
        print("regression_fused", round(results["regression_fused"], 5),
              flush=True)
    if "regression_head" in probes:
        results["regression_head"] = timed(regression_head, path1_in, params)
        print("regression_head", round(results["regression_head"], 5),
              flush=True)
    if "regression_head_raw" in probes:
        results["regression_head_raw"] = timed(regression_head_raw,
                                               path1_in, params)
        print("regression_head_raw", round(results["regression_head_raw"], 5),
              flush=True)
    if "regression_resize" in probes:
        results["regression_resize"] = timed(regression_resize, path1_in, params)
        print("regression_resize", round(results["regression_resize"], 5),
              flush=True)
    if "regression_resize_matmul" in probes:
        results["regression_resize_matmul"] = timed(
            regression_resize_matmul, path1_in, params)
        print("regression_resize_matmul",
              round(results["regression_resize_matmul"], 5), flush=True)

    # batched-b dot variants: broadcasting the interp matrix over b makes b a
    # dot BATCH dim, so outputs come out (b, ...)-leading with no minor-dim
    # transpose; the one middle transpose lands on the small intermediate
    # when the w pass runs first.
    from fast3r_tpu.ops.resize import _interp_matrix

    def rs_wfirst_batched(x, p):
        b, h, w, c = x.shape
        Mw = jnp.asarray(_interp_matrix(W, w), x.dtype)
        Mh = jnp.asarray(_interp_matrix(H, h), x.dtype)
        y = jax.lax.dot_general(jnp.broadcast_to(Mw, (b, W, w)), x,
                                (((2,), (2,)), ((0,), (0,))))  # (b, W, h, c)
        y = y.transpose(0, 2, 1, 3)                            # (b, h, W, c)
        z = jax.lax.dot_general(jnp.broadcast_to(Mh, (b, H, h)),
                                y.reshape(b, h, W * c),
                                (((2,), (1,)), ((0,), (0,))))  # (b, H, W*c)
        return z.reshape(b, H, W, c).astype(jnp.float32).sum()

    def rs_hfirst_batched(x, p):
        b, h, w, c = x.shape
        Mw = jnp.asarray(_interp_matrix(W, w), x.dtype)
        Mh = jnp.asarray(_interp_matrix(H, h), x.dtype)
        y = jax.lax.dot_general(jnp.broadcast_to(Mh, (b, H, h)),
                                x.reshape(b, h, w * c),
                                (((2,), (1,)), ((0,), (0,))))  # (b, H, w*c)
        y = y.reshape(b, H, w, c)
        z = jax.lax.dot_general(jnp.broadcast_to(Mw, (b, W, w)), y,
                                (((2,), (2,)), ((0,), (0,))))  # (b, W, H, c)
        return z.transpose(0, 2, 1, 3).astype(jnp.float32).sum()

    for key, f in (("rs_wfirst_batched", rs_wfirst_batched),
                   ("rs_hfirst_batched", rs_hfirst_batched)):
        if key in probes:
            results[key] = timed(f, path1_in, params)
            print(key, round(results[key], 5), flush=True)

    # pallas resize-kernel decomposition (WRONG NUMERICS, cost attribution):
    # dmaonly = in tile copied out; noW = H matmul then duplicate; full =
    # production kernel (ops/resize_kernel.py)
    def _mk_rs_diag(do_h, do_w):
        import functools as ft

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        from fast3r_tpu.ops import resize_kernel as rk

        def kern(starts_smem, x_hbm, mh_hbm, o_hbm, in_vmem, y_vmem, o_vmem,
                 mh_vmem, in_sem, out_sem, mh_sem,
                 *, nb, nrb, rb, rin, w, c, p_taps, dtype):
            nu = nb * nrb
            mh_dma = pltpu.make_async_copy(mh_hbm, mh_vmem, mh_sem)
            mh_dma.start()

            def in_dma(slot, u):
                bi = u // nrb
                rbi = jax.lax.rem(u, nrb)
                return pltpu.make_async_copy(
                    x_hbm.at[bi, pl.ds(starts_smem[rbi] * 8, rin)],
                    in_vmem.at[slot], in_sem.at[slot])

            def out_dma(u):
                return pltpu.make_async_copy(
                    o_vmem,
                    o_hbm.at[u // nrb, pl.ds(jax.lax.rem(u, nrb) * rb, rb)],
                    out_sem)

            for u in range(rk.NSLOTS - 1):
                in_dma(u % rk.NSLOTS, u).start()
            mh_dma.wait()

            def body(u, _):
                slot = jax.lax.rem(u, rk.NSLOTS)
                pre = u + rk.NSLOTS - 1

                @pl.when(pre < nu)
                def _prefetch():
                    in_dma(jax.lax.rem(pre, rk.NSLOTS), pre).start()

                in_dma(slot, u).wait()
                rbi = jax.lax.rem(u, nrb)
                mh = mh_vmem[rbi]
                if do_h:
                    cc = min(w * c, 8 * 1024)
                    for j in range(0, w * c, cc):
                        y_vmem[:, j:j + cc] = jax.lax.dot_general(
                            mh, in_vmem[slot, :, j:j + cc],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).astype(dtype)
                else:
                    y_vmem[:, :] = in_vmem[slot, :rb]

                @pl.when(u >= 1)
                def _reclaim():
                    out_dma(u - 1).wait()

                if do_w:
                    one = jnp.asarray(1.0, dtype)
                    for p, (lw, hw, f) in enumerate(p_taps):
                        ylo = y_vmem[:, lw * c:(lw + 1) * c]
                        if f == 0.0 or hw == lw:
                            o_vmem[:, p * c:(p + 1) * c] = ylo
                        else:
                            yhi = y_vmem[:, hw * c:(hw + 1) * c]
                            fb = jnp.asarray(f, dtype)
                            o_vmem[:, p * c:(p + 1) * c] = \
                                ylo * (one - fb) + yhi * fb
                else:
                    o_vmem[:, :w * c] = y_vmem[...]
                    o_vmem[:, w * c:] = y_vmem[...]
                out_dma(u).start()
                return 0

            jax.lax.fori_loop(0, nu, body, 0)
            out_dma(nu - 1).wait()

        def run(x, out_h, out_w):
            B, h, w_, c = x.shape
            wc, pc = w_ * c, out_w * c
            rb = rk._pick_rb(h, out_h, wc, pc, x.dtype.itemsize)
            starts, mats, rin = rk._row_plan(h, out_h, rb)
            nrb = out_h // rb
            from fast3r_tpu.ops.resize import _interp_taps
            lo_w, hi_w, frac_w = _interp_taps(out_w, w_)
            p_taps = tuple((int(lo_w[p]), int(hi_w[p]), float(frac_w[p]))
                           for p in range(out_w))
            out = pl.pallas_call(
                ft.partial(kern, nb=B, nrb=nrb, rb=rb, rin=rin, w=w_, c=c,
                           p_taps=p_taps, dtype=x.dtype),
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
                    pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                    pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                out_shape=jax.ShapeDtypeStruct((B, out_h, pc), x.dtype),
                scratch_shapes=[
                    pltpu.VMEM((rk.NSLOTS, rin, wc), x.dtype),
                    pltpu.VMEM((rb, wc), x.dtype),
                    pltpu.VMEM((rb, pc), x.dtype),
                    pltpu.VMEM((nrb, rb, rin), x.dtype),
                    pltpu.SemaphoreType.DMA((rk.NSLOTS,)),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=rk.VMEM_LIMIT,
                ),
            )(jnp.asarray(starts // 8), x.reshape(B, h, wc),
              jnp.asarray(mats, x.dtype))
            return out.reshape(B, out_h, out_w, c)

        return run

    rs_diags = {
        "rsk_dmaonly": _mk_rs_diag(False, False),
        "rsk_noW": _mk_rs_diag(True, False),
        "rsk_noH": _mk_rs_diag(False, True),
    }
    for key, f in rs_diags.items():
        if key not in probes:
            continue
        g = lambda x, p, f=f: f(x, H, W).astype(jnp.float32).sum()
        results[key] = timed(g, path1_in, params)
        print(key, round(results[key], 5), flush=True)

    print(json.dumps({k: round(v, 5) for k, v in results.items()}))


if __name__ == "__main__":
    main()
