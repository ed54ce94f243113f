"""Current-build phase attribution: encoder / decoder / heads AS COMPOSED.

Times the exact submodules fast3r_forward chains at the headline shape
(flagship, 20 views @ 512x384 bf16), each with the chained fori_loop +
checksum-fetch protocol (bench.py notes).  Unlike profile_encoder.py's
impl-override probes, these run the shipped configuration (fused blocks,
packed encoder attention, flash decoder), so the numbers decompose the
measured headline.

    python scripts/bench_phases.py [--probes encoder,decoder,heads,forward]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V, H, W = 20, 384, 512
ITERS = 5


def timed(fn, *args, iters=ITERS, repeats=3):
    import jax
    import jax.numpy as jnp

    def run_n(n, *a):
        x = a[-1]

        def body(i, acc):
            xi = x * (jnp.float32(1.0) + i * jnp.float32(1e-8)).astype(x.dtype)
            return acc + jnp.sum(fn(*a[:-1], xi).astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    r1 = jax.jit(lambda *a: run_n(1, *a))
    rN = jax.jit(lambda *a: run_n(iters, *a))
    float(np.asarray(r1(*args)))
    float(np.asarray(rN(*args)))
    vals = []
    for _ in range(repeats):
        t0 = time.perf_counter(); float(np.asarray(r1(*args))); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(np.asarray(rN(*args))); tN = time.perf_counter() - t0
        vals.append((tN - t1) / (iters - 1))
    return float(np.median(vals))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", default="encoder,decoder,heads,forward")
    ap.add_argument("--head-chunk", type=int, default=4)
    args = ap.parse_args()
    probes = set(args.probes.split(","))

    import jax
    import jax.numpy as jnp

    from fast3r_tpu.models.fast3r import (
        Fast3RConfig, fast3r_forward, init_fast3r,
    )
    from fast3r_tpu.models.encoder import encoder_forward
    from fast3r_tpu.models.decoder import decoder_forward
    from fast3r_tpu.models.dpt_head import dpt_head_forward

    cfg = Fast3RConfig.flagship()
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_fast3r(jax.random.key(0), cfg))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((1, V, H, W, 3)) * 0.5,
                       jnp.bfloat16)
    P = (H // 16) * (W // 16)
    S = V * P
    fused = jnp.asarray(rng.standard_normal((1, S, 1024)) * 0.4, jnp.bfloat16)
    ids = jnp.repeat(jnp.arange(V, dtype=jnp.int32), P)[None]
    out = {}

    if "encoder" in probes:
        def enc(p, x):
            f, _ = encoder_forward(p["encoder"], cfg.encoder,
                                   x.reshape(V, H, W, 3))
            return f
        out["encoder"] = timed(enc, params, imgs)
        print("encoder", round(out["encoder"], 4), flush=True)

    if "decoder" in probes:
        def dec(p, ids_, f):
            outs = decoder_forward(p["decoder"], cfg.decoder, f, ids_)
            return outs[cfg.decoder.depth]
        out["decoder"] = timed(dec, params, ids, fused)
        print("decoder", round(out["decoder"], 4), flush=True)

    if "heads" in probes:
        # the real head path: 2 heads x V/chunk chunked invocations on the
        # 4 hook tensors (mirror fast3r_forward's _run_head_oriented at the
        # all-landscape fast path)
        cv = args.head_chunk
        hooks = [jnp.asarray(rng.standard_normal((1, S, 1024)) * 0.4,
                             jnp.bfloat16) for _ in range(4)]

        def heads(p, h0, h1, h2, h3):
            hs = [h0, h1, h2, h3]
            acc = jnp.float32(0.0)
            for start in range(0, V, cv):
                toks = [t[0, start * P:(start + cv) * P].reshape(cv, P, -1)
                        for t in hs]
                for head in ("head_global", "head_local"):
                    o = dpt_head_forward(p[head], cfg.head, toks, (H, W))
                    acc += o["pts3d"].astype(jnp.float32).sum()
            return acc

        out["heads"] = timed(heads, params, *hooks)
        print("heads", round(out["heads"], 4), flush=True)

    if "heads_conf" in probes or "heads_nopost" in probes:
        # same chunked dual-head loop, but (a) consuming only conf (what
        # bench.py's checksum DCEs the pts3d exp-map down to) or (b) with
        # postprocess stubbed out entirely (isolates the fp32 exp-map +
        # 1+exp share of the heads phase)
        cv = args.head_chunk
        hooks2 = [jnp.asarray(rng.standard_normal((1, S, 1024)) * 0.4,
                              jnp.bfloat16) for _ in range(4)]

        def make_heads(key):
            def run(p, h0, h1, h2, h3):
                hs = [h0, h1, h2, h3]
                acc = jnp.float32(0.0)
                for start in range(0, V, cv):
                    toks = [t[0, start * P:(start + cv) * P].reshape(cv, P, -1)
                            for t in hs]
                    for head in ("head_global", "head_local"):
                        o = dpt_head_forward(p[head], cfg.head, toks, (H, W))
                        acc += o[key].astype(jnp.float32).sum()
                return acc
            return run

        if "heads_conf" in probes:
            out["heads_conf"] = timed(make_heads("conf"), params, *hooks2)
            print("heads_conf", round(out["heads_conf"], 4), flush=True)

        if "heads_nopost" in probes:
            from fast3r_tpu.models import dpt_head as dh
            orig = dh.postprocess
            dh.postprocess = lambda x, dm, cm: {"raw": x}
            try:
                out["heads_nopost"] = timed(make_heads("raw"), params,
                                            *hooks2)
            finally:
                dh.postprocess = orig
            print("heads_nopost", round(out["heads_nopost"], 4), flush=True)

    if "forward" in probes:
        def fwd(p, x):
            # consume every output (conf-only checksums let XLA's while-loop
            # simplifier DCE the local head out of the chunk map — r5 audit)
            o = fast3r_forward(p, cfg, x, head_chunk_views=args.head_chunk)
            return sum(v.astype(jnp.float32).sum() for v in o.values())
        out["forward"] = timed(fwd, params, imgs)
        print("forward", round(out["forward"], 4), flush=True)

    print(json.dumps({k: round(v, 4) for k, v in out.items()}))


if __name__ == "__main__":
    main()


