"""Hardware A/B of the packed (B, N, C) head-group flash vs the BHSD kernel.

Three numbers at the decoder shape (1, 15360, 16, 64) bf16:
  * raw BHSD kernel on pre-transposed inputs (the kernel-only rate);
  * BHSD road as composed (swapaxes in, swapaxes out — what the decoder
    actually paid before r5);
  * packed head-group kernel straight off the (B, N, C) layout.
Plus a hardware parity check packed vs BHSD-road outputs.

    python scripts/bench_flash_packed.py [--seq 15360] [--iters 32]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, iters, repeats=3):
    import jax
    import jax.numpy as jnp

    def run_n(n, *a):
        x = a[0]

        def body(i, acc):
            xi = x * (jnp.float32(1.0) + i * jnp.float32(1e-8)).astype(x.dtype)
            return acc + jnp.sum(fn(xi, *a[1:]).astype(jnp.float32))

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
    ap.add_argument("--seq", type=int, default=15360)
    ap.add_argument("--batch", type=int, default=1,
                    help="independent attention instances (e.g. 20 for the "
                         "per-view encoder shape --seq 768 --batch 20)")
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--head-dim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--probes", default="packed,bhsd_road,bhsd_raw",
                    help="also: fusedqkv (the encoder road's single-kernel "
                         "qkv attention, ops/batched_attention.py)")
    ap.add_argument("--sweep", default="",
                    help="comma list of bqxbk@split packed-kernel configs to "
                         "time instead of the default probes")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from fast3r_tpu.ops.flash_attention import (
        MAX_BLOCK_KV, MAX_BLOCK_Q, _flash_bhsd, _flash_forward_packed,
        _flash_packed, _pick_block)

    S, H, D = args.seq, args.heads, args.head_dim
    B = args.batch
    C = H * D
    scale = D ** -0.5
    tflop = 4 * B * S * S * D * H / 1e12
    rng = np.random.default_rng(0)
    qp = jnp.asarray(rng.standard_normal((B, S, C)), jnp.bfloat16)
    kp = jnp.asarray(rng.standard_normal((B, S, C)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((B, S, C)), jnp.bfloat16)

    def packed(q, k, v):
        return _flash_packed(q, k, v, scale, D)

    def bhsd_road(q, k, v):
        qt = jnp.swapaxes(q.reshape(B, S, H, D), 1, 2)
        kt = jnp.swapaxes(k.reshape(B, S, H, D), 1, 2)
        vt = jnp.swapaxes(v.reshape(B, S, H, D), 1, 2)
        o = _flash_bhsd(qt, kt, vt, scale)
        return jnp.swapaxes(o, 1, 2).reshape(B, S, C)

    def bhsd_raw(qt, kt, vt):
        return _flash_bhsd(qt, kt, vt, scale)

    if args.sweep:
        results = {}
        for spec in args.sweep.split(","):
            blocks, _, sp = spec.partition("@")
            bq, bk = (int(x) for x in blocks.split("x"))
            split = int(sp) if sp else None

            def run(q, k, v, bq=bq, bk=bk, split=split):
                return _flash_forward_packed(q, k, v, scale, bq, bk, D,
                                             split=split)[0]

            try:
                ms = timed(run, (qp, kp, vp), args.iters) * 1e3
                results[spec] = {"ms": round(ms, 3),
                                 "tflops": round(tflop / (ms / 1e3), 1)}
            except Exception as e:  # noqa: BLE001 — sweep survives OOMs
                results[spec] = {"error": str(e)[:200]}
            print(spec, json.dumps(results[spec]), flush=True)
        print(json.dumps({"seq": S, "sweep": results}))
        return

    # hardware parity first (cheap: one dispatch each)
    o_p = np.asarray(packed(qp, kp, vp), np.float32)
    o_r = np.asarray(bhsd_road(qp, kp, vp), np.float32)
    maxd = float(np.max(np.abs(o_p - o_r)))
    print(json.dumps({"parity_max_abs_diff": maxd,
                      "mean_abs_out": float(np.mean(np.abs(o_r)))}))

    results = {}
    for probe in args.probes.split(","):
        if probe == "packed":
            ms = timed(packed, (qp, kp, vp), args.iters) * 1e3
        elif probe == "bhsd_road":
            ms = timed(bhsd_road, (qp, kp, vp), args.iters) * 1e3
        elif probe == "bhsd_raw":
            qt = jnp.swapaxes(qp.reshape(B, S, H, D), 1, 2)
            kt = jnp.swapaxes(kp.reshape(B, S, H, D), 1, 2)
            vt = jnp.swapaxes(vp.reshape(B, S, H, D), 1, 2)
            ms = timed(bhsd_raw, (qt, kt, vt), args.iters) * 1e3
        elif probe == "fusedqkv":
            from fast3r_tpu.ops.batched_attention import packed_qkv_attention
            qkv3 = jnp.stack([qp, kp, vp])

            def fq(qkv3):
                return packed_qkv_attention(qkv3, H, scale)
            ms = timed(fq, (qkv3,), args.iters) * 1e3
        else:
            continue
        results[probe] = {"ms": round(ms, 3),
                          "tflops": round(tflop / (ms / 1e3), 1)}
        print(probe, json.dumps(results[probe]), flush=True)

    print(json.dumps({"seq": S, "results": results}))


if __name__ == "__main__":
    main()
