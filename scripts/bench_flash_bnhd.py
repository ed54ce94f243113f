"""BNHD-native flash vs the BHSD transpose wrapper on the real TPU.

Times the op AS THE DECODER USES IT: inputs/outputs in (B, N, H, D), so the
BHSD variant pays its 4 swapaxes materializations and the BNHD variant's
strided head-window DMAs are on the clock.  Chained fori_loop + checksum
fetch timing (bench.py protocol).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, S, H, D = 1, 15360, 16, 64
ITERS = 6


def timed(fn, q, k, v, iters=ITERS):
    import jax
    import jax.numpy as jnp

    def run_n(q, k, v, n):
        def body(i, acc):
            qi = q * (jnp.float32(1.0) + i * jnp.float32(1e-8)).astype(q.dtype)
            return acc + jnp.sum(fn(qi, k, v).astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    r1 = jax.jit(lambda q, k, v: run_n(q, k, v, 1))
    rN = jax.jit(lambda q, k, v: run_n(q, k, v, iters))
    float(np.asarray(r1(q, k, v)))
    float(np.asarray(rN(q, k, v)))
    t0 = time.perf_counter(); float(np.asarray(r1(q, k, v))); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(np.asarray(rN(q, k, v))); tN = time.perf_counter() - t0
    return (tN - t1) / (iters - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", default="bnhd,bhsd")
    args = ap.parse_args()
    probes = set(args.probes.split(","))

    import jax
    import jax.numpy as jnp

    from fast3r_tpu.ops import flash_attention as fa

    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (jax.random.normal(x, (B, S, H, D), jnp.float32)
               .astype(jnp.bfloat16) for x in ks)
    scale = D ** -0.5
    tflop = 4 * B * H * S * S * D / 1e12

    def bhsd(q, k, v):
        qt, kt, vt = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
        return jnp.swapaxes(fa._flash_bhsd(qt, kt, vt, scale), 1, 2)

    def bnhd(q, k, v):
        return fa._flash_bnhd(q, k, v, scale)

    # pre-transposed inputs: the kernel alone, no swapaxes on the clock —
    # (bhsd - raw) is the per-op transpose overhead the BNHD design targets
    qh, kh, vh = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
    qh, kh, vh = (jnp.asarray(np.asarray(t)) for t in (qh, kh, vh))

    def raw(q, k, v):
        return fa._flash_bhsd(q, k, v, scale)

    out = {}
    for name, fn in (("bnhd", bnhd), ("bhsd", bhsd), ("raw", raw)):
        if name not in probes:
            continue
        t = timed(fn, qh, kh, vh) if name == "raw" else timed(fn, q, k, v)
        out[name] = {"ms": round(t * 1e3, 2), "tflops": round(tflop / t, 1)}
        print(name, out[name], flush=True)
    print(json.dumps({"shape": [B, S, H, D], "tflop_per_pass": round(tflop, 2),
                      "results": out}))


if __name__ == "__main__":
    main()
