"""Compile and run the RDMA ring kernel on ONE real TPU chip.

Interpreter-green is not TPU-green (r2's fused-LN backward shipped two
Mosaic lowering bugs that only hardware caught), so this script exercises
the ring kernel's actual Mosaic lowering without a pod:

  1. n=1 ring: local-copy + compute path (no remote ops);
  2. self-ring (--epochs N): every hop is a real make_async_remote_copy +
     capacity-token RDMA targeting the device itself — softmax over N
     duplicated K/V copies returns the same output, so the result must
     match the plain flash kernel bit-for-bit-ish (bf16 tolerance).

Prints one JSON line per configuration with the max deviation vs the plain
flash kernel and the wall-clock (checksum-fetch timing, bench.py notes).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=4,
                    help="self-ring hop count (>=3 exercises slot reuse + "
                         "capacity tokens)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from fast3r_tpu.ops.flash_attention import flash_attention
    from fast3r_tpu.parallel.ring_rdma import ring_flash_attention_rdma

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    mesh = Mesh(np.array([dev]), ("seq",))
    rng = np.random.default_rng(0)
    B, S, H, D = 1, args.seq, args.heads, args.dim
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
        for _ in range(3)
    )
    scale = D ** -0.5

    ref = np.asarray(flash_attention(q, k, v, scale).astype(jnp.float32))

    for name, epochs in (("n1_ring", None), ("self_ring", args.epochs)):
        fn = jax.jit(jax.shard_map(
            lambda q, k, v, e=epochs: ring_flash_attention_rdma(
                q, k, v, scale, "seq", 1, self_ring_epochs=e),
            mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(),
            check_vma=False,
        ))
        t0 = time.perf_counter()
        out = np.asarray(fn(q, k, v).astype(jnp.float32))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = np.asarray(fn(q, k, v).astype(jnp.float32))
        dt = time.perf_counter() - t0
        max_dev = float(np.max(np.abs(out - ref)))
        print(json.dumps({
            "metric": f"rdma ring single-chip ({name}, S={S}, H={H}, D={D}"
                      + (f", epochs={epochs}" if epochs else "") + ")",
            "value": round(dt, 4),
            "unit": "seconds",
            "compile_plus_first_run_s": round(t_compile, 1),
            "max_abs_dev_vs_flash": max_dev,
            "ok": bool(max_dev < 0.05),
        }))


if __name__ == "__main__":
    main()
