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

    for name, impl in impls.items():
        key = f"op_{name}"
        if key not in probes:
            continue

        def op(p, x, impl=impl):
            return impl(x[0], x[1], x[2], scale).astype(jnp.float32).sum()

        results[key] = timed(op, jnp.zeros((1,), jnp.bfloat16), qkv)
        print(key, round(results[key], 5), flush=True)

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

    for name, impl in impls.items():
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
