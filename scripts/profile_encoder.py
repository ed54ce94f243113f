"""Encoder phase profiling on the real TPU: where do the 0.64 s go?

Analytic floor for 20 views @ 512x384 (S=768/img): ~10.5 TFLOP -> ~0.16 s at
the chip's ~64 TFLOP/s practical roof.  Probes (each timed with the chained
fori_loop + checksum-fetch method, see bench.py):
  1. full encoder (configured attention impl)
  2. full encoder with xla attention
  3. bare ViT stack, no rope (linears + attention only)
  4. bare ViT stack with rope
  5. patch embed only
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, H, W = 20, 384, 512
ITERS = 4


def timed(fn, params, x):
    """Time fn(params, x) by chaining ITERS invocations in one program
    (bench.py).  params/x are jit ARGUMENTS — closing over them would bake
    0.65 GB of constants into the HLO and overflow the remote-compile
    upload (HTTP 413)."""
    import jax
    import jax.numpy as jnp

    def run_n(p, x, n):
        def body(i, acc):
            xi = x * (jnp.float32(1.0) + i * jnp.float32(1e-8)).astype(x.dtype)
            return acc + fn(p, xi)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    r1 = jax.jit(lambda p, x: run_n(p, x, 1))
    rN = jax.jit(lambda p, x: run_n(p, x, ITERS))
    float(np.asarray(r1(params, x)))
    float(np.asarray(rN(params, x)))
    t0 = time.perf_counter(); float(np.asarray(r1(params, x))); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(np.asarray(rN(params, x))); tN = time.perf_counter() - t0
    return (tN - t1) / (ITERS - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", default="full_pallas,full_xla,stack_norope,"
                                         "stack_rope,patch")
    # extra probes: full_{pallas,xla}_plain (fused_blocks off),
    # decstack_{fused,plain} (decoder-shaped stack, flash attention)
    args = ap.parse_args()
    probes = set(args.probes.split(","))

    import jax
    import jax.numpy as jnp

    from fast3r_tpu.models.encoder import (
        EncoderConfig, encoder_forward, init_encoder,
    )
    from fast3r_tpu.nn.layers import run_vit_stack
    from fast3r_tpu.models.patch_embed import patch_embed_manyar
    from fast3r_tpu.ops.rope2d import rope2d_cos_sin

    results = {}
    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, H, W, 3)), jnp.bfloat16)

    for impl_name in ("pallas", "xla"):
        for fused in (True, False):
            key = f"full_{impl_name}" + ("" if fused else "_plain")
            if key not in probes:
                continue
            cfg = EncoderConfig(attn_impl=impl_name, fused_blocks=fused)
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16),
                init_encoder(jax.random.key(0), cfg))

            def enc(p, x, cfg=cfg):
                feats, _ = encoder_forward(p, cfg, x)
                return feats.astype(jnp.float32).sum()

            results[key] = timed(enc, params, imgs)
            print(key, round(results[key], 4), flush=True)

    cfg = EncoderConfig(attn_impl="pallas")
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_encoder(jax.random.key(0), cfg))
    P = (H // 16) * (W // 16)
    x0 = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, P, cfg.embed_dim)),
        jnp.bfloat16)
    pos = jnp.stack(jnp.meshgrid(
        jnp.arange(H // 16), jnp.arange(W // 16), indexing="ij"),
        -1).reshape(-1, 2).astype(jnp.int32)
    pos = jnp.broadcast_to(pos[None], (B, P, 2))
    hd = cfg.embed_dim // cfg.num_heads

    if "stack_norope" in probes:
        def stack_plain(p, x):
            y, _ = run_vit_stack(p["blocks"], x, cfg.num_heads,
                                 hd ** -0.5, attn_impl="pallas",
                                 depth=cfg.depth)
            return y.astype(jnp.float32).sum()
        results["stack_norope"] = timed(stack_plain, params, x0)
        print("stack_norope", round(results["stack_norope"], 4), flush=True)

    if "stack_rope" in probes:
        cos, sin = rope2d_cos_sin(pos, hd, cfg.rope_base)

        def stack_rope(p, x):
            y, _ = run_vit_stack(p["blocks"], x, cfg.num_heads,
                                 hd ** -0.5, rope_cos_sin=(cos, sin),
                                 attn_impl="pallas", depth=cfg.depth)
            return y.astype(jnp.float32).sum()
        results["stack_rope"] = timed(stack_rope, params, x0)
        print("stack_rope", round(results["stack_rope"], 4), flush=True)

    # production-shape fused-stack probes: batched attention vs attention
    # replaced by identity (isolates the attention share of the stack), and
    # additionally without rope (isolates the rope share)
    cos_sin = rope2d_cos_sin(pos, hd, cfg.rope_base)

    def _fused_probe(impl, rope):
        def f(p, x):
            y, _ = run_vit_stack(
                p["blocks"], x, cfg.num_heads, hd ** -0.5,
                rope_cos_sin=cos_sin if rope else None,
                attn_impl=impl, depth=cfg.depth, fused=True)
            return y.astype(jnp.float32).sum()
        return f

    from fast3r_tpu.ops.batched_attention import _batched_bnhd

    _identity_attn = lambda q, k, v, s: q
    _padded_attn = lambda q, k, v, s: _batched_bnhd(q, k, v, float(s))
    fused_probes = {
        "stack_fused_batched": _fused_probe("batched", True),
        "stack_fused_padded": _fused_probe(_padded_attn, True),
        "stack_fused_xla": _fused_probe("xla", True),
        "stack_fused_noattn": _fused_probe(_identity_attn, True),
        "stack_fused_noattn_norope": _fused_probe(_identity_attn, False),
    }
    for key, f in fused_probes.items():
        if key not in probes:
            continue
        results[key] = timed(f, params, x0)
        print(key, round(results[key], 4), flush=True)

    for fused in (True, False):
        key = "decstack" + ("_fused" if fused else "_plain")
        if key not in probes:
            continue
        # decoder-shaped stack: one fused sequence of V*P tokens, no rope,
        # flash attention (what models/decoder.py runs at 20 views)
        xd = x0.reshape(1, B * P, cfg.embed_dim)

        def dec(p, x, fused=fused):
            from fast3r_tpu.nn.layers import run_vit_stack as rvs
            y, _ = rvs(p["blocks"], x, cfg.num_heads, hd ** -0.5,
                       attn_impl="pallas", ln_eps=1e-5, depth=cfg.depth,
                       fused=fused)
            return y.astype(jnp.float32).sum()

        results[key] = timed(dec, params, xd)
        print(key, round(results[key], 4), flush=True)

    if "patch" in probes:
        ts = jnp.broadcast_to(jnp.array([H, W], jnp.int32)[None], (B, 2))

        def patch(p, x):
            feats, _ = patch_embed_manyar(p["patch_embed"], x, ts, 16)
            return feats.astype(jnp.float32).sum()
        results["patch"] = timed(patch, params, imgs)
        print("patch", round(results["patch"], 4), flush=True)

    print(json.dumps({k: round(v, 4) for k, v in results.items()}))


if __name__ == "__main__":
    main()
