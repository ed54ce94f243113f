"""Compile the hot stacks for TPU and dump XLA's own cost accounting.

No execution: jit().lower(abstract_args).compile() runs the remote compiler
only, so this works within the tunneled worker's upload/execution caps.
Prints cost_analysis (flops / bytes accessed) per program and writes the
post-optimization HLO to /tmp/<name>_hlo.txt for fusion inspection.

Usage: python scripts/dump_hlo.py [--probes encoder,decoder,mlp,attnsub]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, H, W = 20, 384, 512
ROOF_BYTES_PER_S = 819e9  # v5e HBM
ROOF_FLOPS = 190e12


def report(name, compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    bytes_acc = ca.get("bytes accessed", 0.0)
    t_flops = flops / ROOF_FLOPS
    t_bytes = bytes_acc / ROOF_BYTES_PER_S
    print(f"{name}: flops={flops/1e12:.2f}T bytes={bytes_acc/1e9:.2f}GB "
          f"t_mxu={t_flops*1e3:.1f}ms t_hbm={t_bytes*1e3:.1f}ms "
          f"(bound: {'HBM' if t_bytes > t_flops else 'MXU'})")
    txt = compiled.as_text()
    path = f"/tmp/{name}_hlo.txt"
    with open(path, "w") as f:
        f.write(txt)
    print(f"  wrote {path} ({len(txt)} bytes)")
    # top fusion ops by bytes accessed, from the per-op metadata if present
    per_op = [kv for kv in ca.items() if kv[0].startswith("bytes accessed")]
    if len(per_op) > 1:
        top = sorted(per_op, key=lambda kv: -kv[1])[:12]
        for k, v in top:
            print(f"    {k}: {v/1e9:.3f} GB")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probes", default="encoder,decoder")
    args = ap.parse_args()
    probes = set(args.probes.split(","))

    import jax
    import jax.numpy as jnp

    from fast3r_tpu.models.encoder import EncoderConfig, init_encoder
    from fast3r_tpu.nn.layers import run_vit_stack
    from fast3r_tpu.ops.rope2d import rope2d_cos_sin

    cfg = EncoderConfig()
    params = jax.eval_shape(
        lambda: jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                             init_encoder(jax.random.key(0), cfg)))
    P = (H // 16) * (W // 16)
    hd = cfg.embed_dim // cfg.num_heads
    S = B * P

    import numpy as np
    pos = np.stack(np.meshgrid(np.arange(H // 16), np.arange(W // 16),
                               indexing="ij"), -1).reshape(-1, 2)
    pos = jnp.asarray(np.broadcast_to(pos[None], (B, P, 2)), jnp.int32)
    cos, sin = rope2d_cos_sin(pos, hd, cfg.rope_base)
    x_enc = jax.ShapeDtypeStruct((B, P, cfg.embed_dim), jnp.bfloat16)
    x_dec = jax.ShapeDtypeStruct((1, S, cfg.embed_dim), jnp.bfloat16)

    if "encoder" in probes:
        def enc(p, x):
            y, _ = run_vit_stack(p["blocks"], x, cfg.num_heads, hd ** -0.5,
                                 rope_cos_sin=(cos, sin), attn_impl="xla",
                                 depth=cfg.depth)
            return y
        c = jax.jit(enc).lower(params, x_enc).compile()
        report("encoder_stack", c)

    if "decoder" in probes:
        def dec(p, x):
            y, _ = run_vit_stack(p["blocks"], x, cfg.num_heads, hd ** -0.5,
                                 rope_cos_sin=None, attn_impl="pallas",
                                 depth=cfg.depth)
            return y
        c = jax.jit(dec).lower(params, x_dec).compile()
        report("decoder_stack", c)

    if "mlp" in probes:
        from fast3r_tpu.nn.layers import layernorm, mlp

        def mlp_fn(p, x):
            blk = jax.tree.map(lambda a: a[0], p["blocks"])
            return x + mlp(blk["mlp"], layernorm(blk["norm2"], x))
        c = jax.jit(mlp_fn).lower(params, x_dec).compile()
        report("mlp_sublayer", c)

    if "attnsub" in probes:
        from fast3r_tpu.nn.layers import attention_layer, layernorm

        def attn_fn(p, x):
            blk = jax.tree.map(lambda a: a[0], p["blocks"])
            return x + attention_layer(
                blk["attn"], layernorm(blk["norm1"], x), cfg.num_heads,
                hd ** -0.5, rope_cos_sin=(cos, sin), attn_impl="xla")
        c = jax.jit(attn_fn).lower(params, x_enc).compile()
        report("attn_sublayer_rope_xla", c)


if __name__ == "__main__":
    main()
