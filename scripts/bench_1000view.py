"""1000-view single forward pass benchmark (BASELINE.json config 5).

Runs the flagship model on N views at 256x192 (192 patches/view ->
S = N*192 fused tokens) in bf16 on the available TPU, with the Pallas flash
attention decoder and chunked heads, and reports wall-clock.

The reference's headline claim is 1000+ views in one forward on an A100-80GB
(README.md:3).  Timing uses a checksum fetch (see bench.py notes on the
tunneled-TPU platform).
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=1000)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--head-chunk", type=int, default=25)
    ap.add_argument("--staged", action="store_true",
                    help="run encoder / decoder-segments / heads as separate "
                         "dispatches (the tunneled-TPU worker kills single "
                         "executions over ~2 minutes)")
    ap.add_argument("--decoder-segment", type=int, default=6,
                    help="layers per decoder dispatch in --staged mode")
    ap.add_argument("--encoder-chunk", type=int, default=500,
                    help="images per encoder dispatch in --staged mode "
                         "(the reference's encoder chunk, fast3r.py:250)")
    ap.add_argument("--host-hooks", action="store_true",
                    help="spill decoder hook activations to HOST memory as "
                         "they are produced and feed head chunks from host "
                         "slices — required at 512-res 1000 views, where "
                         "the four device-resident hooks (4 x 1.57 GB) plus "
                         "the per-layer MLP transient (6.3 GB at S=768k) "
                         "exceed the 16 GB HBM")
    ap.add_argument("--recompute-h0", action="store_true",
                    help="device-resident hooks WITHOUT keeping hook 0: "
                         "embed consumes the encoder output, and each head "
                         "chunk re-encodes its own views (encoder compute "
                         "~12 s/1000 views vs ~190 s to round-trip 3.1 GB "
                         "of h0 over the tunnel).  Combine with --fused-mlp "
                         "so hooks 12/18/24 + the decoder transients fit "
                         "HBM at 512-res")
    ap.add_argument("--fused-mlp", action="store_true",
                    help="whole-MLP kernel in the decoder blocks "
                         "(nn/fused_block.ln_mlp): caps the fc1 transient "
                         "at one row tile instead of 6.3 GB at S=768k, "
                         "freeing enough HBM to keep hooks device-resident "
                         "(skip --host-hooks) at 512-res — the host spill + "
                         "re-upload rides the tunnel and dominates the r3 "
                         "staging tax")
    args = ap.parse_args()
    if args.staged:
        return main_staged(args)

    import jax
    import jax.numpy as jnp

    from fast3r_tpu.models.fast3r import Fast3RConfig, fast3r_forward, init_fast3r

    cfg = Fast3RConfig.flagship(attn_impl="pallas")
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        init_fast3r(jax.random.key(0), cfg),
    )
    V, H, W = args.views, args.height, args.width
    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, V, H, W, 3)), jnp.bfloat16
    )

    def fwd(p, x):
        out = fast3r_forward(p, cfg, x, head_chunk_views=args.head_chunk)
        # consume every output — a conf-only checksum lets XLA DCE the local
        # head out of the chunk map (r5 audit, see bench.py)
        return sum(v.astype(jnp.float32).sum() for v in out.values())

    f = jax.jit(fwd)
    t0 = time.perf_counter()
    first = float(np.asarray(f(params, imgs)))
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    val = float(np.asarray(f(params, imgs * jnp.bfloat16(1.0000001))))
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": f"wall-clock {V}-view forward @ {W}x{H} bf16 (single chip)",
        "value": round(dt, 2),
        "unit": "seconds",
        "compile_plus_first_run_s": round(t_compile, 2),
        "checksum": val,
        "views_per_sec": round(V / dt, 2),
    }))


def main_staged(args):
    """Encoder / decoder-segments / head-chunks as separate dispatches.

    The tunneled single-chip environment kills any one XLA execution running
    longer than ~2 minutes; a real TPU deployment would run the fused program
    (fast3r_forward).  Reported time is the summed wall-clock of all
    dispatches including host round trips — an upper bound on the fused time.
    """
    import jax
    import jax.numpy as jnp

    from fast3r_tpu.models.decoder import image_idx_table
    from fast3r_tpu.models.dpt_head import dpt_head_forward
    from fast3r_tpu.models.encoder import encoder_forward
    from fast3r_tpu.models.fast3r import Fast3RConfig, init_fast3r
    from fast3r_tpu.nn.layers import layernorm, linear, run_vit_stack

    if args.fused_mlp:
        from fast3r_tpu.nn import fused_block

        fused_block.PREFER_FUSED_MLP = True

    cfg = Fast3RConfig.flagship(attn_impl="pallas")
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        init_fast3r(jax.random.key(0), cfg),
    )
    V, H, W = args.views, args.height, args.width
    P = (H // 16) * (W // 16)
    dcfg = cfg.decoder
    seg = args.decoder_segment
    bounds = sorted(set(
        list(range(seg, dcfg.depth, seg)) + [h for h in dcfg.hooks if h > 0]
    ))
    segments = list(zip([0] + bounds, bounds + ([dcfg.depth]
                                                if bounds[-1] != dcfg.depth
                                                else [])))

    def sync(x):
        np.asarray(jax.tree.leaves(x)[0].ravel()[0])
        return x

    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal((V, H, W, 3)), jnp.bfloat16
    )

    # Cap the encoder dispatch by TOKENS, not views: 500 views x 192 tok
    # (256-res) is the proven-fit working set; at 512-res (768 tok/view) a
    # 500-view chunk compiles to a 22.5 GB encoder program (RoPE rotate-half
    # temporaries pad 4x in the 32-lane minor dim — caught on hardware, r3).
    ec_cap = max(1, 96000 // P)
    ec = max(d for d in range(1, min(args.encoder_chunk, ec_cap, V) + 1)
             if V % d == 0)

    @jax.jit
    def encode(p, x):
        feats, _ = encoder_forward(p["encoder"], cfg.encoder, x)
        return feats.reshape(1, -1, feats.shape[-1])

    @jax.jit
    def encode_cv(p, x):
        feats, _ = encoder_forward(p["encoder"], cfg.encoder, x)
        return feats  # (views, P, C) — per-head-chunk h0 recompute

    @jax.jit
    def embed(p, fused):
        ids = jnp.repeat(jnp.arange(V, dtype=jnp.int32), P)[None]
        x = linear(p["decoder"]["decoder_embed"], fused)
        table = jnp.asarray(image_idx_table(dcfg.embed_dim), dtype=x.dtype)
        return x + table[ids]

    def head_grouped_flash(q, k, v, scale, groups=8):
        """Flash attention over head groups via lax.map: at S=768k the full
        (B, H, S, 64) q/k/v/o transposes each pad 2x in the lane dim
        (64 -> 128) = 2.9 GB apiece; grouping bounds the live transposed set
        to H/groups heads at a time (caught on hardware, r3; r4: groups 4
        -> 8 shaves another ~0.6 GB of peak for the device-hooks road)."""
        from fast3r_tpu.ops.flash_attention import flash_attention

        B, S, H, D = q.shape
        hg = H // groups

        def body(g):
            sl = lambda t: jax.lax.dynamic_slice_in_dim(t, g * hg, hg, axis=2)
            return flash_attention(sl(q), sl(k), sl(v), scale)

        outs = jax.lax.map(body, jnp.arange(groups))  # (G, B, S, hg, D)
        return jnp.moveaxis(outs, 0, 2).reshape(B, S, H, D)

    # ONE jitted program per distinct segment LENGTH (the sliced block params
    # are an argument, not a closure) — with seg | gaps-between-hooks all
    # segments share a single remote compile instead of paying the
    # minutes-long compile 8-12 times for identical HLO.
    seg_cache = {}

    def get_segment_fn(length, donate=True):
        key = (length, donate)
        if key not in seg_cache:
            # donate x: the input buffer is dead the moment the first block
            # consumes it — reusing it cuts ~1.6 GB off the segment's peak
            # live set (r4 device-hooks OOM fix).  donate=False is used for
            # the segment that CONSUMES a device-resident hook (recompute-h0
            # mode keeps hooks 12/18 on device; donating would delete them —
            # caught on hardware, r5)
            @functools.partial(jax.jit,
                               donate_argnums=(1,) if donate else ())
            def run(blocks, x):
                # fused=True is LOAD-BEARING at 512-res: the plain path's
                # packed (S, 3, H, 64) qkv intermediate carries a 2x
                # lane-padding expansion (64 -> 128 minor dim) = 8.8 GB at
                # S=768k and OOMs the 16 GB chip (caught on hardware, r3)
                x, _ = run_vit_stack(
                    blocks, x, dcfg.num_heads, dcfg.attn_scale(False),
                    attn_impl=head_grouped_flash, ln_eps=dcfg.block_ln_eps,
                    depth=length, fused=True,
                )
                return x
            seg_cache[key] = run
        return seg_cache[key]

    def run_segment(a, b, x, donate=True):
        sliced = jax.tree.map(lambda t: t[a:b], params["decoder"]["blocks"])
        return get_segment_fn(b - a, donate)(sliced, x)

    @jax.jit
    def final_norm(p, x):
        return layernorm(p["decoder"]["norm"], x, dcfg.final_ln_eps)

    cv = args.head_chunk

    @jax.jit
    def run_head_chunk(p, tokens):
        g = dpt_head_forward(p["head_global"], cfg.head, list(tokens), (H, W))
        l = dpt_head_forward(p["head_local"], cfg.head, list(tokens), (H, W))
        return (g["pts3d"], g["conf"], l["pts3d"], l["conf"])

    def to_host(x):
        """Device -> host spill (np.asarray also serves as the dispatch
        sync); the device buffer is freed when the jnp reference drops."""
        return np.asarray(x)

    def full_pass():
        t0 = time.perf_counter()
        phases = {}
        hooks = {}
        if args.host_hooks:
            # encoder chunks land on host immediately; fused re-uploads once
            host_chunks = [to_host(encode(params, imgs[i:i + ec]))
                           for i in range(0, V, ec)]
            phases["encoder"] = time.perf_counter() - t0
            fused_host = np.concatenate(host_chunks, axis=1)
            del host_chunks
            hooks[0] = fused_host
            x = sync(embed(params, jnp.asarray(fused_host)))
        elif args.recompute_h0:
            # r4 tunnel-tax fix: hook 0 (the encoder output) is NEVER kept —
            # embed consumes it, and each head chunk RE-ENCODES its own
            # views (encoder compute for all 1000 views is ~12 s vs ~190 s
            # to round-trip 3.1 GB of h0 over the ~17-33 MB/s tunnel).
            # Hooks 12/18/24 (4.7 GB bf16) stay device-resident: without h0
            # or the 6.3 GB fc1 transient (--fused-mlp), the decoder's peak
            # live set fits the 16 GB chip (the keep-everything variant
            # OOMed on hardware, r4).
            chunks = [sync(encode(params, imgs[i:i + ec]))
                      for i in range(0, V, ec)]
            phases["encoder"] = time.perf_counter() - t0
            fused = jnp.concatenate(chunks, axis=1)
            del chunks
            x = sync(embed(params, fused))
            del fused
        else:
            chunks = [sync(encode(params, imgs[i:i + ec]))
                      for i in range(0, V, ec)]
            phases["encoder"] = time.perf_counter() - t0
            fused = jnp.concatenate(chunks, axis=1)
            hooks[0] = fused
            x = sync(embed(params, fused))
        t1 = time.perf_counter()
        phases["embed"] = t1 - t0 - phases["encoder"]
        spill = 0.0
        x_is_live_hook = False
        for a, b in segments:
            # never donate a buffer that is also a stored device hook
            x = sync(run_segment(a, b, x, donate=not x_is_live_hook))
            x_is_live_hook = False
            if b in dcfg.hooks and b != dcfg.depth:
                ts = time.perf_counter()
                hooks[b] = to_host(x) if args.host_hooks else x
                x_is_live_hook = not args.host_hooks
                spill += time.perf_counter() - ts
        hooks[dcfg.depth] = (to_host(final_norm(params, x))
                             if args.host_hooks
                             else sync(final_norm(params, x)))
        if args.host_hooks or args.recompute_h0:
            del x
        t2 = time.perf_counter()
        phases["decoder"] = t2 - t1 - spill
        phases["hook_spill"] = spill
        conf_sum = 0.0
        for start in range(0, V, cv):
            toks = []
            for h in dcfg.hooks:
                if h == 0 and args.recompute_h0:
                    toks.append(encode_cv(params, imgs[start:start + cv])
                                .reshape(cv, P, -1))
                else:
                    toks.append(jnp.asarray(
                        hooks[h][0, start * P:(start + cv) * P]
                    ).reshape(cv, P, -1))
            out = run_head_chunk(params, tuple(toks))
            conf_sum += float(np.asarray(out[1].astype(jnp.float32).sum()))
        phases["heads"] = time.perf_counter() - t2
        print("phases", json.dumps({k: round(v, 1) for k, v in
                                    phases.items()}), flush=True)
        return time.perf_counter() - t0, conf_sum

    t_compile, _ = full_pass()
    dt, checksum = full_pass()
    print(json.dumps({
        "metric": f"wall-clock {V}-view forward @ {W}x{H} bf16 "
                  f"(single chip, staged dispatches)",
        "value": round(dt, 2),
        "unit": "seconds",
        "compile_plus_first_run_s": round(t_compile, 2),
        "checksum": checksum,
        "views_per_sec": round(V / dt, 2),
    }))


if __name__ == "__main__":
    main()
