"""Sequence parallelism: ring flash attention + the sequence-sharded forward.

THE scaling feature the reference lacks (SURVEY.md §5.7): the reference fits
1000+ views on one A100 by chunking and flash attention; here the fused
N-view token sequence is sharded across TPU devices and the fusion decoder's
global attention runs as ring attention — each device holds S/n query tokens,
K/V blocks rotate around the ICI ring via jax.lax.ppermute, and partial
attention outputs merge with the online-softmax (logsumexp) rule.  Everything
else in the decoder (LN/MLP/projections/image-index embedding) is per-token
and shards trivially; the DPT heads run on each device's local views.

Built on the Pallas flash kernel (ops/flash_attention.py) for the per-block
compute; the merge is exact, so results match single-device attention to
float tolerance.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fast3r_tpu.models.decoder import image_idx_table
from fast3r_tpu.models.dpt_head import dpt_head_forward
from fast3r_tpu.models.encoder import encoder_forward
from fast3r_tpu.nn.layers import layernorm, linear, run_vit_stack


# ---------------------------------------------------------------------------
# block attention returning logsumexp
# ---------------------------------------------------------------------------

def _attn_with_lse(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   scale: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Attention block with normalized output + row logsumexp.

    q, k, v: (B, H, S, D).  Returns (o (B,H,S,D), lse (B,H,S,1) fp32).
    Uses the Pallas flash kernel when the shapes tile; otherwise an exact
    jnp fallback (tiny test shapes).
    """
    from fast3r_tpu.ops import flash_attention as fa

    S, Skv, D = q.shape[2], k.shape[2], q.shape[3]
    bq = fa._pick_block(S, fa.MAX_BLOCK_Q)
    bk = fa._pick_block(Skv, fa.MAX_BLOCK_KV)
    if bq and bk:
        return fa._flash_forward(q, k, v, scale, bq, bk)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd",
                   jnp.exp(logits - lse).astype(v.dtype), v)
    return o, lse


def _merge_partials(o1, lse1, o2, lse2):
    """Merge two normalized partial attention results (online softmax)."""
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)
    w2 = jnp.exp(lse2 - m)
    denom = w1 + w2
    o = (o1.astype(jnp.float32) * w1 + o2.astype(jnp.float32) * w2) / denom
    return o.astype(o1.dtype), m + jnp.log(denom)


def ring_flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         scale: float, axis_name: str) -> jnp.ndarray:
    """Ring attention inside shard_map: (B, N_local, H, D) in/out.

    K/V rotate around the `axis_name` ring; n-1 ppermute steps; partials
    merge exactly.  XLA overlaps the collective permute of step i+1 with the
    attention compute of step i where scheduling allows.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)

    qt = jnp.swapaxes(q, 1, 2)  # (B, H, S, D)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    o, lse = _attn_with_lse(qt, kt, vt, scale)
    perm = [(i, (i + 1) % n) for i in range(n)]
    for _ in range(n - 1):
        kt = jax.lax.ppermute(kt, axis_name, perm)
        vt = jax.lax.ppermute(vt, axis_name, perm)
        o_i, lse_i = _attn_with_lse(qt, kt, vt, scale)
        o, lse = _merge_partials(o, lse, o_i, lse_i)
    return jnp.swapaxes(o, 1, 2)


# ---------------------------------------------------------------------------
# sequence-sharded full forward (the 1000-view path)
# ---------------------------------------------------------------------------

def make_seq_sharded_forward(cfg, mesh: Mesh, num_views: int,
                             image_hw: Tuple[int, int],
                             axis: str = "seq",
                             head_chunk_views: Optional[int] = None):
    """Build a jitted forward over `mesh` with views sharded on `axis`.

    Input imgs (1, V, H, W, 3) with V divisible by the axis size; outputs
    sharded the same way.  Encoder and heads are local to each device's
    views; the fusion decoder uses ring attention over the full sequence.
    """
    n = mesh.shape[axis]
    assert num_views % n == 0, f"views {num_views} % mesh {n} != 0"
    V_loc = num_views // n
    H, W = image_hw
    ps = cfg.encoder.patch_size
    Pq = (H // ps) * (W // ps)
    ring = functools.partial(ring_flash_attention, axis_name=axis)

    def ring_attn(q, k, v, scale):
        return ring(q, k, v, scale)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )
    def fn(params, imgs_loc):
        B = imgs_loc.shape[0]
        assert B == 1, "the 1000-view path is B=1 (reference: bs=1 inference)"
        flat = imgs_loc.reshape(B * V_loc, H, W, 3)
        feats, _ = encoder_forward(params["encoder"], cfg.encoder, flat)
        fused = feats.reshape(B, V_loc * Pq, -1)

        # global view ids for this shard; when the model uses random image
        # ids (reference has no eval gate, fast3r.py:785-790) every shard
        # samples the SAME full-length permutation from a fixed key and
        # slices its views, so ids stay globally consistent
        dcfg = cfg.decoder
        my = jax.lax.axis_index(axis)
        if getattr(dcfg, "random_image_idx_embedding", False):
            from fast3r_tpu.models.decoder import sample_random_image_ids

            all_ids = sample_random_image_ids(jax.random.key(0), 1,
                                              num_views)[0]
            view_ids = jax.lax.dynamic_slice_in_dim(all_ids, my * V_loc, V_loc)
        else:
            view_ids = my * V_loc + jnp.arange(V_loc, dtype=jnp.int32)
        image_ids = jnp.repeat(view_ids, Pq)[None]

        # decoder with ring attention
        outputs = {0: fused}
        x = linear(params["decoder"]["decoder_embed"], fused)
        table = jnp.asarray(image_idx_table(dcfg.embed_dim), dtype=x.dtype)
        x = x + table[image_ids]
        inner = [h for h in dcfg.hooks if 0 < h < dcfg.depth]
        x, hooked = run_vit_stack(
            params["decoder"]["blocks"], x, dcfg.num_heads,
            dcfg.attn_scale(is_training=False),
            rope_cos_sin=None, attn_impl=ring_attn,
            ln_eps=dcfg.block_ln_eps, hooks=inner, depth=dcfg.depth,
        )
        outputs.update(hooked)
        outputs[dcfg.depth] = layernorm(params["decoder"]["norm"], x,
                                        dcfg.final_ln_eps)

        # heads on local views
        tokens = [
            outputs[h].reshape(B, V_loc, Pq, -1).reshape(B * V_loc, Pq, -1)
            for h in cfg.decoder.hooks
        ]

        def run_heads(tok):
            g = dpt_head_forward(params["head_global"], cfg.head, tok, (H, W))
            res = {"pts3d_in_other_view": g["pts3d"]}
            if "conf" in g:
                res["conf"] = g["conf"]
            if cfg.with_local_head:
                l = dpt_head_forward(params["head_local"], cfg.head, tok, (H, W))
                res["pts3d_local"] = l["pts3d"]
                if "conf" in l:
                    res["conf_local"] = l["conf"]
            return res

        cv = None
        if head_chunk_views and V_loc > 1:
            # largest divisor of V_loc <= requested (static shapes need even
            # chunks; memory cap honored for any view count)
            cv = max(d for d in range(1, min(head_chunk_views, V_loc) + 1)
                     if V_loc % d == 0)
            if cv == V_loc:
                cv = None
        if cv is not None:
            nch = V_loc // cv
            chunked = [
                t.reshape(nch, cv, Pq, -1) for t in tokens
            ]
            res = jax.lax.map(lambda ts: run_heads(list(ts)), tuple(chunked))
            res = {k: v.reshape((V_loc,) + v.shape[2:]) for k, v in res.items()}
        else:
            res = run_heads(tokens)
        return {k: v.reshape((B, V_loc) + v.shape[1:]) for k, v in res.items()}

    return jax.jit(fn)
