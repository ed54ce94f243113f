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

def _attn_with_lse_impl(q, k, v, scale):
    from fast3r_tpu.ops import flash_attention as fa

    S, Skv = q.shape[2], k.shape[2]
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attn_with_lse(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   scale: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Attention block with normalized output + row logsumexp.

    q, k, v: (B, H, S, D).  Returns (o (B,H,S,D), lse (B,H,S,1) fp32).
    Uses the Pallas flash kernel when the shapes tile; otherwise an exact
    jnp fallback (tiny test shapes).  Differentiable in BOTH outputs — the
    lse cotangent matters because ring attention's partial-merge weights
    depend on it (see _flash_backward's dlse note).
    """
    return _attn_with_lse_impl(q, k, v, scale)


def _attn_with_lse_fwd(q, k, v, scale):
    o, lse = _attn_with_lse_impl(q, k, v, scale)
    return (o, lse), (q, k, v, o, lse)


def _attn_with_lse_bwd(scale, res, cots):
    from fast3r_tpu.ops import flash_attention as fa

    q, k, v, o, lse = res
    do, dlse = cots
    S, Skv = q.shape[2], k.shape[2]
    bq = fa._pick_block(S, fa.MAX_BLOCK_Q_BWD)
    bk = fa._pick_block(Skv, fa.MAX_BLOCK_KV_BWD)
    if bq and bk:
        return fa._flash_backward(q, k, v, o, lse, do, scale, bq, bk,
                                  dlse=dlse)
    # exact jnp fallback (tiny test shapes)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jnp.exp(logits - lse)  # (B,H,S,Skv) fp32
    do32 = do.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, do32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", do32, v.astype(jnp.float32))
    delta = jnp.sum(do32 * o.astype(jnp.float32), axis=-1, keepdims=True)
    ds = p * (dp - delta + dlse.astype(jnp.float32))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_attn_with_lse.defvjp(_attn_with_lse_fwd, _attn_with_lse_bwd)


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

    qt = jnp.swapaxes(q, 1, 2)  # (B, H, S, D)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)

    perm = [(i, (i + 1) % n) for i in range(n)]
    # double-buffered ring: issue the NEXT hop's permute before this hop's
    # attention — the two only share a read of (kt, vt), so XLA's
    # latency-hiding scheduler can run the ICI transfer under the compute
    kt_next = jax.lax.ppermute(kt, axis_name, perm)
    vt_next = jax.lax.ppermute(vt, axis_name, perm)
    o, lse = _attn_with_lse(qt, kt, vt, scale)
    for step in range(n - 1):
        kt, vt = kt_next, vt_next
        if step < n - 2:
            kt_next = jax.lax.ppermute(kt, axis_name, perm)
            vt_next = jax.lax.ppermute(vt, axis_name, perm)
        o_i, lse_i = _attn_with_lse(qt, kt, vt, scale)
        o, lse = _merge_partials(o, lse, o_i, lse_i)
    return jnp.swapaxes(o, 1, 2)


# ---------------------------------------------------------------------------
# sequence-sharded full forward (the 1000-view path)
# ---------------------------------------------------------------------------

def make_seq_sharded_forward(cfg, mesh: Mesh, num_views: int,
                             image_hw: Tuple[int, int],
                             axis: str = "seq",
                             head_chunk_views: Optional[int] = None,
                             ring_impl: str = "xla"):
    """Build a jitted forward over `mesh` with views sharded on `axis`.

    Input imgs (1, V, H, W, 3) with V divisible by the axis size; outputs
    sharded the same way.  Encoder and heads are local to each device's
    views; the fusion decoder uses ring attention over the full sequence.

    ring_impl: "xla" = ppermute between flash-kernel calls (double-buffered
    schedule, overlap at the XLA scheduler's discretion; differentiable);
    "rdma" = the in-kernel interconnect ring (parallel/ring_rdma.py) with
    structural transfer/compute overlap (forward-only — this builder is the
    inference path, so that is sufficient).
    """
    n = mesh.shape[axis]
    assert num_views % n == 0, f"views {num_views} % mesh {n} != 0"
    V_loc = num_views // n
    H, W = image_hw
    ps = cfg.encoder.patch_size
    Pq = (H // ps) * (W // ps)
    if ring_impl == "rdma":
        from fast3r_tpu.parallel.ring_rdma import ring_flash_attention_rdma

        ring = functools.partial(ring_flash_attention_rdma, axis_name=axis,
                                 axis_size=n)
    else:
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


# ---------------------------------------------------------------------------
# sequence-sharded TRAINING step (long-sequence multi-chip training)
# ---------------------------------------------------------------------------

def _psum_masked_mean(x, mask, axis_name):
    """Per-sample masked mean over (V_loc, H, W) with the reduction completed
    across the sequence axis: matches losses._joint_norm_factor's per-sample
    'avg_dis' on the full view set."""
    m = mask.astype(x.dtype)
    B = x.shape[0]
    s = jax.lax.psum(jnp.sum((x * m).reshape(B, -1), axis=-1), axis_name)
    n = jax.lax.psum(jnp.sum(m.reshape(B, -1), axis=-1), axis_name)
    return jnp.where(n > 0, s / jnp.maximum(n, 1.0), 0.0)


def seq_sharded_conf_loss(gts_loc, preds_loc, loss_cfg, axis_name,
                          data_axis=None):
    """ConfLossMultiviewV2 (train/losses.py) with views sharded on
    `axis_name`: the anchor pose is all-gathered from shard 0, the joint
    'avg_dis' normalization factors reduce via psum, the local branch stays
    per-(sample, view), and the final mean over (view, branch) terms reduces
    via psum.  Exact vs the single-device loss (reduction order aside).

    data_axis: optional batch-sharding axis — the reference's per-view
    masked means pool the batch with the pixels (losses.py:819-827), so the
    per-view sums/counts also psum over the data axis."""
    from fast3r_tpu.ops.geometry import geotrf, se3_inverse
    from fast3r_tpu.train.losses import _perview_norm_factor

    gt_pts = gts_loc["pts3d"].astype(jnp.float32)
    valid = gts_loc["valid_mask"]
    poses = gts_loc["camera_pose"].astype(jnp.float32)
    B, V_loc = gt_pts.shape[:2]

    # anchor = GLOBAL view 0 == shard 0's local view 0
    pose0_all = jax.lax.all_gather(poses[:, 0], axis_name)  # (n, B, 4, 4)
    inv_anchor = se3_inverse(pose0_all[0])

    gt_global = geotrf(inv_anchor, gt_pts.reshape(B, -1, 3)
                       ).reshape(gt_pts.shape)
    pr_global = preds_loc["pts3d_in_other_view"].astype(jnp.float32)

    def joint_nf(pts):
        dis = jnp.linalg.norm(pts, axis=-1)
        return jnp.maximum(
            _psum_masked_mean(dis, valid, axis_name), 1e-8)

    pr_g = pr_global / joint_nf(pr_global)[:, None, None, None, None]
    if not loss_cfg.gt_scale:
        gt_g = gt_global / joint_nf(gt_global)[:, None, None, None, None]
    else:
        gt_g = gt_global
    pixel = {"global": jnp.linalg.norm(pr_g - gt_g, axis=-1)}

    if loss_cfg.with_local and "pts3d_local" in preds_loc:
        inv_local = se3_inverse(poses.reshape(B * V_loc, 4, 4))
        gt_local = geotrf(inv_local, gt_pts.reshape(B * V_loc, -1, 3)
                          ).reshape(gt_pts.shape)
        pr_local = preds_loc["pts3d_local"].astype(jnp.float32)
        nf_prl = _perview_norm_factor(pr_local, valid, loss_cfg.norm_mode)
        pr_l = pr_local / nf_prl[:, :, None, None, None]
        if not loss_cfg.gt_scale:
            nf_gtl = _perview_norm_factor(gt_local, valid, loss_cfg.norm_mode)
            gt_l = gt_local / nf_gtl[:, :, None, None, None]
        else:
            gt_l = gt_local
        pixel["local"] = jnp.linalg.norm(pr_l - gt_l, axis=-1)

    branch_confs = [("global", "conf")]
    if "local" in pixel:
        branch_confs.append(("local", "conf_local"))
    term_sum = jnp.float32(0.0)
    n_terms = jnp.float32(0.0)
    vm = valid.astype(jnp.float32)
    for branch, ckey in branch_confs:
        conf = preds_loc[ckey].astype(jnp.float32)
        px = pixel[branch] * conf - loss_cfg.alpha * jnp.log(conf)
        # per-view masked mean over (B, H, W) jointly (losses.py comment)
        s = jnp.sum((px * vm).reshape(B, V_loc, -1).sum(0), axis=-1)
        c = jnp.sum(vm.reshape(B, V_loc, -1).sum(0), axis=-1)
        if data_axis is not None:  # pool the batch across data shards
            s = jax.lax.psum(s, data_axis)
            c = jax.lax.psum(c, data_axis)
        per_view = jnp.where(c > 0, s / jnp.maximum(c, 1.0), 0.0)  # (V_loc,)
        term_sum = term_sum + per_view.sum()
        n_terms = n_terms + jnp.float32(V_loc)
    total = (jax.lax.psum(term_sum, axis_name)
             / jax.lax.psum(n_terms, axis_name))
    return total


def make_seq_sharded_train_step(cfg, optim_cfg, mesh: Mesh,
                                loss_cfg=None, axis: str = "seq",
                                data_axis=None,
                                remat: bool = True,
                                ring_impl: str = "xla"):
    """Jitted training step with the view sequence sharded over `mesh[axis]`.

    This is the multi-chip long-sequence training path (e.g. many-view
    512-res training whose fused activations exceed one chip's HBM): the
    encoder and DPT heads run on each device's local views, the fusion
    decoder's global attention is the differentiable ring (custom-VJP flash
    blocks + online-softmax merges), and the loss reduces across shards via
    psum.  Landscape-only batches (the training layout); B = 1 per shard
    group.  Gradients of the replicated params all-reduce automatically via
    shard_map's transpose of the replicated in_spec.

    ring_impl: "xla" = the differentiable ppermute ring (custom-VJP flash
    blocks + online-softmax merges).  "rdma" (r5) = the in-kernel
    interconnect ring with a full backward: forward is the bounded-slot
    RDMA kernel, backward the dq + dkv ring kernels riding the same
    protocol (parallel/ring_rdma.py ring_flash_attention_rdma_diff);
    gradients match the XLA ring (tests/test_sequence_parallel.py).
    """
    from fast3r_tpu.models.decoder import sample_random_image_ids
    from fast3r_tpu.train.losses import LossConfig
    from fast3r_tpu.train.step import TrainState, make_optimizer

    loss_cfg = loss_cfg or LossConfig()
    tx = make_optimizer(optim_cfg)
    n = mesh.shape[axis]
    n_data = mesh.shape[data_axis] if data_axis else 1
    if ring_impl == "rdma":
        from fast3r_tpu.parallel.ring_rdma import (
            ring_flash_attention_rdma_diff,
        )

        # positional call: custom_vjp nondiff_argnums are position-resolved
        def ring(q, k, v, s, _axis=axis, _n=n):
            return ring_flash_attention_rdma_diff(q, k, v, s, _axis, _n)
    elif ring_impl == "xla":
        ring = functools.partial(ring_flash_attention, axis_name=axis)
    else:
        raise ValueError(f"unknown ring_impl {ring_impl!r}")

    def per_shard_loss(params, batch_loc, step_rng):
        imgs = batch_loc["imgs"]
        B, V_loc, H, W = imgs.shape[:4]
        assert B == 1, "sequence-sharded training is per-sample (B=1)"
        V = V_loc * n
        ps = cfg.encoder.patch_size
        Pq = (H // ps) * (W // ps)
        dcfg = cfg.decoder

        flat = imgs.reshape(B * V_loc, H, W, 3)
        feats, _ = encoder_forward(params["encoder"], cfg.encoder, flat,
                                   remat=remat)
        fused = feats.reshape(B, V_loc * Pq, -1)

        my = jax.lax.axis_index(axis)
        row = jax.lax.axis_index(data_axis) if data_axis else 0
        if getattr(dcfg, "random_image_idx_embedding", False):
            # every shard samples the SAME full (B_total, V) id table from
            # the replicated step rng, then slices its batch row and views —
            # identical ids to the single-device forward (fast3r.py:216)
            all_ids = sample_random_image_ids(step_rng, n_data * B, V)
            all_ids = jax.lax.dynamic_index_in_dim(all_ids, row,
                                                   keepdims=False)
            view_ids = jax.lax.dynamic_slice_in_dim(all_ids, my * V_loc,
                                                    V_loc)
        else:
            view_ids = my * V_loc + jnp.arange(V_loc, dtype=jnp.int32)
        image_ids = jnp.repeat(view_ids, Pq)[None]

        outputs = {0: fused}
        x = linear(params["decoder"]["decoder_embed"], fused)
        table = jnp.asarray(image_idx_table(dcfg.embed_dim), dtype=x.dtype)
        x = x + table[image_ids]
        inner = [h for h in dcfg.hooks if 0 < h < dcfg.depth]
        x, hooked = run_vit_stack(
            params["decoder"]["blocks"], x, dcfg.num_heads,
            dcfg.attn_scale(is_training=True),
            rope_cos_sin=None, attn_impl=lambda q, k, v, s: ring(q, k, v, s),
            ln_eps=dcfg.block_ln_eps, hooks=inner, depth=dcfg.depth,
            remat=remat,
        )
        outputs.update(hooked)
        outputs[dcfg.depth] = layernorm(params["decoder"]["norm"], x,
                                        dcfg.final_ln_eps)

        tokens = [outputs[h].reshape(B * V_loc, Pq, -1)
                  for h in cfg.decoder.hooks]
        g = dpt_head_forward(params["head_global"], cfg.head, tokens, (H, W))
        preds = {
            "pts3d_in_other_view":
                g["pts3d"].reshape(B, V_loc, H, W, 3),
            "conf": g["conf"].reshape(B, V_loc, H, W),
        }
        if cfg.with_local_head:
            l = dpt_head_forward(params["head_local"], cfg.head, tokens,
                                 (H, W))
            preds["pts3d_local"] = l["pts3d"].reshape(B, V_loc, H, W, 3)
            preds["conf_local"] = l["conf"].reshape(B, V_loc, H, W)

        gts_loc = {
            "pts3d": batch_loc["pts3d"],
            "valid_mask": batch_loc["valid_mask"],
            "camera_pose": batch_loc["camera_pose"],
        }
        return seq_sharded_conf_loss(gts_loc, preds, loss_cfg, axis,
                                     data_axis=data_axis)

    batch_keys = ("imgs", "pts3d", "valid_mask", "camera_pose")
    batch_spec = P(data_axis, axis)
    sharded_loss = jax.shard_map(
        per_shard_loss,
        mesh=mesh,
        in_specs=(P(), {k: batch_spec for k in batch_keys}, P()),
        out_specs=P(),
        check_vma=False,
    )

    def step(state, batch):
        import optax

        rng, step_rng = jax.random.split(state.rng)
        step_rng = jax.random.fold_in(step_rng, state.step)
        batch = {k: batch[k] for k in batch_keys}

        loss, grads = jax.value_and_grad(
            lambda p: sharded_loss(p, batch, step_rng))(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        # same non-finite skip guard as train_step (reference
        # multiview_dust3r_module.py:195-205)
        grad_norm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        updates = jax.tree.map(
            lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates)
        new_opt_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            new_opt_state, state.opt_state)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": grad_norm,
                   "skipped_nonfinite": (~finite).astype(jnp.int32)}
        return TrainState(params=new_params, opt_state=new_opt_state,
                          step=state.step + 1, rng=rng), metrics

    return jax.jit(step, donate_argnums=(0,))
