"""Fast3R top-level model: N images -> per-view global+local pointmaps + confidence.

Behavioral reference: fast3r/models/fast3r.py:45-497 (class Fast3R).
Composition: CroCoEncoder -> Fast3RDecoder (global fusion) -> two DPT heads
("global" head predicting pts3d in view-0's frame, "local" head predicting
pts3d in each view's own camera frame), each wrapped in the
transpose-to-landscape orientation logic (dust3r/utils/misc.py:61-110).

Output contract per view (README.md:129-131):
  pts3d_in_other_view (B, H, W, 3)   global-frame pointmap
  conf                (B, H, W)      in [1, inf)
  pts3d_local         (B, H, W, 3)   own-camera-frame pointmap
  conf_local          (B, H, W)

TPU design: the whole forward is ONE jitted function over static shapes
(B, V, H, W).  The reference's chunking knobs (encoder chunk 400 images,
head chunk 25 views — fast3r.py:250-300) exist to bound GPU memory; here they
map to optional lax.map chunking for very large V and to sharding decisions in
fast3r_tpu/parallel.  Mixed portrait/landscape batches run the head in both
orientations and select per sample (static `mixed_orientation` flag — the
all-landscape fast path skips the second head pass entirely).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from fast3r_tpu.models.decoder import (
    DecoderConfig,
    decoder_forward,
    init_decoder,
    sample_random_image_ids,
)
from fast3r_tpu.models.dpt_head import (
    DPTHeadConfig,
    dpt_head_forward,
    init_dpt_head,
)
from fast3r_tpu.models.encoder import EncoderConfig, encoder_forward, init_encoder

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class Fast3RConfig:
    encoder: EncoderConfig = EncoderConfig()
    decoder: Any = DecoderConfig()  # DecoderConfig | LlamaDecoderConfig
    head: DPTHeadConfig = DPTHeadConfig()
    with_local_head: bool = True
    landscape_only: bool = True  # head orientation handling (misc.py:61-110)

    @property
    def decoder_type(self) -> str:
        from fast3r_tpu.models.llama_decoder import LlamaDecoderConfig

        return "llama" if isinstance(self.decoder, LlamaDecoderConfig) else "fast3r"

    @property
    def encoder_type(self) -> str:
        from fast3r_tpu.models.dino_encoder import DinoEncoderConfig

        return "dino" if isinstance(self.encoder, DinoEncoderConfig) else "croco"

    @staticmethod
    def flagship(attn_impl: str = "pallas") -> "Fast3RConfig":
        """ViT-L/16 encoder + 1024x24 fusion decoder + dual DPT heads
        (configs/experiment/super_long_training/super_long_training.yaml).

        The encoder keeps its "batched" default (manual-DMA packed kernel
        for the per-view heads, ops/batched_attention.py) when `attn_impl`
        is the TPU default "pallas"; the fused decoder uses `attn_impl`
        (flash for the large fused sequence).
        """
        enc = EncoderConfig(embed_dim=1024, num_heads=16, depth=24,
                            attn_impl="batched" if attn_impl == "pallas"
                            else attn_impl)
        dec = DecoderConfig(enc_embed_dim=1024, embed_dim=1024, num_heads=16,
                            depth=24, attn_impl=attn_impl)
        head = DPTHeadConfig(dim_tokens=(enc.embed_dim, dec.embed_dim,
                                         dec.embed_dim, dec.embed_dim))
        return Fast3RConfig(encoder=enc, decoder=dec, head=head)

    @staticmethod
    def base() -> "Fast3RConfig":
        """Default config (configs/model/fast3r.yaml): ViT-L encoder, 768x12
        decoder, single global head."""
        enc = EncoderConfig(embed_dim=1024, num_heads=16, depth=24)
        dec = DecoderConfig(enc_embed_dim=1024, embed_dim=768, num_heads=12,
                            depth=12)
        head = DPTHeadConfig(dim_tokens=(enc.embed_dim, dec.embed_dim,
                                         dec.embed_dim, dec.embed_dim))
        return Fast3RConfig(encoder=enc, decoder=dec, head=head,
                            with_local_head=False)

    @staticmethod
    def tiny(with_local_head: bool = True) -> "Fast3RConfig":
        """Small config for tests (depth must be >9 in the reference factory,
        fast3r.py:137; we relax to 4 with hooks scaled accordingly)."""
        enc = EncoderConfig(img_size=64, embed_dim=64, num_heads=2, depth=2)
        dec = DecoderConfig(enc_embed_dim=64, embed_dim=64, num_heads=2, depth=4)
        head = DPTHeadConfig(dim_tokens=(64, 64, 64, 64), feature_dim=32,
                             last_dim=16, layer_dims=(8, 16, 24, 32))
        return Fast3RConfig(encoder=enc, decoder=dec, head=head,
                            with_local_head=with_local_head)


def init_fast3r(key, cfg: Fast3RConfig, dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if cfg.decoder_type == "llama":
        from fast3r_tpu.models.llama_decoder import init_llama_decoder

        dec = init_llama_decoder(k2, cfg.decoder, dtype)
    else:
        dec = init_decoder(k2, cfg.decoder, dtype)
    if cfg.encoder_type == "dino":
        from fast3r_tpu.models.dino_encoder import init_dino_encoder

        enc = init_dino_encoder(k1, cfg.encoder, dtype)
    else:
        enc = init_encoder(k1, cfg.encoder, dtype)
    params = {
        "encoder": enc,
        "decoder": dec,
        "head_global": init_dpt_head(k3, cfg.head, dtype),
    }
    if cfg.with_local_head:
        params["head_local"] = init_dpt_head(k4, cfg.head, dtype)
    return params


def freeze_mask(params: Params, cfg: Fast3RConfig, freeze: str) -> Params:
    """Trainability mask for optax.masked — the set_freeze equivalent
    (reference fast3r.py:241-248): "none" trains everything, "encoder"
    freezes the encoder, "sandwich" freezes encoder + global head.

    Returns a pytree of bools (True = trainable).
    """
    frozen_roots = {
        "none": set(),
        "encoder": {"encoder"},
        "sandwich": {"encoder", "head_global"},
    }[freeze]

    def mask_subtree(sub, trainable):
        return jax.tree.map(lambda _: trainable, sub)

    return {
        k: mask_subtree(v, k not in frozen_roots) for k, v in params.items()
    }


def _run_head_oriented(head_params, head_cfg, hook_tokens, H, W,
                       is_portrait=None, mixed_orientation=False):
    """transpose_to_landscape equivalent (misc.py:61-110).

    hook_tokens: list of (N, P, C).  All-landscape: run at (H, W).  Mixed: also
    run at (W, H) with transposed output, select per sample by `is_portrait`.
    """
    res_l = dpt_head_forward(head_params, head_cfg, hook_tokens, (H, W))
    if not mixed_orientation:
        return res_l
    res_p = dpt_head_forward(head_params, head_cfg, hook_tokens, (W, H))
    res_p = {k: jnp.swapaxes(v, 1, 2) for k, v in res_p.items()}
    out = {}
    for k in res_l:
        sel = is_portrait.reshape((-1,) + (1,) * (res_l[k].ndim - 1))
        out[k] = jnp.where(sel, res_p[k], res_l[k])
    return out


def fast3r_forward(
    params: Params,
    cfg: Fast3RConfig,
    imgs: jnp.ndarray,
    true_shapes: Optional[jnp.ndarray] = None,
    is_training: bool = False,
    rng: Optional[jax.Array] = None,
    mixed_orientation: bool = False,
    remat: bool = False,
    head_chunk_views: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """Full Fast3R forward pass (reference fast3r.py:302-497).

    Args:
      imgs: (B, V, H, W, 3) normalized images, landscape storage layout.
      true_shapes: (B, V, 2) int (h, w); defaults to storage shape.
      is_training: enables random image-index ids (requires `rng`) and the
        training attention scale.
      mixed_orientation: static flag — set True iff the batch contains
        portrait samples (host knows this before dispatch).
      head_chunk_views: if set, run the DPT heads lax.map-chunked over groups
        of this many views (B*chunk leading dim per step) to bound memory for
        very large V (reference max_parallel_views_for_head=25, fast3r.py:68).

    Returns:
      dict of stacked per-view outputs:
        pts3d_in_other_view (B, V, H, W, 3), conf (B, V, H, W),
        [pts3d_local, conf_local if with_local_head].
    """
    B, V, H, W, _ = imgs.shape
    if true_shapes is None:
        true_shapes = jnp.broadcast_to(
            jnp.array([H, W], jnp.int32)[None, None], (B, V, 2)
        )

    # ---- encoder over all B*V images (fast3r.py:250-296) ----
    flat_imgs = imgs.reshape(B * V, H, W, 3)
    flat_shapes = true_shapes.reshape(B * V, 2)
    # per-stack dropout rngs (reference Block knobs, blocks.py:196-239).
    # Split ONLY when a rate is non-zero so the zero-dropout rng stream
    # (image-id sampling below) is bit-identical to prior releases.
    enc_rng = dec_rng = None
    if is_training and rng is not None and any(
            getattr(c, k, 0.0) > 0.0
            for c in (cfg.encoder, cfg.decoder)
            for k in ("drop", "attn_drop", "drop_path")):
        rng, enc_rng, dec_rng = jax.random.split(rng, 3)
    if cfg.encoder_type == "dino":
        from fast3r_tpu.models.dino_encoder import dino_encoder_forward

        feats, _pos = dino_encoder_forward(params["encoder"], cfg.encoder,
                                           flat_imgs, flat_shapes)
    else:
        feats, _pos = encoder_forward(params["encoder"], cfg.encoder,
                                      flat_imgs, flat_shapes, remat=remat,
                                      rng=enc_rng)
    P = feats.shape[1]
    fused = feats.reshape(B, V * P, -1)

    # ---- image ids (fast3r.py:330-348, 715-766) ----
    # NOTE: the reference decoder samples random ids whenever
    # random_image_idx_embedding is set, with NO eval gate (fast3r.py:785-790)
    # — published-checkpoint inference runs under random ids too.  We match
    # that; at inference a fixed default key keeps outputs deterministic.
    use_random_ids = (
        cfg.decoder_type == "fast3r" and cfg.decoder.random_image_idx_embedding
    )
    if use_random_ids:
        if rng is None:
            assert not is_training, "training forward needs an rng for image ids"
            rng = jax.random.key(0)
        view_ids = sample_random_image_ids(rng, B, V)  # (B, V)
    else:
        # for the llama decoder the random ids are drawn inside its forward
        # (they feed rope, while these ids feed the view-0 mask)
        view_ids = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32)[None], (B, V))
    image_ids = jnp.repeat(view_ids, P, axis=1)  # (B, V*P)

    # ---- fusion decoder (fast3r.py:768-808) ----
    if cfg.decoder_type == "llama":
        from fast3r_tpu.models.llama_decoder import llama_decoder_forward

        dec_out = llama_decoder_forward(
            params["decoder"], cfg.decoder, fused, image_ids,
            rng=rng, num_views=V,
        )
    else:
        dec_out = decoder_forward(params["decoder"], cfg.decoder, fused,
                                  image_ids, is_training=is_training,
                                  remat=remat, rng=dec_rng)

    # ---- heads (fast3r.py:365-485) ----
    hooks = cfg.decoder.hooks
    hook_seq = [dec_out[h] for h in hooks]  # each (B, V*P, C)
    is_portrait = (flat_shapes[:, 1] < flat_shapes[:, 0]) if mixed_orientation else None

    def run_heads(tokens, portrait_mask):
        res = {}
        g = _run_head_oriented(params["head_global"], cfg.head, tokens, H, W,
                               portrait_mask, mixed_orientation)
        res["pts3d_in_other_view"] = g["pts3d"]
        if "conf" in g:
            res["conf"] = g["conf"]
        if cfg.with_local_head:
            l = _run_head_oriented(params["head_local"], cfg.head, tokens, H, W,
                                   portrait_mask, mixed_orientation)
            res["pts3d_local"] = l["pts3d"]
            if "conf" in l:
                res["conf_local"] = l["conf"]
        return res

    if head_chunk_views is not None and V > 1:
        # round the requested chunk down to the largest divisor of V so the
        # memory cap is honored for any view count (the reference allows a
        # ragged last chunk; static shapes require even chunks)
        cv = max(d for d in range(1, min(head_chunk_views, V) + 1)
                 if V % d == 0)
        if cv == V:
            head_chunk_views = None
    if head_chunk_views is not None and V > 1:
        nchunks = V // cv
        # slice each chunk's tokens inside the map body — materializing a full
        # regrouped copy of every hook tensor would double HBM (at 1000 views
        # the hooks alone are ~5 GB)
        if is_portrait is not None:
            pmask_chunks = (
                is_portrait.reshape(B, nchunks, cv).swapaxes(0, 1)
                .reshape(nchunks, B * cv)
            )
        else:
            pmask_chunks = jnp.zeros((nchunks, 1), bool)

        def chunk_fn(args):
            ci, pmask = args
            toks = [
                jax.lax.dynamic_slice_in_dim(t, ci * cv * P, cv * P, axis=1)
                   .reshape(B, cv, P, -1).reshape(B * cv, P, -1)
                for t in hook_seq
            ]
            return run_heads(toks, pmask if mixed_orientation else None)

        res = jax.lax.map(
            chunk_fn, (jnp.arange(nchunks, dtype=jnp.int32), pmask_chunks)
        )
        # (nchunks, B*cv, ...) -> (B, V, ...)
        res = {
            k: v.reshape((nchunks, B, cv) + v.shape[2:])
                 .swapaxes(0, 1)
                 .reshape((B, V) + v.shape[2:])
            for k, v in res.items()
        }
        return res

    hook_tokens = [
        t.reshape(B, V, P, -1).reshape(B * V, P, -1) for t in hook_seq
    ]
    res = run_heads(hook_tokens, is_portrait)
    return {k: v.reshape((B, V) + v.shape[1:]) for k, v in res.items()}
