"""Public inference API: Fast3R model wrapper + `inference(views, model, ...)`.

Behavioral reference: fast3r/dust3r/inference_multiview.py:22-99 (inference /
loss_of_one_batch) and the README public API (README.md:75-131):

    model = Fast3R.from_pretrained(ckpt_dir_or_hf_repo)
    images = load_images(filelist, size=512)
    output = inference(images, model, dtype, profiling=...)
    # output = {"views": [...], "preds": [{pts3d_in_other_view, conf,
    #            pts3d_local, conf_local}, ...]} (+ profiling dict)

TPU design: every distinct shape composition compiles one XLA program
(cached).  Same-shape views run the fully batched path; mixed shapes follow
the reference's bs=1 behavior (inference_multiview.py:80-82) with per-group
encoders feeding one fused decoder sequence.  `profiling=True` returns the
reference's profiling_info keys (encode_images_time, decoder_time,
head_forward_time, total_time) measured with block_until_ready barriers
(SURVEY.md §5.1).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fast3r_tpu.models.decoder import DecoderConfig, decoder_forward
from fast3r_tpu.models.dpt_head import DPTHeadConfig, dpt_head_forward
from fast3r_tpu.models.encoder import EncoderConfig, encoder_forward
from fast3r_tpu.models.fast3r import Fast3RConfig, fast3r_forward, init_fast3r
from fast3r_tpu.utils.checkpoint import params_from_fast3r_checkpoint


def config_from_reference_args(
    encoder_args: Dict, decoder_args: Dict, head_args: Dict,
    attn_impl: str = "xla",
) -> Fast3RConfig:
    """Build a Fast3RConfig from the reference's *_args dicts (the HF
    checkpoint config.json format, fast3r/models/fast3r.py:50-70)."""
    if encoder_args.get("encoder_type", "croco") == "dino":
        from fast3r_tpu.models.dino_encoder import DinoEncoderConfig

        # the reference DinoEncoder pins a hub ViT-L/14 (fast3r.py:561-570);
        # dims are overridable here for tests
        enc = DinoEncoderConfig(
            patch_size=encoder_args.get("patch_size", 14),
            embed_dim=encoder_args.get("embed_dim", 1024),
            depth=encoder_args.get("depth", 24),
            num_heads=encoder_args.get("num_heads", 16),
            mlp_ratio=encoder_args.get("mlp_ratio", 4.0),
            pos_embed_size=encoder_args.get("pos_embed_size", 37),
            attn_impl=attn_impl,
        )
        return _assemble_config(enc, decoder_args, head_args, attn_impl)
    enc = EncoderConfig(
        img_size=encoder_args.get("img_size", 512),
        patch_size=encoder_args.get("patch_size", 16),
        patch_embed_cls=encoder_args.get("patch_embed_cls", "ManyAR_PatchEmbed"),
        embed_dim=encoder_args.get("embed_dim", 1024),
        num_heads=encoder_args.get("num_heads", 16),
        depth=encoder_args.get("depth", 24),
        mlp_ratio=encoder_args.get("mlp_ratio", 4),
        rope_base=float(str(encoder_args.get("pos_embed", "RoPE100"))[len("RoPE"):]),
        attn_impl=attn_impl,
        drop=encoder_args.get("drop", 0.0),
        attn_drop=encoder_args.get("attn_drop", 0.0),
        drop_path=encoder_args.get("drop_path", 0.0),
    )
    return _assemble_config(enc, decoder_args, head_args, attn_impl)


def _assemble_config(enc, decoder_args: Dict, head_args: Dict,
                     attn_impl: str) -> Fast3RConfig:
    if decoder_args.get("decoder_type", "fast3r") == "llama":
        from fast3r_tpu.models.llama_decoder import LlamaDecoderConfig

        dec = LlamaDecoderConfig(
            enc_embed_dim=decoder_args.get("enc_embed_dim", enc.embed_dim),
            embed_dim=decoder_args.get("embed_dim", 1024),
            n_layers=decoder_args.get("n_layers", 24),
            n_heads=decoder_args.get("n_heads", 16),
            n_kv_heads=decoder_args.get("n_kv_heads"),
            multiple_of=decoder_args.get("multiple_of", 256),
            ffn_dim_multiplier=decoder_args.get("ffn_dim_multiplier"),
            norm_eps=decoder_args.get("norm_eps", 1e-5),
            rope_theta=decoder_args.get("rope_theta", 10000.0),
            max_seq_len=decoder_args.get("max_seq_len", 1000),
            random_image_idx_embedding=decoder_args.get(
                "random_image_idx_embedding", True),
            attn_impl=attn_impl,
        )
    else:
        dec = DecoderConfig(
            enc_embed_dim=decoder_args.get("enc_embed_dim", enc.embed_dim),
            embed_dim=decoder_args.get("embed_dim", 768),
            num_heads=decoder_args.get("num_heads", 12),
            depth=decoder_args.get("depth", 12),
            mlp_ratio=decoder_args.get("mlp_ratio", 4.0),
            qkv_bias=decoder_args.get("qkv_bias", True),
            random_image_idx_embedding=decoder_args.get(
                "random_image_idx_embedding", True
            ),
            attn_bias_for_inference_enabled=decoder_args.get(
                "attn_bias_for_inference_enabled", True
            ),
            attn_impl=attn_impl,
            # reference Fast3RDecoder knobs (fast3r.py:664-665); drop_path
            # extends them per-Block (blocks.py:206)
            drop=decoder_args.get("drop", 0.0),
            attn_drop=decoder_args.get("attn_drop", 0.0),
            drop_path=decoder_args.get("drop_path", 0.0),
        )
    head = DPTHeadConfig(
        patch_size=head_args.get("patch_size", 16),
        num_channels=3 + bool(head_args.get("conf_mode", ("exp", 1, float("inf")))),
        dim_tokens=(enc.embed_dim, dec.embed_dim, dec.embed_dim, dec.embed_dim),
        depth_mode=tuple(head_args.get("depth_mode", ("exp", -float("inf"), float("inf")))),
        conf_mode=tuple(head_args.get("conf_mode", ("exp", 1, float("inf")))),
    )
    return Fast3RConfig(
        encoder=enc, decoder=dec, head=head,
        with_local_head=head_args.get("with_local_head", False),
        landscape_only=head_args.get("landscape_only", True),
    )


class Fast3R:
    """Parameter + config container with the reference's loading entry points."""

    def __init__(self, cfg: Fast3RConfig, params, dtype=jnp.float32):
        self.cfg = cfg
        self.params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
        self.dtype = dtype
        self._jit_cache: Dict[Tuple, Any] = {}

    # ---- loading -----------------------------------------------------------
    @classmethod
    def from_random(cls, cfg: Optional[Fast3RConfig] = None, seed: int = 0,
                    dtype=jnp.float32) -> "Fast3R":
        cfg = cfg or Fast3RConfig.flagship()
        return cls(cfg, init_fast3r(jax.random.key(seed), cfg, jnp.float32),
                   dtype)

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path: str,
                        dtype=jnp.float32, attn_impl: str = "xla") -> "Fast3R":
        """Load an HF-format Fast3R checkpoint (config.json + weights).

        Accepts a local directory (config.json + model.safetensors /
        pytorch_model.bin) or an HF hub repo id (downloaded via
        huggingface_hub when network access exists).
        """
        path = pretrained_model_name_or_path
        if not os.path.isdir(path):
            from huggingface_hub import snapshot_download

            path = snapshot_download(repo_id=path)
        with open(os.path.join(path, "config.json")) as f:
            hf_cfg = json.load(f)
        cfg = config_from_reference_args(
            hf_cfg["encoder_args"], hf_cfg["decoder_args"], hf_cfg["head_args"],
            attn_impl=attn_impl,
        )
        sd = _load_state_dict_file(path)
        params = params_from_fast3r_checkpoint(sd, cfg)
        return cls(cfg, params, dtype)

    # ---- forward -----------------------------------------------------------
    def __call__(self, views: Sequence[Dict], profiling: bool = False):
        return forward_views(self, views, profiling=profiling)


def _load_state_dict_file(path: str) -> Dict[str, np.ndarray]:
    st = os.path.join(path, "model.safetensors")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        return load_file(st)
    for name in ("pytorch_model.bin", "model.pt", "model.pth"):
        p = os.path.join(path, name)
        if os.path.exists(p):
            import torch

            sd = torch.load(p, map_location="cpu", weights_only=True)
            if "state_dict" in sd:
                sd = sd["state_dict"]
            return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"no weights file found under {path}")


# ---------------------------------------------------------------------------
# the variable-shape fused forward
# ---------------------------------------------------------------------------

def _inference_image_ids(dec_cfg, patch_counts):
    """Per-token image ids for the decoder embedding lookup.

    The reference samples RANDOM non-repeating ids (view 0 pinned to 0) even
    at inference when random_image_idx_embedding is set (fast3r.py:785-790);
    a fixed key keeps results deterministic across calls.
    """
    from fast3r_tpu.models.decoder import sample_random_image_ids

    V = len(patch_counts)
    if getattr(dec_cfg, "random_image_idx_embedding", False):
        vids = sample_random_image_ids(jax.random.key(0), 1, V)[0]
    else:
        vids = jnp.arange(V, dtype=jnp.int32)
    return jnp.concatenate([
        jnp.full((patch_counts[i],), vids[i], jnp.int32) for i in range(V)
    ])[None]

def _views_to_arrays(views: Sequence[Dict]) -> Tuple[List[np.ndarray], List[Tuple[int, int]]]:
    """Extract (1, H, W, 3) channel-last arrays + true (h, w) per view."""
    imgs, shapes = [], []
    for v in views:
        img = np.asarray(v["img"], dtype=np.float32)
        if img.ndim == 4 and img.shape[1] == 3 and img.shape[-1] != 3:
            img = img.transpose(0, 2, 3, 1)  # accept torch NCHW layout
        assert img.ndim == 4 and img.shape[0] == 1 and img.shape[-1] == 3, img.shape
        imgs.append(img)
        ts = np.asarray(v.get("true_shape", [[img.shape[1], img.shape[2]]]))
        shapes.append((int(ts.reshape(-1)[0]), int(ts.reshape(-1)[1])))
    return imgs, shapes


def _make_encoder_fn(cfg: Fast3RConfig):
    """Per-variant encoder dispatch for the serving path (croco uses the
    inference patch-embed override, reference checkpoint_utils.py:36-38;
    dino has no such knob)."""
    if cfg.encoder_type == "dino":
        from fast3r_tpu.models.dino_encoder import dino_encoder_forward

        def encode(params, batch):
            feats, _ = dino_encoder_forward(params["encoder"], cfg.encoder,
                                            batch)
            return feats
    else:
        enc_cfg = EncoderConfig(
            **{**cfg.encoder.__dict__, "patch_embed_cls": "PatchEmbedDust3R"}
        )

        def encode(params, batch):
            feats, _ = encoder_forward(params["encoder"], enc_cfg, batch)
            return feats
    return encode


def _decode_hooks(params, cfg: Fast3RConfig, fused, image_ids,
                  num_views: int):
    """Per-variant fusion-decoder dispatch returning the {hook: act} dict."""
    if cfg.decoder_type == "llama":
        from fast3r_tpu.models.llama_decoder import llama_decoder_forward

        return llama_decoder_forward(params["decoder"], cfg.decoder, fused,
                                     image_ids, num_views=num_views)
    return decoder_forward(params["decoder"], cfg.decoder, fused, image_ids,
                           is_training=False)


def _build_varshape_forward(model: Fast3R, shape_sig: Tuple[Tuple[int, int], ...]):
    """Compile a forward for one shape composition (B=1 per view).

    Inference uses plain patch embedding at each view's own AR and heads at
    each view's own (H, W) — the reference's inference configuration
    (patch_embed_cls=PatchEmbedDust3R, landscape_only=False,
    utils/checkpoint_utils.py:36-38).
    """
    cfg = model.cfg
    ps = cfg.encoder.patch_size
    patch_counts = [(h // ps) * (w // ps) for (h, w) in shape_sig]
    offsets = np.cumsum([0] + patch_counts)
    encode = _make_encoder_fn(cfg)

    unique_shapes = sorted(set(shape_sig))
    groups = {
        s: [i for i, sh in enumerate(shape_sig) if sh == s] for s in unique_shapes
    }

    def fn(params, *imgs):
        V = len(imgs)
        # encode per shape group (batched within a group)
        feats_per_view: List[Optional[jnp.ndarray]] = [None] * V
        for s, idxs in groups.items():
            batch = jnp.concatenate([imgs[i] for i in idxs], axis=0)
            feats = encode(params, batch)
            for j, i in enumerate(idxs):
                feats_per_view[i] = feats[j:j + 1]
        fused = jnp.concatenate(feats_per_view, axis=1)  # (1, S, D)

        image_ids = _inference_image_ids(cfg.decoder, patch_counts)
        dec_out = _decode_hooks(params, cfg, fused, image_ids, V)

        hooks = cfg.decoder.hooks
        results = []
        for i, (h, w) in enumerate(shape_sig):
            tokens = [
                dec_out[k][:, offsets[i]:offsets[i + 1]] for k in hooks
            ]
            g = dpt_head_forward(params["head_global"], cfg.head, tokens, (h, w))
            res = {"pts3d_in_other_view": g["pts3d"]}
            if "conf" in g:
                res["conf"] = g["conf"]
            if cfg.with_local_head:
                l = dpt_head_forward(params["head_local"], cfg.head, tokens, (h, w))
                res["pts3d_local"] = l["pts3d"]
                if "conf" in l:
                    res["conf_local"] = l["conf"]
            results.append(res)
        return results

    return jax.jit(fn)


def forward_views(model: Fast3R, views: Sequence[Dict], profiling: bool = False):
    """Run the model on reference-style view dicts -> list of per-view preds.

    profiling=True runs encoder/decoder/heads as separate programs with a
    device sync between phases and returns the reference's profiling_info
    keys (SURVEY.md §5.1 — fast3r.py:311-495); the default path fuses
    everything into one XLA program (faster, no phase boundaries).
    """
    imgs_np, shapes = _views_to_arrays(views)
    shape_sig = tuple(shapes)
    imgs = [jnp.asarray(x, model.dtype) for x in imgs_np]

    if profiling:
        return _forward_views_staged(model, imgs, shape_sig)

    t0 = time.perf_counter()
    if shape_sig not in model._jit_cache:
        model._jit_cache[shape_sig] = _build_varshape_forward(model, shape_sig)
    fn = model._jit_cache[shape_sig]
    preds = fn(model.params, *imgs)
    preds = jax.block_until_ready(preds)
    return [
        {k: np.asarray(v, np.float32) for k, v in p.items()} for p in preds
    ]


def _sync(x):
    """Force execution (block_until_ready is unreliable on tunneled TPUs)."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[0])
    return x


def _forward_views_staged(model: Fast3R, imgs, shape_sig):
    """Per-phase timed forward (the reference's profiling dict contract)."""
    cfg = model.cfg
    ps = cfg.encoder.patch_size
    patch_counts = [(h // ps) * (w // ps) for (h, w) in shape_sig]
    V = len(shape_sig)
    key = ("staged",) + tuple(shape_sig)
    if key not in model._jit_cache:
        encode = _make_encoder_fn(cfg)

        def enc_fn(params, *ims):
            groups: Dict[Tuple[int, int], list] = {}
            for i, s in enumerate(shape_sig):
                groups.setdefault(s, []).append(i)
            feats = [None] * V
            for s, idxs in groups.items():
                batch = jnp.concatenate([ims[i] for i in idxs], axis=0)
                f = encode(params, batch)
                for j, i in enumerate(idxs):
                    feats[i] = f[j:j + 1]
            return jnp.concatenate(feats, axis=1)

        def dec_fn(params, fused):
            ids = _inference_image_ids(cfg.decoder, patch_counts)
            out = _decode_hooks(params, cfg, fused, ids, V)
            return [out[h] for h in cfg.decoder.hooks]

        def head_fn(params, hook_list):
            offsets = np.cumsum([0] + patch_counts)
            results = []
            for i, (h, w) in enumerate(shape_sig):
                tokens = [t[:, offsets[i]:offsets[i + 1]] for t in hook_list]
                g = dpt_head_forward(params["head_global"], cfg.head, tokens,
                                     (h, w))
                res = {"pts3d_in_other_view": g["pts3d"], "conf": g["conf"]}
                if cfg.with_local_head:
                    l = dpt_head_forward(params["head_local"], cfg.head,
                                         tokens, (h, w))
                    res["pts3d_local"] = l["pts3d"]
                    res["conf_local"] = l["conf"]
                results.append(res)
            return results

        model._jit_cache[key] = (jax.jit(enc_fn), jax.jit(dec_fn),
                                 jax.jit(head_fn))
    enc_fn, dec_fn, head_fn = model._jit_cache[key]

    t0 = time.perf_counter()
    fused = _sync(enc_fn(model.params, *imgs))
    t1 = time.perf_counter()
    hook_list = _sync(dec_fn(model.params, fused))
    t2 = time.perf_counter()
    preds = _sync(head_fn(model.params, hook_list))
    t3 = time.perf_counter()

    preds = [
        {k: np.asarray(v, np.float32) for k, v in p.items()} for p in preds
    ]
    info = {
        "encode_images_time": t1 - t0,
        "pos_emb_time": 0.0,   # fused into the decoder program
        "decoder_time": t2 - t1,
        "head_forward_time": t3 - t2,
        "total_time": t3 - t0,
    }
    return preds, info


def _build_raw_forward(model: Fast3R, src_hw: Tuple[int, int], num_views: int,
                       size: int, square_ok: bool):
    """One XLA program: uint8 frames -> preprocess -> encoder -> decoder ->
    heads (north-star clause 1 — no host-side resize/normalize, no separate
    ingest program serialized with device compute)."""
    from fast3r_tpu.ops.preprocess import make_plan, preprocess_device

    cfg = model.cfg
    plan = make_plan(src_hw, size, square_ok=square_ok)
    h, w = plan.out_hw
    ps = cfg.encoder.patch_size
    Pq = (h // ps) * (w // ps)
    encode = _make_encoder_fn(cfg)

    def fn(params, raw_u8):
        imgs = preprocess_device(raw_u8, plan, model.dtype)  # (V, h, w, 3)
        feats = encode(params, imgs)
        fused = feats.reshape(1, num_views * Pq, -1)
        image_ids = _inference_image_ids(cfg.decoder, [Pq] * num_views)
        dec_out = _decode_hooks(params, cfg, fused, image_ids, num_views)
        tokens = [
            dec_out[k].reshape(num_views, Pq, -1) for k in cfg.decoder.hooks
        ]
        g = dpt_head_forward(params["head_global"], cfg.head, tokens, (h, w))
        res = {"pts3d_in_other_view": g["pts3d"], "conf": g["conf"]}
        if cfg.with_local_head:
            l = dpt_head_forward(params["head_local"], cfg.head, tokens, (h, w))
            res["pts3d_local"] = l["pts3d"]
            res["conf_local"] = l["conf"]
        # ship the preprocessed frames back for visualization/colors
        res["_imgs"] = imgs
        return res

    return jax.jit(fn), plan


def inference_from_raw(raw_frames, model: Fast3R, size: int = 512,
                       square_ok: bool = False, verbose: bool = True):
    """Fused-ingest inference: same-shape raw uint8 frames in, the reference
    output contract out (views + per-view preds with a leading batch dim).

    raw_frames: (V, H, W, 3) uint8 array or a list of (H, W, 3) uint8 arrays
    of one shape (decode/EXIF stay on host — utils/image.py load_images_raw).
    """
    raw = np.stack([np.asarray(f, np.uint8) for f in raw_frames]) \
        if isinstance(raw_frames, (list, tuple)) else np.asarray(raw_frames)
    assert raw.ndim == 4 and raw.shape[-1] == 3 and raw.dtype == np.uint8, \
        raw.shape
    V, H0, W0 = raw.shape[:3]
    if verbose:
        print(f">> Fused-ingest inference on {V} raw frames {W0}x{H0}")

    key = ("raw", (H0, W0), V, size, square_ok, model.dtype)
    if key not in model._jit_cache:
        model._jit_cache[key] = _build_raw_forward(
            model, (H0, W0), V, size, square_ok)
    fn, plan = model._jit_cache[key]
    out = jax.block_until_ready(fn(model.params, jnp.asarray(raw)))
    h, w = plan.out_hw
    imgs = np.asarray(out.pop("_imgs"), np.float32)
    preds = [
        {k: np.asarray(v[i:i + 1], np.float32) for k, v in out.items()}
        for i in range(V)
    ]
    views = [
        {"img": imgs[i:i + 1], "true_shape": np.int32([[h, w]]),
         "idx": i, "instance": str(i)}
        for i in range(V)
    ]
    return {"views": views, "preds": preds, "loss": None}


def inference(multiple_views_in_one_sample: Sequence[Dict], model: Fast3R,
              device=None, dtype=None, verbose: bool = True,
              profiling: bool = False):
    """Reference-compatible entry (inference_multiview.py:71-99).

    `device` is accepted for API compatibility and ignored (JAX manages
    placement); `dtype` overrides the model compute dtype for this call.
    """
    if verbose:
        print(f">> Inference with model on {len(multiple_views_in_one_sample)} images")
    if dtype is not None:
        model = Fast3R(model.cfg, model.params, dtype)

    out = forward_views(model, multiple_views_in_one_sample, profiling=profiling)
    if profiling:
        preds, info = out
    else:
        preds, info = out, None

    result = {
        "views": list(multiple_views_in_one_sample),
        "preds": preds,
        "loss": None,
    }
    if profiling:
        return result, info
    return result
