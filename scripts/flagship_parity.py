"""Flagship-width (ViT-L/16 + 1024x24 fusion decoder) numerical parity vs
the reference torch implementation, per stage (VERDICT r3 #3).

The golden suite (tests/test_model_parity.py) runs at toy dims (DIM=64,
depth 2/12); published weights are network-gated.  This script is the
strongest weights-unavailable substitute: REAL flagship dims (1024/24
encoder, 1024x24 decoder, 16 heads, full DPT head), random shared weights,
fp32, 2 landscape views @ 224x224 — reference torch vs JAX, max|d| and
max-rel recorded PER STAGE (encoder feats, each decoder hook, both heads'
pts3d/conf) so fp32 accumulation-order and width-scaling effects that toy
dims cannot surface are bounded by a committed artifact
(docs/flagship_parity.json).  A bf16 row re-runs the JAX forward in
bfloat16 against the same fp32 torch baseline to bound the deployed
precision's deviation.

Reference call stack mirrored: fast3r/models/fast3r.py:302-497
(_encode_images -> decoder with hooks -> head dispatch).

    python scripts/flagship_parity.py [--out docs/flagship_parity.json]
        [--views 2] [--res 224] [--enc-depth 24] [--dec-depth 24]
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_flagship_cfg(enc_depth=24, dec_depth=24, res=224):
    from fast3r_tpu.models.decoder import DecoderConfig
    from fast3r_tpu.models.dpt_head import DPTHeadConfig
    from fast3r_tpu.models.encoder import EncoderConfig
    from fast3r_tpu.models.fast3r import Fast3RConfig

    return Fast3RConfig(
        encoder=EncoderConfig(img_size=max(res, 512), embed_dim=1024,
                              num_heads=16, depth=enc_depth,
                              fused_blocks=False, attn_impl="naive"),
        decoder=DecoderConfig(enc_embed_dim=1024, embed_dim=1024,
                              num_heads=16, depth=dec_depth,
                              fused_blocks=False, attn_impl="naive"),
        head=DPTHeadConfig(dim_tokens=(1024, 1024, 1024, 1024)),
        with_local_head=True,
    )


def _delta(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    d = np.abs(a - b)
    scale = max(float(np.abs(b).mean()), 1e-12)
    return {
        "max_abs": float(d.max()),
        "mean_abs": float(d.mean()),
        "max_rel_vs_meanmag": float(d.max() / scale),
        "ref_mean_mag": scale,
    }


def jax_stages(model, imgs, dtype):
    """Per-stage JAX tensors with the fixed key(0) image ids (the same path
    scripts/validate_published.py stage_checksums uses)."""
    import jax
    import jax.numpy as jnp

    from fast3r_tpu.models.decoder import (
        decoder_forward,
        sample_random_image_ids,
    )
    from fast3r_tpu.models.encoder import encoder_forward
    from fast3r_tpu.models.fast3r import _run_head_oriented

    cfg = model.cfg
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), model.params)
    B, V, H, W, _ = imgs.shape
    flat = jnp.asarray(imgs.reshape(B * V, H, W, 3), dtype)

    feats, _ = encoder_forward(params["encoder"], cfg.encoder, flat)
    P = feats.shape[1]
    fused = feats.reshape(B, V * P, -1)
    ids = sample_random_image_ids(jax.random.key(0), B, V)
    image_ids = jnp.repeat(ids, P, axis=1)
    dec = decoder_forward(params["decoder"], cfg.decoder, fused, image_ids)

    stages = {"encoder_feats": feats}
    for h in cfg.decoder.hooks:
        stages[f"decoder_hook_{h}"] = dec[h]
    # regroup fused (B, V*P, C) hook tokens per view: (B*V, P, C)
    tokens = [dec[h].reshape(B, V, P, -1).reshape(B * V, P, -1)
              for h in cfg.decoder.hooks]
    g = _run_head_oriented(params["head_global"], cfg.head, tokens, H, W,
                           None, False)
    stages["global_pts3d"] = g["pts3d"]
    stages["global_conf"] = g["conf"]
    if cfg.with_local_head:
        l = _run_head_oriented(params["head_local"], cfg.head, tokens, H, W,
                               None, False)
        stages["local_pts3d"] = l["pts3d"]
        stages["local_conf"] = l["conf"]
    return {k: np.asarray(v, np.float32) for k, v in stages.items()}, ids


def torch_stages(model, imgs, ids):
    """Reference forward with per-stage capture via module hooks."""
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import validate_published as vp  # reuse the randperm alignment
    from ref_loader import ref_module
    from fast3r_tpu.utils.checkpoint import fast3r_params_to_state_dict
    from fast3r_tpu.utils.checkpoint_utils import config_to_reference_args

    cfg = model.cfg
    args = config_to_reference_args(cfg)
    for k in ("encoder_args", "decoder_args"):
        args[k]["attn_implementation"] = "pytorch_naive"
    m = ref_module("fast3r.models.fast3r")
    ref = m.Fast3R(**args)
    import jax

    sd = fast3r_params_to_state_dict(
        jax.tree.map(lambda x: np.asarray(x, np.float32), model.params), cfg)
    ref.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()},
                        strict=True)
    ref.eval()

    B, V, H, W, _ = imgs.shape
    views = []
    for v in range(V):
        views.append({
            "img": torch.from_numpy(
                imgs[:, v].transpose(0, 3, 1, 2).copy()),
            "true_shape": torch.tensor([[H, W]] * B, dtype=torch.int32),
            "idx": v, "instance": str(v),
        })

    captured = {}
    hooks_idx = list(cfg.decoder.hooks)

    def dec_hook(i):
        def fn(mod, inp, out):
            captured[f"decoder_hook_{i}"] = out.detach()
        return fn

    handles = []
    for h in hooks_idx:
        if h == 0:
            continue  # hook 0 = encoder feats (captured below)
        if h == cfg.decoder.depth:
            continue  # final hook passes through dec_norm (captured below)
        handles.append(ref.decoder.dec_blocks[h - 1].register_forward_hook(
            dec_hook(h)))
    handles.append(ref.decoder.dec_norm.register_forward_hook(
        lambda m, i, o: captured.__setitem__(
            f"decoder_hook_{cfg.decoder.depth}", o.detach())))

    with torch.no_grad(), vp._aligned_torch_randperm(ids[0]):
        out = ref(views)
    for h in handles:
        h.remove()

    stages = {}
    # encoder feats in fast3r_tpu layout: (B*V, P, C), views major
    with torch.no_grad():
        enc = ref._encode_images(views)[0]  # list per view of (B, P, C)
    stages["encoder_feats"] = torch.stack(enc, dim=1).reshape(
        B * V, enc[0].shape[1], -1).numpy()
    for h in hooks_idx:
        if h == 0:
            stages["decoder_hook_0"] = stages["encoder_feats"].reshape(
                B, -1, cfg.encoder.embed_dim)
        else:
            stages[f"decoder_hook_{h}"] = captured[f"decoder_hook_{h}"].numpy()
    stages["global_pts3d"] = np.stack(
        [out[v]["pts3d_in_other_view"].numpy() for v in range(V)], axis=0
    ).reshape(B * V, H, W, 3)
    stages["global_conf"] = np.stack(
        [out[v]["conf"].numpy() for v in range(V)], axis=0).reshape(
        B * V, H, W)
    if cfg.with_local_head:
        stages["local_pts3d"] = np.stack(
            [out[v]["pts3d_local"].numpy() for v in range(V)], axis=0
        ).reshape(B * V, H, W, 3)
        stages["local_conf"] = np.stack(
            [out[v]["conf_local"].numpy() for v in range(V)], axis=0
        ).reshape(B * V, H, W)
    return stages


def run(enc_depth=24, dec_depth=24, views=2, res=224, seed=0,
        with_bf16=True):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)

    from fast3r_tpu.inference import Fast3R

    cfg = build_flagship_cfg(enc_depth, dec_depth, res)
    model = Fast3R.from_random(cfg, seed=seed)
    rng = np.random.default_rng(seed)
    imgs = (rng.standard_normal((1, views, res, res, 3)) * 0.5).astype(
        np.float32)

    import jax.numpy as jnp

    jstages, ids = jax_stages(model, imgs, jnp.float32)
    tstages = torch_stages(model, imgs, ids)

    report = {
        "config": {"enc": f"1024x{enc_depth}", "dec": f"1024x{dec_depth}",
                   "heads": 16, "views": views, "res": res,
                   "dtype": "fp32 vs torch fp32"},
        "stages": {},
    }
    for k in jstages:
        # reshape-compatible comparison
        a, b = jstages[k], tstages[k].reshape(jstages[k].shape)
        report["stages"][k] = _delta(a, b)

    if with_bf16:
        bstages, _ = jax_stages(model, imgs, jnp.bfloat16)
        report["bf16_stages"] = {
            k: _delta(bstages[k], tstages[k].reshape(bstages[k].shape))
            for k in bstages
        }
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "flagship_parity.json"))
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--enc-depth", type=int, default=24)
    ap.add_argument("--dec-depth", type=int, default=24)
    ap.add_argument("--no-bf16", action="store_true")
    args = ap.parse_args(argv)

    report = run(args.enc_depth, args.dec_depth, args.views, args.res,
                 with_bf16=not args.no_bf16)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
