"""High-level checkpoint loading/export.

Behavioral reference: fast3r/utils/checkpoint_utils.py:14-158 —
  * load_model: accepts an HF-format checkpoint dir/repo OR a training run
    dir (config snapshot + checkpoints/last), applying the inference
    overrides (patch_embed_cls=PatchEmbedDust3R, landscape_only=False,
    reference :36-38);
  * convert_checkpoint_to_hf_checkpoint: export a trained run to the HF
    layout (config.json with the *_args dicts + model.safetensors in the
    reference torch tensor layout) so reference-side tooling can load it.

The DeepSpeed-ZeRO consolidation step of the reference has no analog here:
Orbax checkpoints restore sharded or unsharded transparently.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np

from fast3r_tpu.inference import Fast3R, config_from_reference_args
from fast3r_tpu.models.fast3r import Fast3RConfig
from fast3r_tpu.utils.checkpoint import fast3r_params_to_state_dict


def _is_hf_dir(path: str) -> bool:
    return os.path.exists(os.path.join(path, "config.json"))


def _is_run_dir(path: str) -> bool:
    return os.path.exists(os.path.join(path, "config.yaml")) and \
        os.path.isdir(os.path.join(path, "checkpoints"))


def load_model(checkpoint_dir: str, dtype=None, attn_impl: str = "xla",
               ckpt_name: str = "last") -> Fast3R:
    """Load a Fast3R model from an HF dir/repo or a fast3r_tpu run dir."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    if os.path.isdir(checkpoint_dir) and _is_run_dir(checkpoint_dir):
        import yaml

        from fast3r_tpu.config import model_config_from_dict
        from fast3r_tpu.models.fast3r import init_fast3r
        from fast3r_tpu.train.step import OptimConfig, init_train_state
        from fast3r_tpu.utils.orbax_io import restore_train_state

        with open(os.path.join(checkpoint_dir, "config.yaml")) as f:
            cfg_dict = yaml.safe_load(f)
        cfg = model_config_from_dict(cfg_dict["model"])
        # inference overrides (reference checkpoint_utils.py:36-38)
        cfg = _inference_overrides(cfg, attn_impl)
        template = init_train_state(
            init_fast3r(jax.random.key(0), cfg), OptimConfig(),
            jax.random.key(1),
        )
        state, _ = restore_train_state(
            os.path.join(checkpoint_dir, "checkpoints", ckpt_name), template)
        return Fast3R(cfg, state.params, dtype)
    model = Fast3R.from_pretrained(checkpoint_dir, dtype=dtype,
                                   attn_impl=attn_impl)
    model.cfg = _inference_overrides(model.cfg, attn_impl)
    return model


def _inference_overrides(cfg: Fast3RConfig, attn_impl: str) -> Fast3RConfig:
    import dataclasses

    if cfg.encoder_type == "dino":  # no patch_embed_cls knob on DinoEncoder
        enc = dataclasses.replace(cfg.encoder, attn_impl=attn_impl)
    else:
        enc = dataclasses.replace(cfg.encoder,
                                  patch_embed_cls="PatchEmbedDust3R",
                                  attn_impl=attn_impl)
    return dataclasses.replace(cfg, encoder=enc, landscape_only=False)


def config_to_reference_args(cfg: Fast3RConfig) -> dict:
    """Fast3RConfig -> the reference's {encoder,decoder,head}_args dicts,
    for every variant (croco|dino encoder x fast3r|llama decoder)."""
    if cfg.encoder_type == "dino":
        encoder_args = {
            "encoder_type": "dino",
            "patch_size": cfg.encoder.patch_size,
            "embed_dim": cfg.encoder.embed_dim,
            "num_heads": cfg.encoder.num_heads,
            "depth": cfg.encoder.depth,
            "mlp_ratio": cfg.encoder.mlp_ratio,
            "pos_embed_size": cfg.encoder.pos_embed_size,
        }
    else:
        encoder_args = {
            "encoder_type": "croco",
            "img_size": cfg.encoder.img_size,
            "patch_size": cfg.encoder.patch_size,
            "patch_embed_cls": cfg.encoder.patch_embed_cls,
            "embed_dim": cfg.encoder.embed_dim,
            "num_heads": cfg.encoder.num_heads,
            "depth": cfg.encoder.depth,
            "mlp_ratio": cfg.encoder.mlp_ratio,
            "pos_embed": f"RoPE{cfg.encoder.rope_base:g}",
            "attn_implementation": "flash_attention",
        }
    if cfg.decoder_type == "llama":
        decoder_args = {
            "decoder_type": "llama",
            "random_image_idx_embedding":
                cfg.decoder.random_image_idx_embedding,
            "enc_embed_dim": cfg.decoder.enc_embed_dim,
            "embed_dim": cfg.decoder.embed_dim,
            "n_layers": cfg.decoder.n_layers,
            "n_heads": cfg.decoder.n_heads,
            "n_kv_heads": cfg.decoder.n_kv_heads,
            "multiple_of": cfg.decoder.multiple_of,
            "ffn_dim_multiplier": cfg.decoder.ffn_dim_multiplier,
            "norm_eps": cfg.decoder.norm_eps,
            "rope_theta": cfg.decoder.rope_theta,
            "max_seq_len": cfg.decoder.max_seq_len,
            "is_causal": False,
            # the reference head factory indexes decoder_args["depth"]
            # (fast3r.py:137-148) even for llama configs (its Hydra base
            # merge leaves depth in) — mirror our hooks source
            "depth": cfg.decoder.n_layers,
        }
    else:
        decoder_args = {
            "decoder_type": "fast3r",
            "random_image_idx_embedding": cfg.decoder.random_image_idx_embedding,
            "enc_embed_dim": cfg.decoder.enc_embed_dim,
            "embed_dim": cfg.decoder.embed_dim,
            "num_heads": cfg.decoder.num_heads,
            "depth": cfg.decoder.depth,
            "mlp_ratio": cfg.decoder.mlp_ratio,
            "qkv_bias": cfg.decoder.qkv_bias,
            "attn_implementation": "flash_attention",
            "attn_bias_for_inference_enabled":
                cfg.decoder.attn_bias_for_inference_enabled,
        }
    return {
        "encoder_args": encoder_args,
        "decoder_args": decoder_args,
        "head_args": {
            "head_type": "dpt",
            "output_mode": "pts3d",
            "landscape_only": cfg.landscape_only,
            "depth_mode": list(cfg.head.depth_mode),
            "conf_mode": list(cfg.head.conf_mode),
            "patch_size": cfg.head.patch_size,
            "with_local_head": cfg.with_local_head,
        },
    }


def convert_checkpoint_to_hf(model: Fast3R, out_dir: str) -> str:
    """Export to the HF layout the reference publishes/loads
    (checkpoint_utils.py:107-139): config.json + model.safetensors with
    torch-layout tensors."""
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config_to_reference_args(model.cfg), f, indent=2)
    sd = fast3r_params_to_state_dict(
        jax.tree.map(lambda x: np.asarray(x, np.float32), model.params),
        model.cfg,
    )
    save_file(sd, os.path.join(out_dir, "model.safetensors"))
    return out_dir
