"""Golden parity: Llama fusion decoder vs reference LlamaDecoder (fp32)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.ref_loader import ref_module

from fast3r_tpu.models.llama_decoder import (
    LlamaDecoderConfig,
    init_llama_decoder,
    llama_decoder_forward,
)

DIM, HEADS, LAYERS = 64, 4, 4


def _convert_llama_params(ref_sd, cfg):
    """torch LlamaDecoder state dict -> jax pytree (test-local converter)."""
    import numpy as np

    def t(name):
        return np.asarray(ref_sd[name].float().numpy())

    def layer(i):
        p = f"layers.{i}."
        return {
            "attention_norm": {"scale": t(p + "attention_norm.weight")},
            "attn": {
                "wq": {"w": t(p + "attention.wq.weight").T},
                "wk": {"w": t(p + "attention.wk.weight").T},
                "wv": {"w": t(p + "attention.wv.weight").T},
                "wo": {"w": t(p + "attention.wo.weight").T},
            },
            "ffn_norm": {"scale": t(p + "ffn_norm.weight")},
            "ffn": {
                "w1": {"w": t(p + "feed_forward.w1.weight").T},
                "w2": {"w": t(p + "feed_forward.w2.weight").T},
                "w3": {"w": t(p + "feed_forward.w3.weight").T},
            },
        }

    layers = [layer(i) for i in range(cfg.n_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *layers)
    return {
        "decoder_embed": {
            "w": jnp.asarray(t("decoder_embed.weight").T),
            "b": jnp.asarray(t("decoder_embed.bias")),
        },
        "layers": stacked,
        "norm": {"scale": jnp.asarray(t("norm.weight"))},
        "view0_embed": jnp.asarray(t("view0_embed")),
    }


def test_llama_decoder_parity():
    m = ref_module("fast3r.models.fast3r")
    torch.manual_seed(0)
    ref = m.LlamaDecoder(
        random_image_idx_embedding=False,
        enc_embed_dim=DIM, embed_dim=DIM, n_layers=LAYERS, n_heads=HEADS,
        is_causal=False, norm_eps=1e-5,
    )
    ref.eval()

    cfg = LlamaDecoderConfig(
        enc_embed_dim=DIM, embed_dim=DIM, n_layers=LAYERS, n_heads=HEADS,
        random_image_idx_embedding=False, attn_impl="naive", norm_eps=1e-5,
    )
    params = _convert_llama_params(ref.state_dict(), cfg)

    rng = np.random.default_rng(0)
    B, V, P = 2, 3, 12
    feats = rng.standard_normal((B, V, P, DIM)).astype(np.float32)
    pos = np.zeros((B, P, 2), np.int64)
    image_ids = np.repeat(np.arange(V), P)[None].repeat(B, 0)

    with torch.no_grad():
        ref_out = ref(
            [torch.from_numpy(feats[:, v]) for v in range(V)],
            [torch.from_numpy(pos) for _ in range(V)],
            torch.from_numpy(image_ids),
        )

    fused = jnp.asarray(feats.reshape(B, V * P, DIM))
    out = llama_decoder_forward(params, cfg, fused, jnp.asarray(image_ids))

    for hook in cfg.hooks:
        np.testing.assert_allclose(
            np.asarray(out[hook]), ref_out[hook].numpy(),
            rtol=1e-4, atol=1e-5, err_msg=f"hook {hook}",
        )


def test_llama_decoder_gqa_and_training_ids():
    """GQA path + random training ids run and produce finite outputs."""
    cfg = LlamaDecoderConfig(
        enc_embed_dim=DIM, embed_dim=DIM, n_layers=2, n_heads=4, n_kv_heads=2,
        attn_impl="naive",
    )
    params = init_llama_decoder(jax.random.key(0), cfg)
    B, V, P = 2, 3, 8
    feats = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, V * P, DIM)), jnp.float32
    )
    ids = jnp.repeat(jnp.arange(V), P)[None].repeat(B, 0)
    out = llama_decoder_forward(params, cfg, feats, ids,
                                rng=jax.random.key(2), num_views=V)
    assert np.isfinite(np.asarray(out[cfg.n_layers])).all()
