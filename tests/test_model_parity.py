"""End-to-end golden parity tests: fast3r_tpu vs reference PyTorch Fast3R (fp32).

The reference model is built with random weights on CPU; weights are converted
through fast3r_tpu.utils.checkpoint into the JAX pytree; outputs are compared
stage by stage and end to end.  This is the test the reference repo lacks
(SURVEY.md §4) and the foundation for checkpoint-fidelity claims.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.ref_loader import ref_module

from fast3r_tpu.models.decoder import DecoderConfig, decoder_forward
from fast3r_tpu.models.dpt_head import DPTHeadConfig, dpt_head_forward
from fast3r_tpu.models.encoder import EncoderConfig, encoder_forward
from fast3r_tpu.models.fast3r import Fast3RConfig, fast3r_forward
from fast3r_tpu.utils.checkpoint import torch_state_dict_to_params

ENC_DEPTH, DEC_DEPTH = 2, 12
DIM, HEADS = 64, 2
H, W = 48, 64


def build_ref_model(with_local_head=True):
    m = ref_module("fast3r.models.fast3r")
    torch.manual_seed(0)
    model = m.Fast3R(
        encoder_args=dict(
            encoder_type="croco", img_size=64, patch_size=16,
            patch_embed_cls="ManyAR_PatchEmbed", embed_dim=DIM,
            num_heads=HEADS, depth=ENC_DEPTH, mlp_ratio=4,
            pos_embed="RoPE100", attn_implementation="pytorch_naive",
        ),
        decoder_args=dict(
            decoder_type="fast3r", random_image_idx_embedding=False,
            enc_embed_dim=DIM, embed_dim=DIM, num_heads=HEADS, depth=DEC_DEPTH,
            attn_implementation="pytorch_naive",
        ),
        head_args=dict(
            head_type="dpt", output_mode="pts3d", landscape_only=True,
            depth_mode=("exp", -float("inf"), float("inf")),
            conf_mode=("exp", 1, float("inf")), patch_size=16,
            with_local_head=with_local_head,
        ),
    )
    model.eval()
    return model


def my_config(with_local_head=True):
    enc = EncoderConfig(img_size=64, patch_size=16, embed_dim=DIM,
                        num_heads=HEADS, depth=ENC_DEPTH, attn_impl="naive")
    dec = DecoderConfig(enc_embed_dim=DIM, embed_dim=DIM, num_heads=HEADS,
                        depth=DEC_DEPTH, random_image_idx_embedding=False,
                        attn_impl="naive")
    head = DPTHeadConfig(dim_tokens=(DIM, DIM, DIM, DIM))
    return Fast3RConfig(encoder=enc, decoder=dec, head=head,
                        with_local_head=with_local_head)


@pytest.fixture(scope="module")
def ref_and_params():
    model = build_ref_model()
    params = torch_state_dict_to_params(
        model.state_dict(), ENC_DEPTH, DEC_DEPTH, with_local_head=True,
        strip_net_prefix=False,
    )
    params = jax.tree.map(jnp.asarray, params)
    return model, params


def make_views(B, V, h, w, seed=0, portrait_mask=None):
    """Build reference-style views + my batched arrays.

    portrait_mask: optional (V,) bools — those views get true_shape (w, h)
    (portrait semantics with landscape storage layout).
    """
    rng = np.random.default_rng(seed)
    imgs = rng.standard_normal((B, V, h, w, 3)).astype(np.float32)
    true_shapes = np.tile(np.array([h, w], np.int64), (B, V, 1))
    if portrait_mask is not None:
        for v in np.where(portrait_mask)[0]:
            true_shapes[:, v] = [w, h]
    views = [
        {
            "img": torch.from_numpy(imgs[:, v].transpose(0, 3, 1, 2).copy()),
            "true_shape": torch.from_numpy(true_shapes[:, v].copy()),
        }
        for v in range(V)
    ]
    return views, jnp.asarray(imgs), jnp.asarray(true_shapes)


def test_encoder_parity(ref_and_params):
    model, params = ref_and_params
    views, imgs, shapes = make_views(2, 1, H, W, seed=1)
    with torch.no_grad():
        ref_feat, ref_pos = model.encoder(views[0]["img"], views[0]["true_shape"])
    feat, pos = encoder_forward(params["encoder"], my_config().encoder,
                                imgs[:, 0], shapes[:, 0])
    np.testing.assert_allclose(np.asarray(feat), ref_feat.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(pos), ref_pos.numpy())


def test_encoder_parity_portrait(ref_and_params):
    model, params = ref_and_params
    views, imgs, shapes = make_views(3, 1, H, W, seed=2,
                                     portrait_mask=np.array([True]))
    # make a mixed batch: sample 1 landscape, others portrait
    views[0]["true_shape"][1] = torch.tensor([H, W])
    shapes = shapes.at[1, 0].set(jnp.array([H, W]))
    with torch.no_grad():
        ref_feat, ref_pos = model.encoder(views[0]["img"], views[0]["true_shape"])
    feat, pos = encoder_forward(params["encoder"], my_config().encoder,
                                imgs[:, 0], shapes[:, 0])
    np.testing.assert_array_equal(np.asarray(pos), ref_pos.numpy())
    np.testing.assert_allclose(np.asarray(feat), ref_feat.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_decoder_parity(ref_and_params):
    model, params = ref_and_params
    B, V, P = 2, 3, 12
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((B, V, P, DIM)).astype(np.float32)
    pos = np.tile(
        np.stack(np.meshgrid(np.arange(3), np.arange(4), indexing="ij"), -1)
        .reshape(-1, 2),
        (B, 1, 1),
    )
    image_ids = np.repeat(np.arange(V), P)[None].repeat(B, 0)

    with torch.no_grad():
        ref_out = model.decoder(
            [torch.from_numpy(feats[:, v]) for v in range(V)],
            [torch.from_numpy(pos) for _ in range(V)],
            torch.from_numpy(image_ids),
        )
    cfg = my_config().decoder
    fused = jnp.asarray(feats.reshape(B, V * P, DIM))
    out = decoder_forward(params["decoder"], cfg, fused,
                          jnp.asarray(image_ids), is_training=False)
    # hooks: 0 (pre-projection feats), 6, 9, 12(normed)
    for hook in cfg.hooks:
        np.testing.assert_allclose(
            np.asarray(out[hook]), ref_out[hook].numpy(), rtol=1e-4, atol=1e-5,
            err_msg=f"hook {hook}",
        )


def test_dpt_head_parity(ref_and_params):
    model, params = ref_and_params
    B, P = 2, (H // 16) * (W // 16)
    rng = np.random.default_rng(4)
    tokens = [rng.standard_normal((B, P, DIM)).astype(np.float32)
              for _ in range(4)]
    # the reference head indexes hooks [0, 6, 9, 12] into the layer-output list
    layer_list = [torch.zeros(B, P, DIM)] * (DEC_DEPTH + 1)
    for hook, t in zip((0, 6, 9, 12), tokens):
        layer_list[hook] = torch.from_numpy(t)
    with torch.no_grad():
        ref = model.downstream_head(layer_list, (H, W))
    mine = dpt_head_forward(params["head_global"], my_config().head,
                            [jnp.asarray(t) for t in tokens], (H, W))
    np.testing.assert_allclose(
        np.asarray(mine["pts3d"]),
        ref["pts3d"].numpy(), rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(mine["conf"]), ref["conf"].numpy(), rtol=1e-4, atol=1e-4,
    )


def _full_model_compare(ref_and_params, portrait_mask, mixed):
    model, params = ref_and_params
    B, V = 2, 3
    views, imgs, shapes = make_views(B, V, H, W, seed=5,
                                     portrait_mask=portrait_mask)
    with torch.no_grad():
        ref = model(views)
    mine = fast3r_forward(params, my_config(), imgs, shapes,
                          is_training=False, mixed_orientation=mixed)
    for v in range(V):
        for key in ("pts3d_in_other_view", "conf", "pts3d_local", "conf_local"):
            np.testing.assert_allclose(
                np.asarray(mine[key][:, v]), ref[v][key].numpy(),
                rtol=1e-3, atol=1e-4, err_msg=f"view {v} {key}",
            )


def test_full_model_parity_landscape(ref_and_params):
    _full_model_compare(ref_and_params, portrait_mask=None, mixed=False)


def test_full_model_parity_mixed_orientation(ref_and_params):
    _full_model_compare(
        ref_and_params,
        portrait_mask=np.array([False, True, False]),
        mixed=True,
    )
