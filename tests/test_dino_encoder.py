"""DinoEncoder golden parity against an independent torch implementation.

The reference (fast3r/models/fast3r.py:561-651) wraps torch.hub
dinov2_vitl14; hub weights are unfetchable offline, so these tests use the
`transformers` Dinov2Model (an independent implementation of the same
architecture, baked into the environment) with shared random weights as the
structural oracle:

  * test_dino_square:      full-model parity at the no-interpolation grid
    (skip path of interpolate_pos_encoding) — patch conv, cls token, pos
    embeds, LayerScale blocks, final LN, x_norm_patchtokens slice.
  * test_bicubic_torch_parity: ops/resize.resize_bicubic_torch vs
    torch F.interpolate(mode="bicubic", antialias=False) for both the
    ``size=`` and hub's ``scale_factor=(n+0.1)/M`` coordinate mappings
    (dinov2 vision_transformer.py interpolate_pos_encoding).
  * test_dino_mixed_orientation: portrait samples are transposed in, their
    patch grid transposed back (reference :601-632), with the pos-embed
    interpolation done hub-style on both sides.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from fast3r_tpu.models.dino_encoder import (  # noqa: E402
    DinoEncoderConfig,
    dino_encoder_forward,
    init_dino_encoder,
    load_dinov2_state_dict,
)
from fast3r_tpu.ops.resize import resize_bicubic_torch  # noqa: E402


def test_dino_forward_shapes_and_portrait():
    cfg = DinoEncoderConfig(embed_dim=64, depth=2, num_heads=2,
                            pos_embed_size=6, attn_impl="naive")
    params = init_dino_encoder(jax.random.key(0), cfg)
    img = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 42, 56, 3)), jnp.float32)
    ts = jnp.asarray(np.array([[42, 56], [56, 42]], np.int32))
    tok, pos = dino_encoder_forward(params, cfg, img, ts)
    assert tok.shape == (2, 12, 64)
    assert pos.shape == (2, 12, 2)
    assert np.isfinite(np.asarray(tok)).all()
    # landscape grid 3x4 -> pos max (2, 3); portrait grid 4x3 -> pos max (3, 2)
    np.testing.assert_array_equal(np.asarray(pos[0]).max(0), [2, 3])
    np.testing.assert_array_equal(np.asarray(pos[1]).max(0), [3, 2])

D, DEPTH, HEADS, PS, M = 64, 2, 2, 14, 5


@pytest.fixture(scope="module")
def torch_model():
    cfg = transformers.Dinov2Config(
        hidden_size=D, num_hidden_layers=DEPTH, num_attention_heads=HEADS,
        intermediate_size=4 * D, image_size=M * PS, patch_size=PS,
        layerscale_value=0.7, hidden_act="gelu",
    )
    torch.manual_seed(0)
    model = transformers.Dinov2Model(cfg).eval()
    # non-trivial params everywhere the mapping must cover
    with torch.no_grad():
        for p in model.parameters():
            if p.std() < 1e-8:
                p.add_(torch.randn_like(p) * 0.05)
    return model


def _hub_state_dict(model):
    """transformers Dinov2 params -> torch.hub dinov2 state-dict names
    (the layout load_dinov2_state_dict consumes)."""
    sd = {k: v.detach() for k, v in model.state_dict().items()}
    out = {
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "patch_embed.proj.weight":
            sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias":
            sd["embeddings.patch_embeddings.projection.bias"],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    for i in range(DEPTH):
        t = f"encoder.layer.{i}."
        h = f"blocks.{i}."
        out[h + "attn.qkv.weight"] = torch.cat(
            [sd[t + f"attention.attention.{n}.weight"]
             for n in ("query", "key", "value")], dim=0)
        out[h + "attn.qkv.bias"] = torch.cat(
            [sd[t + f"attention.attention.{n}.bias"]
             for n in ("query", "key", "value")], dim=0)
        out[h + "attn.proj.weight"] = sd[t + "attention.output.dense.weight"]
        out[h + "attn.proj.bias"] = sd[t + "attention.output.dense.bias"]
        out[h + "ls1.gamma"] = sd[t + "layer_scale1.lambda1"]
        out[h + "ls2.gamma"] = sd[t + "layer_scale2.lambda1"]
        for src, dst in (("norm1", "norm1"), ("norm2", "norm2")):
            out[h + dst + ".weight"] = sd[t + src + ".weight"]
            out[h + dst + ".bias"] = sd[t + src + ".bias"]
        for fc in ("fc1", "fc2"):
            out[h + f"mlp.{fc}.weight"] = sd[t + f"mlp.{fc}.weight"]
            out[h + f"mlp.{fc}.bias"] = sd[t + f"mlp.{fc}.bias"]
    return out


@pytest.fixture(scope="module")
def jax_setup(torch_model):
    cfg = DinoEncoderConfig(patch_size=PS, embed_dim=D, depth=DEPTH,
                            num_heads=HEADS, pos_embed_size=M,
                            attn_impl="naive")
    params = load_dinov2_state_dict(_hub_state_dict(torch_model), cfg)
    return cfg, params


def test_dino_square(torch_model, jax_setup):
    """No-interpolation grid: exact structural parity vs transformers."""
    cfg, params = jax_setup
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, M * PS, M * PS, 3)).astype(np.float32)

    with torch.no_grad():
        ref = torch_model(
            torch.from_numpy(img.transpose(0, 3, 1, 2))
        ).last_hidden_state[:, 1:].numpy()

    tokens, pos = dino_encoder_forward(params, cfg, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(tokens), ref, rtol=2e-4, atol=2e-5)
    assert pos.shape == (2, M * M, 2)


@pytest.mark.parametrize("mapping", ["size", "hub_offset"])
def test_bicubic_torch_parity(mapping):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 5, 5, 7)).astype(np.float32)
    out_h, out_w = 9, 6
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    if mapping == "size":
        ref = torch.nn.functional.interpolate(
            tx, size=(out_h, out_w), mode="bicubic", align_corners=False,
            antialias=False)
        got = resize_bicubic_torch(jnp.asarray(x), out_h, out_w)
    else:
        sf = ((out_h + 0.1) / 5, (out_w + 0.1) / 5)
        ref = torch.nn.functional.interpolate(
            tx, scale_factor=sf, mode="bicubic", align_corners=False,
            antialias=False)
        got = resize_bicubic_torch(jnp.asarray(x), out_h, out_w,
                                   scale_factors=sf)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-5)


def test_dino_mixed_orientation(torch_model, jax_setup):
    """Portrait transpose/un-transpose (reference fast3r.py:601-632) with
    hub-style pos-embed interpolation on both sides."""
    cfg, params = jax_setup
    H, W = 5 * PS, 7 * PS  # landscape storage, 5x7 grid
    rng = np.random.default_rng(2)
    img = rng.standard_normal((2, H, W, 3)).astype(np.float32)
    true_shape = np.array([[H, W], [W, H]], np.int32)  # [landscape, portrait]

    def hub_forward(pix):  # pix (B, 3, h, w) — hub-semantics torch oracle
        B = pix.shape[0]
        gh, gw = pix.shape[2] // PS, pix.shape[3] // PS
        emb = torch_model.embeddings.patch_embeddings(pix)
        cls = torch_model.embeddings.cls_token.expand(B, -1, -1)
        x = torch.cat([cls, emb], dim=1)
        pe = torch_model.embeddings.position_embeddings
        patch_pe = pe[:, 1:].reshape(1, M, M, D).permute(0, 3, 1, 2)
        sf = ((gh + 0.1) / M, (gw + 0.1) / M)
        patch_pe = torch.nn.functional.interpolate(
            patch_pe, scale_factor=sf, mode="bicubic", align_corners=False,
            antialias=False)
        patch_pe = patch_pe.permute(0, 2, 3, 1).reshape(1, gh * gw, D)
        x = x + torch.cat([pe[:, :1], patch_pe], dim=1)
        x = torch_model.encoder(x).last_hidden_state
        return torch_model.layernorm(x)[:, 1:]

    with torch.no_grad():
        land = hub_forward(
            torch.from_numpy(img[:1].transpose(0, 3, 1, 2))).numpy()
        port = hub_forward(
            torch.from_numpy(
                img[1:].transpose(0, 3, 1, 2).swapaxes(2, 3).copy())).numpy()
    # un-transpose the portrait grid back to storage order (7x5 -> 5x7)
    port = port.reshape(1, 7, 5, D).swapaxes(1, 2).reshape(1, 5 * 7, D)
    ref = np.concatenate([land, port], axis=0)

    tokens, _ = dino_encoder_forward(params, cfg, jnp.asarray(img),
                                     jnp.asarray(true_shape))
    np.testing.assert_allclose(np.asarray(tokens), ref, rtol=2e-4, atol=2e-5)
