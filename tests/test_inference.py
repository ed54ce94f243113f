"""Inference API tests: load_images parity + mixed-shape forward goldens."""

import os
import tempfile

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.ref_loader import ref_module

from fast3r_tpu.inference import Fast3R, forward_views, inference
from fast3r_tpu.models.decoder import DecoderConfig
from fast3r_tpu.models.dpt_head import DPTHeadConfig
from fast3r_tpu.models.encoder import EncoderConfig
from fast3r_tpu.models.fast3r import Fast3RConfig, init_fast3r
from fast3r_tpu.utils.checkpoint import torch_state_dict_to_params
from fast3r_tpu.utils.image import load_images

ENC_DEPTH, DEC_DEPTH, DIM, HEADS = 2, 12, 64, 2


@pytest.fixture(scope="module")
def image_dir():
    import PIL.Image

    rng = np.random.default_rng(0)
    d = tempfile.mkdtemp()
    for name, (w, h) in [("a.png", (640, 480)), ("b.png", (480, 640)),
                         ("c.png", (500, 500)), ("d.jpg", (1024, 768))]:
        arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        PIL.Image.fromarray(arr).save(os.path.join(d, name))
    return d


@pytest.mark.parametrize("size,square_ok", [(512, False), (512, True), (224, False)])
def test_load_images_parity(image_dir, size, square_ok):
    ref_img = ref_module("fast3r.dust3r.utils.image")
    ref_views = ref_img.load_images(image_dir, size=size, square_ok=square_ok,
                                    verbose=False)
    my_views = load_images(image_dir, size=size, square_ok=square_ok,
                           verbose=False)
    assert len(my_views) == len(ref_views)
    for mv, rv in zip(my_views, ref_views):
        ref_arr = rv["img"].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(mv["img"], ref_arr, atol=1e-6)
        np.testing.assert_array_equal(mv["true_shape"], rv["true_shape"])
        # multiple-of-16 contract
        assert mv["img"].shape[1] % 16 == 0 and mv["img"].shape[2] % 16 == 0


def _tiny_model():
    enc = EncoderConfig(img_size=64, patch_size=16, embed_dim=DIM,
                        num_heads=HEADS, depth=ENC_DEPTH, attn_impl="naive")
    dec = DecoderConfig(enc_embed_dim=DIM, embed_dim=DIM, num_heads=HEADS,
                        depth=DEC_DEPTH, random_image_idx_embedding=False,
                        attn_impl="naive")
    head = DPTHeadConfig(dim_tokens=(DIM, DIM, DIM, DIM))
    cfg = Fast3RConfig(encoder=enc, decoder=dec, head=head,
                       with_local_head=True)
    return Fast3R(cfg, init_fast3r(jax.random.key(0), cfg))


def _make_views(shapes, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "img": rng.standard_normal((1, h, w, 3)).astype(np.float32),
            "true_shape": np.int32([[h, w]]),
            "idx": i,
            "instance": str(i),
        }
        for i, (h, w) in enumerate(shapes)
    ]


def test_inference_contract_same_shape():
    model = _tiny_model()
    views = _make_views([(48, 64)] * 3)
    out = inference(views, model, verbose=False)
    assert set(out) == {"views", "preds", "loss"}
    assert len(out["preds"]) == 3
    for p in out["preds"]:
        assert p["pts3d_in_other_view"].shape == (1, 48, 64, 3)
        assert p["conf"].shape == (1, 48, 64)
        assert p["conf"].min() >= 1.0
        assert p["pts3d_local"].shape == (1, 48, 64, 3)


def test_inference_contract_mixed_shapes_and_profiling():
    model = _tiny_model()
    views = _make_views([(48, 64), (64, 48), (32, 32)])
    out, info = inference(views, model, verbose=False, profiling=True)
    assert out["preds"][0]["pts3d_in_other_view"].shape == (1, 48, 64, 3)
    assert out["preds"][1]["pts3d_in_other_view"].shape == (1, 64, 48, 3)
    assert out["preds"][2]["pts3d_in_other_view"].shape == (1, 32, 32, 3)
    assert "total_time" in info


def test_mixed_shape_forward_matches_reference():
    """Golden: variable-resolution inference vs the reference model in its
    inference configuration (PatchEmbedDust3R, per-view heads —
    utils/checkpoint_utils.py:36-38)."""
    m = ref_module("fast3r.models.fast3r")
    torch.manual_seed(0)
    ref_model = m.Fast3R(
        encoder_args=dict(
            encoder_type="croco", img_size=64, patch_size=16,
            patch_embed_cls="PatchEmbedDust3R", embed_dim=DIM,
            num_heads=HEADS, depth=ENC_DEPTH, mlp_ratio=4,
            pos_embed="RoPE100", attn_implementation="pytorch_naive",
        ),
        decoder_args=dict(
            decoder_type="fast3r", random_image_idx_embedding=False,
            enc_embed_dim=DIM, embed_dim=DIM, num_heads=HEADS, depth=DEC_DEPTH,
            attn_implementation="pytorch_naive",
        ),
        head_args=dict(
            head_type="dpt", output_mode="pts3d", landscape_only=False,
            depth_mode=("exp", -float("inf"), float("inf")),
            conf_mode=("exp", 1, float("inf")), patch_size=16,
            with_local_head=True,
        ),
    )
    ref_model.eval()

    params = torch_state_dict_to_params(
        ref_model.state_dict(), ENC_DEPTH, DEC_DEPTH, with_local_head=True,
        strip_net_prefix=False,
    )
    model = _tiny_model()
    model.params = jax.tree.map(jnp.asarray, params)

    shapes = [(48, 64), (64, 48), (32, 32)]
    views = _make_views(shapes, seed=3)
    torch_views = [
        {
            "img": torch.from_numpy(v["img"].transpose(0, 3, 1, 2).copy()),
            "true_shape": torch.from_numpy(v["true_shape"].copy()),
        }
        for v in views
    ]
    with torch.no_grad():
        ref_preds = ref_model(torch_views)
    my_preds = forward_views(model, views)

    for i in range(len(shapes)):
        for key in ("pts3d_in_other_view", "conf", "pts3d_local", "conf_local"):
            np.testing.assert_allclose(
                my_preds[i][key], ref_preds[i][key].numpy(),
                rtol=1e-3, atol=1e-4, err_msg=f"view {i} {key}",
            )
