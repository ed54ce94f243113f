"""Checkpoint loading/export round trips."""

import numpy as np

import jax
import jax.numpy as jnp

from fast3r_tpu.inference import Fast3R
from fast3r_tpu.models.fast3r import Fast3RConfig, init_fast3r
from fast3r_tpu.utils.checkpoint_utils import convert_checkpoint_to_hf, load_model


def _tiny12():
    """tiny config with decoder depth 12 (HF export asserts the reference
    hook layout)."""
    from fast3r_tpu.models.decoder import DecoderConfig
    from fast3r_tpu.models.dpt_head import DPTHeadConfig
    from fast3r_tpu.models.encoder import EncoderConfig

    enc = EncoderConfig(img_size=64, embed_dim=64, num_heads=2, depth=2)
    dec = DecoderConfig(enc_embed_dim=64, embed_dim=64, num_heads=2, depth=12)
    head = DPTHeadConfig(dim_tokens=(64, 64, 64, 64))
    return Fast3RConfig(encoder=enc, decoder=dec, head=head)


def test_hf_export_and_reload_roundtrip(tmp_path):
    cfg = _tiny12()
    model = Fast3R(cfg, init_fast3r(jax.random.key(0), cfg))
    out = convert_checkpoint_to_hf(model, str(tmp_path / "hf"))

    model2 = Fast3R.from_pretrained(out)
    for a, b in zip(jax.tree.leaves(model.params),
                    jax.tree.leaves(model2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 2, 48, 64, 3)), jnp.float32
    )
    from fast3r_tpu.models.fast3r import fast3r_forward

    o1 = fast3r_forward(model.params, model.cfg, imgs)
    o2 = fast3r_forward(model2.params, model2.cfg, imgs)
    np.testing.assert_allclose(
        np.asarray(o1["pts3d_in_other_view"]),
        np.asarray(o2["pts3d_in_other_view"]), atol=1e-5,
    )


def test_hf_roundtrip_llama_and_dino_variants(tmp_path):
    """Variant-aware checkpoint conversion (utils/checkpoint._variant_key_map):
    llama-decoder and dino-encoder models export to the HF layout and reload
    bit-identically, then run a forward (VERDICT r2 item 8)."""
    from fast3r_tpu.models.decoder import DecoderConfig
    from fast3r_tpu.models.dino_encoder import DinoEncoderConfig
    from fast3r_tpu.models.dpt_head import DPTHeadConfig
    from fast3r_tpu.models.encoder import EncoderConfig
    from fast3r_tpu.models.fast3r import fast3r_forward
    from fast3r_tpu.models.llama_decoder import LlamaDecoderConfig

    head14 = DPTHeadConfig(patch_size=14, dim_tokens=(64, 64, 64, 64),
                           feature_dim=32, last_dim=16,
                           layer_dims=(8, 16, 24, 32))
    variants = {
        "llama": Fast3RConfig(
            encoder=EncoderConfig(img_size=56, patch_size=14, embed_dim=64,
                                  num_heads=2, depth=2),
            decoder=LlamaDecoderConfig(enc_embed_dim=64, embed_dim=64,
                                       n_layers=4, n_heads=2,
                                       random_image_idx_embedding=False,
                                       attn_impl="naive"),
            head=head14),
        "dino": Fast3RConfig(
            encoder=DinoEncoderConfig(patch_size=14, embed_dim=64, depth=2,
                                      num_heads=2, pos_embed_size=4,
                                      attn_impl="naive"),
            decoder=DecoderConfig(enc_embed_dim=64, embed_dim=64, num_heads=2,
                                  depth=4),
            head=head14),
    }
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.standard_normal((1, 2, 56, 56, 3)), jnp.float32)
    for tag, cfg in variants.items():
        model = Fast3R(cfg, init_fast3r(jax.random.key(1), cfg))
        out = convert_checkpoint_to_hf(model, str(tmp_path / tag))
        model2 = Fast3R.from_pretrained(out)
        a, b = jax.tree.leaves(model.params), jax.tree.leaves(model2.params)
        assert len(a) == len(b), tag
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                          err_msg=tag)
        o = fast3r_forward(model2.params, model2.cfg, imgs)
        assert np.isfinite(np.asarray(o["pts3d_in_other_view"])).all(), tag


def test_load_model_from_run_dir(tmp_path):
    from fast3r_tpu.data.loader import get_data_loader
    from fast3r_tpu.train.losses import LossConfig
    from fast3r_tpu.train.step import OptimConfig
    from fast3r_tpu.train.trainer import Trainer, TrainerConfig

    # config must be representable in the reference *_args layout (the run-dir
    # snapshot format), i.e. default DPT head dims
    cfg = _tiny12()
    run_dir = tmp_path / "run"
    trainer = Trainer(cfg, OptimConfig(warmup_steps=2, total_steps=10),
                      LossConfig(),
                      TrainerConfig(max_epochs=1, run_dir=str(run_dir),
                                    ckpt_every_n_epochs=100, remat=False))
    loader = get_data_loader(
        "4 @ DummyMultiview(num_scenes=4, num_views=2, "
        "resolution=[(64, 48)], seed=777)", batch_size=2, num_workers=0)
    trainer.fit(loader, resume=False)

    # write the config snapshot the run dir contract requires
    import yaml

    from fast3r_tpu.utils.checkpoint_utils import config_to_reference_args

    with open(run_dir / "config.yaml", "w") as f:
        yaml.safe_dump({"model": config_to_reference_args(cfg)}, f)

    model = load_model(str(run_dir))
    # inference overrides applied
    assert model.cfg.encoder.patch_embed_cls == "PatchEmbedDust3R"
    assert model.cfg.landscape_only is False
    for a, b in zip(jax.tree.leaves(trainer.state.params),
                    jax.tree.leaves(model.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
