"""Golden tests: the device preprocessing (ops/preprocess.py) against the PIL
oracle (utils/image.py load_images — the exact port of the reference's
dust3r/utils/image.py:76-159)."""

import numpy as np
import PIL.Image
import pytest

import jax
import jax.numpy as jnp

from fast3r_tpu.ops.preprocess import make_plan, preprocess_device
from fast3r_tpu.utils.image import load_images


def _smooth_image(h, w, seed=0):
    """Low-frequency random image — avoids aliasing-dominated filter
    differences so the tolerance tests PIL-vs-jax filter agreement."""
    rng = np.random.default_rng(seed)
    small = rng.uniform(0, 255, size=(max(2, h // 16), max(2, w // 16), 3))
    img = PIL.Image.fromarray(small.astype(np.uint8)).resize(
        (w, h), PIL.Image.BICUBIC)
    return np.asarray(img, np.uint8)


SHAPES = [(480, 640), (640, 480), (512, 512), (1080, 1920), (333, 517)]


@pytest.mark.parametrize("src_hw", SHAPES)
@pytest.mark.parametrize("size", [512, 224])
def test_plan_matches_pil_shapes(src_hw, size):
    raw = _smooth_image(*src_hw)
    views = load_images([PIL.Image.fromarray(raw)], size=size, verbose=False)
    oracle_hw = tuple(int(x) for x in views[0]["true_shape"][0])
    plan = make_plan(src_hw, size)
    assert plan.out_hw == oracle_hw, (src_hw, size)


def test_plan_square_ok_and_crop_to_landscape():
    raw = _smooth_image(512, 512)
    views = load_images([PIL.Image.fromarray(raw)], size=512, square_ok=True,
                        verbose=False)
    assert make_plan((512, 512), 512, square_ok=True).out_hw == tuple(
        int(x) for x in views[0]["true_shape"][0])
    raw = _smooth_image(600, 500)
    views = load_images([PIL.Image.fromarray(raw)], size=512,
                        crop_to_landscape=True, verbose=False)
    assert make_plan((600, 500), 512, crop_to_landscape=True).out_hw == tuple(
        int(x) for x in views[0]["true_shape"][0])


@pytest.mark.parametrize("src_hw", [(480, 640), (1080, 1920), (333, 517)])
def test_pixels_match_pil_oracle(src_hw):
    raw = _smooth_image(*src_hw, seed=1)
    views = load_images([PIL.Image.fromarray(raw)], size=512, verbose=False)
    oracle = views[0]["img"][0]  # (h, w, 3) in [-1, 1]
    plan = make_plan(src_hw, 512)
    got = np.asarray(preprocess_device(jnp.asarray(raw[None]), plan)[0])
    assert got.shape == oracle.shape
    # [-1, 1] scale: 2/255 per uint8 LSB.  Lanczos implementations agree to
    # a couple of LSBs on smooth content.
    err = np.abs(got - oracle)
    assert err.mean() < 2.5 / 255, err.mean()
    assert np.quantile(err, 0.99) < 8 / 255, np.quantile(err, 0.99)


def test_fused_with_encoder_single_program():
    """preprocess_device composes with the model under ONE jit (the
    north-star ingest program), raw uint8 in."""
    from fast3r_tpu.models.fast3r import Fast3RConfig, fast3r_forward, init_fast3r

    cfg = Fast3RConfig.tiny()
    params = init_fast3r(jax.random.key(0), cfg)
    plan = make_plan((96, 128), 64)

    @jax.jit
    def fused(p, raw):
        imgs = preprocess_device(raw, plan)[None]  # (1, V, h, w, 3)
        return fast3r_forward(p, cfg, imgs)

    raw = np.stack([_smooth_image(96, 128, seed=s) for s in range(2)])
    out = fused(params, jnp.asarray(raw))
    h, w = plan.out_hw
    assert out["pts3d_in_other_view"].shape == (1, 2, h, w, 3)
    assert np.isfinite(np.asarray(out["conf"])).all()


def test_inference_from_raw_contract():
    """inference_from_raw returns the reference output contract."""
    from fast3r_tpu.inference import Fast3R, inference_from_raw
    from fast3r_tpu.models.fast3r import Fast3RConfig

    model = Fast3R.from_random(Fast3RConfig.tiny())
    raw = [_smooth_image(96, 128, seed=s) for s in range(3)]
    out = inference_from_raw(raw, model, size=64, verbose=False)
    assert len(out["preds"]) == 3
    p0 = out["preds"][0]
    h, w = out["views"][0]["true_shape"][0]
    assert p0["pts3d_in_other_view"].shape == (1, h, w, 3)
    assert p0["conf"].min() >= 1.0
    assert p0["pts3d_local"].shape == (1, h, w, 3)
