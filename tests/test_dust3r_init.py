"""DUSt3R partial checkpoint initialization (fast3r.py:162-239 equivalent)."""

import numpy as np

import jax

from fast3r_tpu.models.fast3r import Fast3RConfig, init_fast3r
from fast3r_tpu.utils.checkpoint import (
    load_dust3r_checkpoint_partial,
    params_to_torch_state_dict,
)
from tests.test_checkpoint_utils import _tiny12


def test_dust3r_partial_init():
    cfg = _tiny12()
    donor = init_fast3r(jax.random.key(0), cfg)
    target = init_fast3r(jax.random.key(1), cfg)

    # build a DUSt3R-style state dict from the donor: encoder tensors under
    # bare names, global head under downstream_head1
    full_sd = params_to_torch_state_dict(
        donor, cfg.encoder.depth, cfg.decoder.depth, with_local_head=True)
    sd = {}
    for k, v in full_sd.items():
        if k.startswith("encoder.patch_embed.proj"):
            sd[k.replace("encoder.", "")] = v
        elif k.startswith("encoder.enc_blocks") or k.startswith("encoder.enc_norm"):
            sd[k.replace("encoder.", "")] = v
        elif k.startswith("downstream_head."):
            sd[k.replace("downstream_head.", "downstream_head1.")] = v

    out = load_dust3r_checkpoint_partial(target, sd, cfg.encoder.depth)

    # encoder + global head came from the donor
    np.testing.assert_allclose(
        np.asarray(out["encoder"]["patch_embed"]["w"]),
        np.asarray(donor["encoder"]["patch_embed"]["w"]))
    np.testing.assert_allclose(
        np.asarray(out["encoder"]["blocks"]["attn"]["qkv"]["w"]),
        np.asarray(donor["encoder"]["blocks"]["attn"]["qkv"]["w"]))
    np.testing.assert_allclose(
        np.asarray(out["head_global"]["head"]["conv3"]["w"]),
        np.asarray(donor["head_global"]["head"]["conv3"]["w"]))
    # decoder + local head kept the target init
    np.testing.assert_allclose(
        np.asarray(out["decoder"]["decoder_embed"]["w"]),
        np.asarray(target["decoder"]["decoder_embed"]["w"]))
    np.testing.assert_allclose(
        np.asarray(out["head_local"]["head"]["conv3"]["w"]),
        np.asarray(target["head_local"]["head"]["conv3"]["w"]))
