"""The analytic FLOP counter must stay consistent with the documented
accounting (BENCHMARKS.md table) — bench.py's vs_baseline derives from it."""

from fast3r_tpu.models.fast3r import Fast3RConfig
from fast3r_tpu.utils.flops import (
    dpt_head_flops_per_image,
    fast3r_forward_flops,
)


def test_flagship_20v_512x384_breakdown():
    cfg = Fast3RConfig.flagship()
    f = fast3r_forward_flops(cfg, 20, 384, 512)
    # documented values (BENCHMARKS.md), 1% tolerance
    assert abs(f["encoder"] / 1e12 - 10.46) < 0.11
    assert abs(f["decoder_linears"] / 1e12 - 9.31) < 0.10
    assert abs(f["decoder_attention"] / 1e12 - 23.19) < 0.24
    assert abs(f["heads"] / 1e12 - 7.49) < 0.08
    assert abs(f["total"] / 1e12 - 50.45) < 0.5
    assert abs(f["per_image"] / 1e12 - 2.523) < 0.03


def test_decoder_attention_quadratic_in_views():
    cfg = Fast3RConfig.flagship()
    f1 = fast3r_forward_flops(cfg, 10, 384, 512)
    f2 = fast3r_forward_flops(cfg, 20, 384, 512)
    assert abs(f2["decoder_attention"] / f1["decoder_attention"] - 4.0) < 1e-6
    # linear phases scale linearly
    for k in ("encoder", "heads"):
        assert abs(f2[k] / f1[k] - 2.0) < 1e-6


def test_single_head_excluded_without_local():
    base = Fast3RConfig.base()  # with_local_head=False
    f = fast3r_forward_flops(base, 4, 384, 512)
    per_head = dpt_head_flops_per_image(base.head, 384, 512)
    assert abs(f["heads"] - 4 * per_head) < 1e-6
