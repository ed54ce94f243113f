"""Invariants of the flash-attention block/split pickers (pure host logic).

These guard the VMEM-sizing rules that production dispatch depends on —
r2 regressions caught by hand: a 3840-column kv block with split=1 is a
15.7 MB fp32 score tile (> the 16 MB scoped limit), and an 8 MB-modeled
single-kernel config compiled to an 18 MB Mosaic stack.
"""

from fast3r_tpu.ops.flash_attention import (
    MAX_BLOCK_KV,
    MAX_BLOCK_KV_BWD,
    MAX_BLOCK_Q,
    MAX_BLOCK_Q_BWD,
    MAX_SUB_KV,
    _ones_width,
    _pick_block,
    _pick_single_blocks,
    _pick_split,
)


def test_pick_split_bounds_sub_chain():
    for bk in (128, 512, 1536, 2560, 3072, 3840):
        split = _pick_split(bk)
        assert bk % split == 0
        sub = bk // split
        assert sub <= MAX_SUB_KV
        assert sub % 8 == 0
        # the live fp32 score tile at the max q block stays under ~8 MB
        # (r3: the q-prescale lightened the VPU load enough that 2 sub-chains
        # of 1920 beat 3 of 1280 — (1024,3840)x2 compiles and runs at 90.5
        # TFLOP/s on hardware, so the budget provably admits a 7.5 MB tile)
        assert 4 * MAX_BLOCK_Q * sub <= 8 * 1024 * 1024


def test_pick_block_divides_and_prefers_lanes():
    assert _pick_block(15360, MAX_BLOCK_Q) == 1024
    assert _pick_block(15360, MAX_BLOCK_KV) == 3840
    assert _pick_block(15360, MAX_BLOCK_Q_BWD) == 512
    assert _pick_block(15360, MAX_BLOCK_KV_BWD) == 2560
    assert _pick_block(768, MAX_BLOCK_Q) == 768
    assert _pick_block(192, MAX_BLOCK_KV) == 192   # multiple-of-8 fallback
    assert _pick_block(100, MAX_BLOCK_Q) == 100 or _pick_block(
        100, MAX_BLOCK_Q) == 0  # 100 = 12.5 lanes -> sublane fallback only
    for s in (256, 768, 1536, 15360):
        b = _pick_block(s, MAX_BLOCK_KV)
        assert b and s % b == 0


def test_pick_single_blocks_vmem_model():
    # decoder scale: must refuse the single-kernel path
    assert _pick_single_blocks(1, 16, 15360, 15360, 64) == (0, 0)
    # encoder scales: must find a config whose divisors are honest
    for (b, h, s) in ((20, 16, 768), (1000, 16, 192), (2, 2, 256)):
        bb, hc = _pick_single_blocks(b, h, s, s, 64)
        assert bb and hc
        assert b % bb == 0 and h % hc == 0
        # modeled live set stays under the (paranoid) 5 MB budget
        fixed = 4 * s * s + 2 * s * s + 4 * s * 128 + 2 * s * 128
        per = 2 * 2 * (2 * s + 2 * s) * 64
        assert fixed + per * bb * hc <= 5 * 1024 * 1024


def test_ones_width_fills_lane_tile():
    assert _ones_width(64) == 64
    assert _ones_width(32) == 96
    assert _ones_width(128) == 128
    for d in (8, 32, 64, 96, 128, 256):
        assert (d + _ones_width(d)) % 128 == 0
