"""Benchmark: flagship Fast3R forward throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: images/sec/chip for the flagship model (ViT-L/16 + 1024x24 fusion
decoder + dual DPT heads) at 512x384, bf16 compute — the driver's north-star
resolution (BASELINE.json).

vs_baseline: the reference repo publishes no benchmark numbers (BASELINE.md),
so the baseline is an analytic A100-80GB estimate documented here:
~1.35 TFLOPs/image forward (encoder 0.47 + decoder 0.48 + dual DPT heads
~0.40 at 512x384) at 40% of A100 bf16 peak (312 TFLOP/s) -> ~92 images/sec.
Replace with a measured A100 number when one is available.
"""

import json
import time

import numpy as np

A100_BASELINE_IMGS_PER_SEC = 92.0

NUM_VIEWS = 20
H, W = 384, 512  # landscape storage layout (H <= W)
WARMUP = 2
ITERS = 5


def main():
    import jax
    import jax.numpy as jnp

    from fast3r_tpu.models.fast3r import Fast3RConfig, fast3r_forward, init_fast3r

    cfg = Fast3RConfig.flagship()
    params = init_fast3r(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, NUM_VIEWS, H, W, 3)),
        jnp.bfloat16,
    )

    # chunk the DPT heads (reference: max_parallel_views_for_head=25,
    # fast3r.py:68) — unchunked, the head intermediates for 20 views at
    # 512x384 (e.g. a (20,192,256,256) path tensor) exceed single-chip HBM
    fwd = jax.jit(lambda p, x: fast3r_forward(p, cfg, x, head_chunk_views=4))
    out = fwd(params, imgs)
    jax.block_until_ready(out)

    for _ in range(WARMUP - 1):
        jax.block_until_ready(fwd(params, imgs))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        jax.block_until_ready(fwd(params, imgs))
    dt = (time.perf_counter() - t0) / ITERS

    imgs_per_sec = NUM_VIEWS / dt
    print(json.dumps({
        "metric": f"images/sec/chip ({NUM_VIEWS} views @ {W}x{H}, bf16, flagship)",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / A100_BASELINE_IMGS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
