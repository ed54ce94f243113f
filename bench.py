"""Benchmark: flagship Fast3R forward throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: images/sec/chip for the flagship model (ViT-L/16 + 1024x24 fusion
decoder + dual DPT heads) at 512x384, bf16 compute — the driver's north-star
resolution (BASELINE.json).

Timing notes for the axon (tunneled-TPU) platform: jax.block_until_ready does
NOT reliably synchronize over the tunnel, and every distinct program pays a
slow remote compile.  So the bench chains ITERS forwards inside one jitted
fori_loop (inputs perturbed per-iteration so XLA cannot hoist the body),
reduces outputs to a scalar checksum on device, and forces execution by
fetching that scalar; the measured wall time is divided by ITERS.

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
ITERS = 5


def main():
    import jax
    import jax.numpy as jnp

    from fast3r_tpu.models.fast3r import Fast3RConfig, fast3r_forward, init_fast3r

    cfg = Fast3RConfig.flagship(attn_impl="pallas")
    params = init_fast3r(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, NUM_VIEWS, H, W, 3)),
        jnp.bfloat16,
    )

    def one_forward(p, x):
        # chunk the DPT heads (reference: max_parallel_views_for_head=25,
        # fast3r.py:68) — unchunked, the head intermediates for 20 views at
        # 512x384 exceed single-chip HBM
        out = fast3r_forward(p, cfg, x, head_chunk_views=4)
        return out["conf"].astype(jnp.float32).sum()

    def run_n(p, x, n):
        def body(i, acc):
            # perturb input per iteration so XLA cannot hoist the forward
            xi = x * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8))
            return acc + one_forward(p, xi)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    run1 = jax.jit(lambda p, x: run_n(p, x, 1))
    runN = jax.jit(lambda p, x: run_n(p, x, ITERS))

    # warmup/compile both programs
    float(np.asarray(run1(params, imgs)))
    float(np.asarray(runN(params, imgs)))

    t0 = time.perf_counter()
    float(np.asarray(run1(params, imgs)))
    t1 = float(time.perf_counter() - t0)
    t0 = time.perf_counter()
    float(np.asarray(runN(params, imgs)))
    tN = float(time.perf_counter() - t0)

    # (tN - t1) spans exactly ITERS-1 forwards with the tunnel roundtrip
    # latency cancelled out
    per_iter = (tN - t1) / (ITERS - 1)
    imgs_per_sec = NUM_VIEWS / per_iter
    print(json.dumps({
        "metric": f"images/sec/chip ({NUM_VIEWS} views @ {W}x{H}, bf16, flagship)",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / A100_BASELINE_IMGS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
