"""The benchmark checksum must keep the WHOLE forward alive through XLA.

r5 integrity lesson: a checksum that consumed only `conf` let XLA's
while-loop simplifier DCE the entire local head and the pts3d exp-map out of
the compiled pass (~27 ms at the headline shape) while the FLOP accounting
(fast3r_tpu/utils/flops.py) kept charging for dual heads — every recorded
headline r1..r5-2 was inflated ~6%.  bench.py now sums every output; this
test pins that property with compiled-cost analysis on the tiny config so a
future checksum refactor cannot silently reintroduce the pruning.

No reference counterpart (the reference benchmarks with torch profiler wall
clocks, fast3r/models/fast3r.py profiling_info); this guards OUR protocol.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fast3r_tpu.models.fast3r import Fast3RConfig, fast3r_forward, init_fast3r

V, H, W = 4, 48, 64


def _compiled_flops(consume):
    cfg = Fast3RConfig.tiny()
    params = init_fast3r(jax.random.key(0), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, V, H, W, 3)),
        jnp.float32,
    )

    def run(p, x):
        out = fast3r_forward(p, cfg, x, head_chunk_views=2)
        return consume(out)

    compiled = jax.jit(run).lower(params, imgs).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca["flops"])


def test_all_outputs_checksum_defeats_dce():
    """bench.py's all-outputs checksum must compile >= 1.7x the FLOPs of the
    known-bad conf-only checksum (tiny-config audit measured 216.9 vs 123.1
    MFLOP — the pruned share is the local head + pts3d postprocess)."""
    full = _compiled_flops(
        lambda out: sum(v.astype(jnp.float32).sum() for v in out.values())
    )
    conf_only = _compiled_flops(lambda out: out["conf"].astype(jnp.float32).sum())
    assert full > 1.5 * conf_only, (full, conf_only)


def test_local_head_survives_in_compiled_graph():
    """Dropping pts3d_local/conf_local from the checksum must change the
    compiled FLOPs — i.e. the local head is genuinely live under the full
    checksum (not re-derived from shared work XLA would keep anyway)."""
    full = _compiled_flops(
        lambda out: sum(v.astype(jnp.float32).sum() for v in out.values())
    )
    no_local = _compiled_flops(
        lambda out: sum(
            v.astype(jnp.float32).sum()
            for k, v in out.items() if not k.endswith("_local")
        )
    )
    assert full > 1.2 * no_local, (full, no_local)
