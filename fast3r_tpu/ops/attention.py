"""Multi-head attention compute op with selectable backend.

Behavioral reference: fast3r/croco/models/blocks.py:109-194 (class Attention).
The reference selects between an explicit QK^T-softmax ("pytorch_naive") and
torch SDPA flash/efficient backends; numerics in fp32 are identical across
backends up to reduction order.

Backends here:
  * "naive":  explicit einsum + softmax.  Bit-matches the fp32 torch fallback
              (used for golden parity tests).
  * "xla":    jax.nn.dot_product_attention — XLA's fused attention; on TPU this
              lowers to an MXU-tiled flash-style loop chosen by the compiler.
  * "pallas": hand-written Pallas TPU flash-attention kernel (ops/flash_attention.py),
              used for the long-sequence fusion decoder.
  * "batched": single-program manual-DMA kernel for many small independent
              heads (ops/batched_attention.py) — the encoder's per-view
              attention.  On non-TPU backends this dispatches to "xla"
              (the kernel would run in the pallas interpreter, far too slow
              for the CPU test suite; its numerics are gated separately by
              tests/test_batched_attention.py).

Layout: (B, N, H, D) throughout ("BNHD"), which avoids transposes around the
qkv projections and matches jax.nn.dot_product_attention.

Dtype policy: softmax statistics are always accumulated in fp32 (better than the
reference's bf16 softmax; on TPU the MXU accumulates in fp32 anyway).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    impl: str = "xla",
) -> jnp.ndarray:
    """Scaled dot-product attention.

    Args:
      q, k, v: (B, N, H, D).
      scale: softmax scale (head_dim**-0.5, or the entropy-scaled inference bias
        of blocks.py:118-124).
      impl: "naive" | "xla" | "pallas".

    Returns:
      (B, N, H, D) in q.dtype.
    """
    if impl == "auto":
        # short sequences: XLA wins (fuses RoPE/projection epilogues across
        # the op; measured 175 vs 227 ms for the 20-view encoder); long
        # sequences: the fp32 logits would not fit, use the flash kernel
        B, N, H, _ = q.shape
        logits_bytes = 4 * B * H * N * k.shape[1]
        impl = "xla" if logits_bytes <= 1 << 30 else "pallas"
    if impl == "naive":
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        logits = logits * jnp.float32(scale)
        w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", w, v)
    if impl == "xla":
        if q.dtype == jnp.bfloat16:
            # bf16 logits: XLA materializes the logits at the dot boundary
            # either way (cost_analysis r2: 0.8 GB fp32 per encoder layer,
            # the whole path HBM-bound at 3.6 ms/layer), so round them to
            # bf16 and keep the softmax statistics in fp32 on the fly
            # (registers, not HBM).  Precision note: this matches torch's
            # MATH-backend SDPA under bf16 autocast (bf16 logits); torch's
            # flash/mem-efficient SDPA keeps fp32-accumulated logits, as the
            # "pallas" impl here does — so "xla" and "pallas" differ by bf16
            # logit rounding (~2^-9 relative, gated by
            # tests/test_flash_attention.py::test_xla_bf16_vs_pallas).
            # MXU accumulation is fp32 regardless of the output dtype.
            qs = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", qs, k,
                preferred_element_type=jnp.bfloat16)
            w = jax.nn.softmax(
                logits.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
            return jnp.einsum("bhqk,bkhd->bqhd", w, v)
        return jax.nn.dot_product_attention(q, k, v, scale=scale)
    if impl == "pallas":
        from fast3r_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    if impl == "batched":
        if jax.default_backend() == "tpu":
            from fast3r_tpu.ops.batched_attention import batched_attention

            return batched_attention(q, k, v, scale)
        return dot_product_attention(q, k, v, scale, impl="xla")
    raise ValueError(f"unknown attention impl {impl!r}")
