"""Fast3R global-fusion transformer decoder.

Behavioral reference: fast3r/models/fast3r.py:654-808 (Fast3RDecoder):
  * all views' encoder tokens are fused into one (B, S=V*P, D_enc) sequence;
  * linear ``decoder_embed``: D_enc -> D_dec;
  * an image-index embedding (1D sincos table over indices 0..999, float64 host
    table cast to f32, fast3r.py:691-697) is added per token according to its
    view's image id.  During training the ids are a random permutation per
    sample with view 0 pinned to id 0 (fast3r.py:715-766) so the model
    generalizes beyond the training view count; at inference ids = arange(V);
  * depth x global self-attention pre-LN ViT blocks, NO RoPE, block LayerNorm
    eps = 1e-5 (torch default: fast3r.py:683 passes nn.LayerNorm), final
    ``dec_norm`` eps = 1e-6;
  * inference-time attention-entropy bias: softmax scale becomes
    ``head_dim**-0.5 * sqrt(log(137)/log(20))`` (blocks.py:118-124,151-154;
    enabled for the decoder via attn_bias_for_inference_enabled=True,
    fast3r.py:667,684-685);
  * returns the pre-projection encoder tokens (hook 0 for the DPT head) plus
    each block's output; the DPT head consumes hooks [0, d/2, 3d/4, d]
    (fast3r.py:144-155), with the last output normed.

TPU design notes: blocks run under segmented lax.scan so only the hooked
activations materialize (a full 25-layer output list at 1000 views x 1536
patches x 1024 dims would be ~150 GB); this is THE hot kernel — attention over
S = V*P tokens (15k at training, 1.5M at 1000-view inference) — backed by the
XLA fused attention or the Pallas flash kernel, sequence-sharded via shard_map
for multi-chip (fast3r_tpu/parallel).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fast3r_tpu.nn.layers import (
    Params,
    init_layernorm,
    init_linear,
    init_vit_stack,
    layernorm,
    linear,
    run_vit_stack,
)
from fast3r_tpu.ops.sincos import sincos_1d_table_np

MAX_IMAGE_IDX = 1000  # size of the image-index embedding table (fast3r.py:694)

# attention-entropy bias constants (blocks.py:121-124)
_TRAIN_SEQLEN = 20
_INFERENCE_SEQLEN = 137


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Mirrors the reference's decoder_args (flagship: super_long_training.yaml)."""

    enc_embed_dim: int = 1024
    embed_dim: int = 1024
    num_heads: int = 16
    depth: int = 24
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    random_image_idx_embedding: bool = True
    attn_bias_for_inference_enabled: bool = True
    attn_impl: str = "xla"
    block_ln_eps: float = 1e-5  # torch nn.LayerNorm default (fast3r.py:683)
    final_ln_eps: float = 1e-6
    # reference Block dropout knobs (blocks.py:196-239); every shipped
    # reference config sets them to 0.0.  Active only in the training
    # forward (needs the step rng); non-zero rates force the plain block path
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    # run blocks with LN/GELU/residual fused into the matmul kernels on TPU
    # (nn/fused_block.py); falls back automatically off-TPU / untileable shapes
    fused_blocks: bool = True

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    def attn_scale(self, is_training: bool) -> float:
        base = self.head_dim ** -0.5
        if not is_training and self.attn_bias_for_inference_enabled:
            return base * math.sqrt(
                math.log(_INFERENCE_SEQLEN) / math.log(_TRAIN_SEQLEN)
            )
        return base

    @property
    def hooks(self) -> Tuple[int, int, int, int]:
        """DPT hook indices into [enc_tokens, block1..blockD] (fast3r.py:148)."""
        d = self.depth
        return (0, d * 2 // 4, d * 3 // 4, d)


@functools.lru_cache(maxsize=8)
def image_idx_table(embed_dim: int) -> np.ndarray:
    """The (1000, D) image-index sincos table; a deterministic constant, baked
    into the compiled program rather than stored as a checkpointed buffer."""
    return sincos_1d_table_np(embed_dim, MAX_IMAGE_IDX)


def init_decoder(key, cfg: DecoderConfig, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "decoder_embed": init_linear(k1, cfg.enc_embed_dim, cfg.embed_dim,
                                     bias=True, dtype=dtype),
        "blocks": init_vit_stack(k2, cfg.depth, cfg.embed_dim, cfg.num_heads,
                                 cfg.mlp_ratio, cfg.qkv_bias, dtype=dtype),
        "norm": init_layernorm(cfg.embed_dim, dtype),
    }


def sample_random_image_ids(key, batch_size: int, num_views: int) -> jnp.ndarray:
    """Training-time random per-sample image ids (fast3r.py:715-766).

    View 0 is always id 0; views 1..V-1 get distinct random ids in [1, 999].
    The reference seeds a torch.Generator from the global RNG + rank
    (fast3r.py:702-713) for resume determinism; here the caller threads a JAX
    PRNG key through the train state, which gives the same property.

    Returns: (B, V) int32.
    """
    def one(k):
        perm = jax.random.permutation(k, MAX_IMAGE_IDX - 1)[: num_views - 1] + 1
        return jnp.concatenate([jnp.zeros((1,), perm.dtype), perm])

    return jax.vmap(one)(jax.random.split(key, batch_size)).astype(jnp.int32)


def decoder_forward(
    params: Params,
    cfg: DecoderConfig,
    feats: jnp.ndarray,
    image_ids: jnp.ndarray,
    is_training: bool = False,
    remat: bool = False,
    rng=None,
) -> Dict[int, jnp.ndarray]:
    """Run the fusion decoder.

    Args:
      feats: (B, S, D_enc) fused encoder tokens (all views concatenated along
        the patch axis, fast3r.py:776).
      image_ids: (B, S) int32 image id per token — arange-of-view at inference
        (fast3r.py:792-796), random permutation ids during training (expand
        :func:`sample_random_image_ids` per patch).
      is_training: selects the attention scale (entropy bias at inference).

    Returns:
      {hook: activation} for cfg.hooks — hook 0 is the raw encoder tokens,
      intermediate hooks are block outputs, the final hook is dec_norm'ed.
    """
    outputs: Dict[int, jnp.ndarray] = {0: feats}

    x = linear(params["decoder_embed"], feats)

    table = jnp.asarray(image_idx_table(cfg.embed_dim), dtype=x.dtype)
    x = x + table[image_ids]

    scale = cfg.attn_scale(is_training)
    inner_hooks = [h for h in cfg.hooks if 0 < h < cfg.depth]
    from fast3r_tpu.nn.fused_block import fused_block_supported

    fused = (cfg.fused_blocks and jax.default_backend() == "tpu"
             and fused_block_supported(
                 x.shape[:2], cfg.embed_dim,
                 int(cfg.embed_dim * cfg.mlp_ratio),
                 itemsize=x.dtype.itemsize))
    x, hooked = run_vit_stack(
        params["blocks"], x, cfg.num_heads, scale,
        rope_cos_sin=None, attn_impl=cfg.attn_impl, ln_eps=cfg.block_ln_eps,
        hooks=inner_hooks, depth=cfg.depth, remat=remat, fused=fused,
        drop=cfg.drop, attn_drop=cfg.attn_drop, droppath=cfg.drop_path,
        rng=rng if is_training else None,
    )
    outputs.update(hooked)
    outputs[cfg.depth] = layernorm(params["norm"], x, cfg.final_ln_eps)
    return outputs
