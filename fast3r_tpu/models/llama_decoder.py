"""Llama-style alternative fusion decoder.

Behavioral reference: fast3r/models/fast3r.py:810-968 (LlamaDecoder) and
fast3r/models/components/llama.py (TorchTitan-style primitives):
  * RMSNorm (fp32 internal, llama.py:137-163), SwiGLU FeedForward with
    hidden = round_up(2/3 * 4 * dim, multiple_of) (llama.py:250-291),
    GQA attention with n_rep key/value head repetition (llama.py:166-248);
  * rotary embedding on *consecutive pairs* (complex multiply,
    llama.py:96-122) — note this pairing differs from the encoder's RoPE2D
    half-split;
  * the image index is encoded via 1D RoPE: freqs_cis rows are selected per
    token by its view's image id (random permutation during training, arange
    at inference — fast3r.py:876-951);
  * a learnable ``view0_embed`` is added to view-0 tokens before EVERY layer
    (fast3r.py:841-842, 958-960);
  * bidirectional attention (is_causal=False, fast3r.py:824);
  * hook 0 is the POST-projection embedding (unlike Fast3RDecoder which
    records pre-projection encoder tokens — fast3r.py:930-935 vs :776-779).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fast3r_tpu.models.decoder import MAX_IMAGE_IDX, sample_random_image_ids
from fast3r_tpu.nn.layers import Params, _kaiming_uniform, init_linear, linear
from fast3r_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class LlamaDecoderConfig:
    enc_embed_dim: int = 1024
    embed_dim: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    n_kv_heads: Optional[int] = None
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_seq_len: int = MAX_IMAGE_IDX
    random_image_idx_embedding: bool = True
    attn_impl: str = "xla"
    # run blocks with RMSNorm/SwiGLU/residual fused into the matmul kernels
    # on TPU (nn/fused_block.py); auto-falls-back off-TPU / untileable shapes
    fused_blocks: bool = True

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.n_heads

    @property
    def kv_heads(self) -> int:
        return self.n_kv_heads or self.n_heads

    @property
    def ffn_hidden(self) -> int:
        hidden = int(2 * (4 * self.embed_dim) / 3)
        if self.ffn_dim_multiplier is not None:
            hidden = int(self.ffn_dim_multiplier * hidden)
        m = self.multiple_of
        return m * ((hidden + m - 1) // m)

    @property
    def hooks(self) -> Tuple[int, int, int, int]:
        d = self.n_layers
        return (0, d * 2 // 4, d * 3 // 4, d)


@functools.lru_cache(maxsize=8)
def freqs_cos_sin_table(head_dim: int, end: int, theta: float
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag parts of precompute_freqs_cis (llama.py:41-61)."""
    freqs = 1.0 / (theta ** (np.arange(0, head_dim, 2)[: head_dim // 2]
                             .astype(np.float64) / head_dim))
    t = np.arange(end, dtype=np.float64)
    f = np.outer(t, freqs)
    return np.cos(f).astype(np.float32), np.sin(f).astype(np.float32)


def apply_rotary_pairs(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
                       ) -> jnp.ndarray:
    """Rotate consecutive pairs: x (B, S, H, D); cos/sin (B, S, D/2)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    x0 = xf[..., 0::2]
    x1 = xf[..., 1::2]
    c = cos[:, :, None, :]
    s = sin[:, :, None, :]
    o0 = x0 * c - x1 * s
    o1 = x0 * s + x1 * c
    out = jnp.stack([o0, o1], axis=-1).reshape(x.shape)
    return out.astype(dtype)


def init_rmsnorm(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype)}


def rmsnorm(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return y.astype(x.dtype) * p["scale"].astype(x.dtype)


def init_llama_block(key, cfg: LlamaDecoderConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 7)
    d, hd = cfg.embed_dim, cfg.head_dim
    return {
        "attention_norm": init_rmsnorm(d, dtype),
        "attn": {
            "wq": init_linear(ks[0], d, cfg.n_heads * hd, bias=False, dtype=dtype),
            "wk": init_linear(ks[1], d, cfg.kv_heads * hd, bias=False, dtype=dtype),
            "wv": init_linear(ks[2], d, cfg.kv_heads * hd, bias=False, dtype=dtype),
            "wo": init_linear(ks[3], cfg.n_heads * hd, d, bias=False, dtype=dtype),
        },
        "ffn_norm": init_rmsnorm(d, dtype),
        "ffn": {
            "w1": init_linear(ks[4], d, cfg.ffn_hidden, bias=False, dtype=dtype),
            "w2": init_linear(ks[5], cfg.ffn_hidden, d, bias=False, dtype=dtype),
            "w3": init_linear(ks[6], d, cfg.ffn_hidden, bias=False, dtype=dtype),
        },
    }


def llama_block(p: Params, x: jnp.ndarray, cos, sin, cfg: LlamaDecoderConfig,
                fused: bool = False) -> jnp.ndarray:
    """Llama block.  ``fused=True`` runs the RMSNorm/SwiGLU/residual
    elementwise work inside the matmul kernels (nn/fused_block.py,
    fused_llama_block) with a custom VJP recomputing through this plain
    composition."""
    if fused:
        from fast3r_tpu.nn.fused_block import fused_llama_block

        return fused_llama_block(p, x, cos, sin, cfg)
    B, S, D = x.shape
    h = rmsnorm(p["attention_norm"], x, cfg.norm_eps)
    q = linear(p["attn"]["wq"], h).reshape(B, S, cfg.n_heads, cfg.head_dim)
    k = linear(p["attn"]["wk"], h).reshape(B, S, cfg.kv_heads, cfg.head_dim)
    v = linear(p["attn"]["wv"], h).reshape(B, S, cfg.kv_heads, cfg.head_dim)
    q = apply_rotary_pairs(q, cos, sin)
    k = apply_rotary_pairs(k, cos, sin)
    n_rep = cfg.n_heads // cfg.kv_heads
    if n_rep > 1:  # GQA: repeat kv heads (llama.py:125-134)
        k = jnp.repeat(k, n_rep, axis=2)
        v = jnp.repeat(v, n_rep, axis=2)
    o = dot_product_attention(q, k, v, scale=cfg.head_dim ** -0.5,
                              impl=cfg.attn_impl)
    x = x + linear(p["attn"]["wo"], o.reshape(B, S, D))

    h = rmsnorm(p["ffn_norm"], x, cfg.norm_eps)
    gate = jax.nn.silu(linear(p["ffn"]["w1"], h)) * linear(p["ffn"]["w3"], h)
    return x + linear(p["ffn"]["w2"], gate)


def init_llama_decoder(key, cfg: LlamaDecoderConfig, dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    layer_keys = jax.random.split(k2, cfg.n_layers)
    layers = [init_llama_block(k, cfg, dtype) for k in layer_keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    # view0_embed ~ N(0, 0.02) (fast3r.py:841-842)
    v0 = jax.random.normal(k3, (cfg.embed_dim,), dtype) * 0.02
    return {
        "decoder_embed": init_linear(k1, cfg.enc_embed_dim, cfg.embed_dim,
                                     bias=True, dtype=dtype),
        "layers": stacked,
        "norm": init_rmsnorm(cfg.embed_dim, dtype),
        "view0_embed": v0,
    }


def llama_decoder_forward(
    params: Params,
    cfg: LlamaDecoderConfig,
    feats: jnp.ndarray,
    image_ids: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    num_views: Optional[int] = None,
) -> Dict[int, jnp.ndarray]:
    """Run the Llama fusion decoder on fused tokens (B, S, D_enc).

    image_ids: (B, S) per-token view index (0..V-1) used for the view-0 mask;
    the rope index is the (possibly random) image id (fast3r.py:937-951).
    """
    B, S, _ = feats.shape
    x = linear(params["decoder_embed"], feats)

    # random ids whenever the flag is set — the reference has no eval gate
    # (fast3r.py:938-945); fixed default key keeps inference deterministic
    if cfg.random_image_idx_embedding and num_views is not None:
        if rng is None:
            rng = jax.random.key(0)
        vids = sample_random_image_ids(rng, B, num_views)      # (B, V)
        P = S // num_views
        rope_ids = jnp.repeat(vids, P, axis=1)                 # (B, S)
    else:
        rope_ids = image_ids
    cos_t, sin_t = freqs_cos_sin_table(cfg.head_dim, cfg.max_seq_len,
                                       cfg.rope_theta)
    cos = jnp.asarray(cos_t)[rope_ids]  # (B, S, hd/2)
    sin = jnp.asarray(sin_t)[rope_ids]

    view0_mask = (image_ids == 0)[..., None].astype(x.dtype)
    v0 = params["view0_embed"].astype(x.dtype)

    outputs: Dict[int, jnp.ndarray] = {0: x}
    from fast3r_tpu.nn.fused_block import fused_llama_supported

    fused = (cfg.fused_blocks and jax.default_backend() == "tpu"
             and fused_llama_supported(x.shape[:2], cfg,
                                       itemsize=x.dtype.itemsize))
    block = functools.partial(llama_block, cos=cos, sin=sin, cfg=cfg,
                              fused=fused)

    def scan_fn(carry, layer_params):
        # view0_embed added before every layer (fast3r.py:958-960)
        h = carry + view0_mask * v0
        return block(layer_params, h), None

    boundaries = sorted({h for h in cfg.hooks if 0 < h <= cfg.n_layers})
    pos = 0
    for b in boundaries:
        sliced = jax.tree.map(lambda a: a[pos:b], params["layers"])
        x, _ = jax.lax.scan(scan_fn, x, sliced)
        outputs[b] = x
        pos = b
    outputs[cfg.n_layers] = rmsnorm(params["norm"], x, cfg.norm_eps)
    return outputs
