"""Torch <-> JAX parameter conversion for Fast3R checkpoints.

The published Fast3R weights (HF hub "jedyang97/Fast3R_ViT_Large_512") are a
torch state_dict of the reference fast3r/models/fast3r.py:45 module tree:
``encoder.* decoder.* downstream_head.* downstream_head_local.*``.  This module
maps those tensors into the fast3r_tpu param pytree (and back, which the golden
parity tests use to load identical weights into both implementations).

Layout conversions:
  Linear  torch (out, in)            -> jax (in, out)          transpose
  Conv2d  torch OIHW (out,in,kh,kw)  -> jax HWIO (kh,kw,in,out) (2,3,1,0)
  ConvT2d torch (in,out,kh,kw)       -> jax (kh,kw,in,out)      (2,3,0,1)
  LayerNorm weight/bias              -> scale/bias

Also handles the Lightning checkpoint convention (keys prefixed ``net.``,
reference multiview_dust3r_module.py:1010-1017).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

Params = Dict[str, Any]


def _block_entries(prefix: str, path: Tuple) -> List[Tuple[str, Tuple, str]]:
    """Per-layer ViT block tensors (reference blocks.py:109-239)."""
    return [
        (f"{prefix}norm1", path + ("norm1",), "ln"),
        (f"{prefix}attn.qkv", path + ("attn", "qkv"), "linear"),
        (f"{prefix}attn.proj", path + ("attn", "proj"), "linear"),
        (f"{prefix}norm2", path + ("norm2",), "ln"),
        (f"{prefix}mlp.fc1", path + ("mlp", "fc1"), "linear"),
        (f"{prefix}mlp.fc2", path + ("mlp", "fc2"), "linear"),
    ]


def _head_entries(tkey: str, jkey: str) -> List[Tuple[str, Tuple, str]]:
    """DPT head tensors (reference dpt_block.py / dpt_head.py)."""
    p = f"{tkey}.dpt."
    out: List[Tuple[str, Tuple, str]] = [
        (p + "act_postprocess.0.0", (jkey, "act1", "proj"), "conv"),
        (p + "act_postprocess.0.1", (jkey, "act1", "up"), "convT"),
        (p + "act_postprocess.1.0", (jkey, "act2", "proj"), "conv"),
        (p + "act_postprocess.1.1", (jkey, "act2", "up"), "convT"),
        (p + "act_postprocess.2.0", (jkey, "act3", "proj"), "conv"),
        (p + "act_postprocess.3.0", (jkey, "act4", "proj"), "conv"),
        (p + "act_postprocess.3.1", (jkey, "act4", "down"), "conv"),
    ]
    for i in range(4):
        out.append((p + f"scratch.layer{i + 1}_rn", (jkey, "layer_rn", i), "conv_nobias"))
        rp = p + f"scratch.refinenet{i + 1}."
        out += [
            (rp + "resConfUnit1.conv1", (jkey, "refinenet", i, "rcu1", "conv1"), "conv"),
            (rp + "resConfUnit1.conv2", (jkey, "refinenet", i, "rcu1", "conv2"), "conv"),
            (rp + "resConfUnit2.conv1", (jkey, "refinenet", i, "rcu2", "conv1"), "conv"),
            (rp + "resConfUnit2.conv2", (jkey, "refinenet", i, "rcu2", "conv2"), "conv"),
            (rp + "out_conv", (jkey, "refinenet", i, "out_conv"), "conv"),
        ]
    out += [
        (p + "head.0", (jkey, "head", "conv1"), "conv"),
        (p + "head.2", (jkey, "head", "conv2"), "conv"),
        (p + "head.4", (jkey, "head", "conv3"), "conv"),
    ]
    return out


def fast3r_key_map(enc_depth: int, dec_depth: int, with_local_head: bool
                   ) -> List[Tuple[str, Tuple, str]]:
    """All (torch_prefix, jax_path, kind) entries for a Fast3R checkpoint.

    Stacked block layers use jax_path ("encoder","blocks",i,...) — the
    converter stacks/unstacks the layer axis.
    """
    entries: List[Tuple[str, Tuple, str]] = [
        ("encoder.patch_embed.proj", ("encoder", "patch_embed"), "conv"),
        ("encoder.enc_norm", ("encoder", "norm"), "ln"),
        ("decoder.decoder_embed", ("decoder", "decoder_embed"), "linear"),
        ("decoder.dec_norm", ("decoder", "norm"), "ln"),
    ]
    for i in range(enc_depth):
        entries += _block_entries(f"encoder.enc_blocks.{i}.",
                                  ("encoder", "blocks", i))
    for i in range(dec_depth):
        entries += _block_entries(f"decoder.dec_blocks.{i}.",
                                  ("decoder", "blocks", i))
    entries += _head_entries("downstream_head", "head_global")
    if with_local_head:
        entries += _head_entries("downstream_head_local", "head_local")
    return entries


def llama_decoder_entries(n_layers: int) -> List[Tuple[str, Tuple, str]]:
    """Llama fusion-decoder tensors (reference fast3r.py:810-858 LlamaDecoder
    wrapping components/llama.py TransformerBlock).  ``tensor`` kind entries
    are raw parameters (no .weight suffix); RMSNorm weights map through the
    bias-less ``ln`` kind."""
    entries: List[Tuple[str, Tuple, str]] = [
        ("decoder.view0_embed", ("decoder", "view0_embed"), "tensor"),
        ("decoder.decoder_embed", ("decoder", "decoder_embed"), "linear"),
        ("decoder.norm", ("decoder", "norm"), "ln"),
    ]
    for i in range(n_layers):
        p = f"decoder.layers.{i}."
        pa = ("decoder", "layers", i)
        entries += [
            (p + "attention_norm", pa + ("attention_norm",), "ln"),
            (p + "attention.wq", pa + ("attn", "wq"), "linear"),
            (p + "attention.wk", pa + ("attn", "wk"), "linear"),
            (p + "attention.wv", pa + ("attn", "wv"), "linear"),
            (p + "attention.wo", pa + ("attn", "wo"), "linear"),
            (p + "ffn_norm", pa + ("ffn_norm",), "ln"),
            (p + "feed_forward.w1", pa + ("ffn", "w1"), "linear"),
            (p + "feed_forward.w2", pa + ("ffn", "w2"), "linear"),
            (p + "feed_forward.w3", pa + ("ffn", "w3"), "linear"),
        ]
    return entries


def dino_encoder_entries(depth: int) -> List[Tuple[str, Tuple, str]]:
    """DinoEncoder tensors (reference fast3r.py:561-570 wraps a torch.hub
    dinov2 ViT as ``self.model`` -> state-dict prefix ``encoder.model.`` with
    the hub layout models/dino_encoder.load_dinov2_state_dict documents)."""
    pre = "encoder.model."
    entries: List[Tuple[str, Tuple, str]] = [
        (pre + "patch_embed.proj", ("encoder", "patch_embed"), "conv"),
        (pre + "cls_token", ("encoder", "cls_token"), "tensor"),
        (pre + "pos_embed", ("encoder", "pos_embed"), "tensor"),
        (pre + "norm", ("encoder", "norm"), "ln"),
    ]
    for i in range(depth):
        entries += _block_entries(f"{pre}blocks.{i}.",
                                  ("encoder", "blocks", i))
        entries += [
            (f"{pre}blocks.{i}.ls1.gamma", ("encoder", "ls1", i), "tensor"),
            (f"{pre}blocks.{i}.ls2.gamma", ("encoder", "ls2", i), "tensor"),
        ]
    return entries


def _variant_key_map(cfg) -> Tuple[List[Tuple[str, Tuple, str]],
                                   List[Tuple[Tuple, int, bool]]]:
    """(entries, stacks) for any Fast3RConfig variant: croco|dino encoder x
    fast3r|llama decoder.  stacks lists (path, depth, as_array): subtrees
    whose integer-keyed layers collapse onto a leading layer axis — as dicts
    of stacked arrays (blocks/layers) or as one stacked array (LayerScale
    gammas)."""
    entries: List[Tuple[str, Tuple, str]] = []
    stacks: List[Tuple[Tuple, int, bool]] = []
    if cfg.encoder_type == "dino":
        d = cfg.encoder.depth
        entries += dino_encoder_entries(d)
        stacks += [(("encoder", "blocks"), d, False),
                   (("encoder", "ls1"), d, True),
                   (("encoder", "ls2"), d, True)]
    else:
        entries += [
            ("encoder.patch_embed.proj", ("encoder", "patch_embed"), "conv"),
            ("encoder.enc_norm", ("encoder", "norm"), "ln"),
        ]
        for i in range(cfg.encoder.depth):
            entries += _block_entries(f"encoder.enc_blocks.{i}.",
                                      ("encoder", "blocks", i))
        stacks += [(("encoder", "blocks"), cfg.encoder.depth, False)]
    if cfg.decoder_type == "llama":
        entries += llama_decoder_entries(cfg.decoder.n_layers)
        stacks += [(("decoder", "layers"), cfg.decoder.n_layers, False)]
    else:
        entries += [
            ("decoder.decoder_embed", ("decoder", "decoder_embed"), "linear"),
            ("decoder.dec_norm", ("decoder", "norm"), "ln"),
        ]
        for i in range(cfg.decoder.depth):
            entries += _block_entries(f"decoder.dec_blocks.{i}.",
                                      ("decoder", "blocks", i))
        stacks += [(("decoder", "blocks"), cfg.decoder.depth, False)]
    entries += _head_entries("downstream_head", "head_global")
    if cfg.with_local_head:
        entries += _head_entries("downstream_head_local", "head_local")
    return entries, stacks


def _to_jax_tensors(kind: str, w: np.ndarray, b: Optional[np.ndarray]) -> Params:
    if kind == "linear":
        p = {"w": np.ascontiguousarray(w.T)}
    elif kind in ("conv", "conv_nobias"):
        p = {"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    elif kind == "convT":
        p = {"w": np.ascontiguousarray(w.transpose(2, 3, 0, 1))}
    elif kind == "ln":
        p = {"scale": w}
    else:
        raise ValueError(kind)
    if b is not None:
        p["bias" if kind == "ln" else "b"] = b
    return p


def _from_jax_tensors(kind: str, p: Params) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    # note: contiguous copies — serializers (safetensors) assume C layout
    if kind == "linear":
        w = np.ascontiguousarray(np.asarray(p["w"]).T)
    elif kind in ("conv", "conv_nobias"):
        w = np.ascontiguousarray(np.asarray(p["w"]).transpose(3, 2, 0, 1))
    elif kind == "convT":
        w = np.ascontiguousarray(np.asarray(p["w"]).transpose(2, 3, 0, 1))
    elif kind == "ln":
        # bias absent for RMSNorm weights (llama decoder)
        return (np.asarray(p["scale"]),
                np.asarray(p["bias"]) if "bias" in p else None)
    else:
        raise ValueError(kind)
    b = p.get("b")
    return w, (np.asarray(b) if b is not None else None)


def _set_path(tree: Params, path: Tuple, value) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _get_path(tree: Params, path: Tuple):
    node = tree
    for k in path:
        node = node[k]
    return node


def torch_state_dict_to_params(
    state_dict: Dict[str, np.ndarray],
    enc_depth: int,
    dec_depth: int,
    with_local_head: bool,
    strip_net_prefix: bool = True,
) -> Params:
    """Convert a reference torch state_dict into the fast3r_tpu param pytree.

    Accepts torch tensors or numpy arrays as values; returns numpy arrays
    (caller moves them to device / shards them).
    """
    sd = {}
    for k, v in state_dict.items():
        if strip_net_prefix and k.startswith("net."):
            k = k[len("net."):]
        sd[k] = np.asarray(getattr(v, "numpy", lambda: v)()
                           if hasattr(v, "numpy") else v)

    tree: Params = {}
    for prefix, path, kind in fast3r_key_map(enc_depth, dec_depth, with_local_head):
        wkey, bkey = prefix + ".weight", prefix + ".bias"
        if wkey not in sd:
            raise KeyError(f"missing checkpoint tensor {wkey}")
        p = _to_jax_tensors(kind, sd[wkey], sd.get(bkey))
        _set_path(tree, path, p)

    # stack per-layer block params onto the leading layer axis
    for name, depth in (("encoder", enc_depth), ("decoder", dec_depth)):
        tree[name]["blocks"] = _stack_layer_dicts(tree[name]["blocks"], depth)
    return _intdicts_to_lists(tree)


def _stack_layer_dicts(layers: Dict[int, Params], depth: int) -> Params:
    """{0: {...}, 1: {...}} per-layer dicts -> one dict of stacked arrays."""
    def get(d, pth):
        for k in pth:
            d = d[k]
        return d

    def walk(node, path):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = walk(v, path + (k,))
            else:
                out[k] = np.stack(
                    [get(layers[i], path + (k,)) for i in range(depth)])
        return out

    return walk(layers[0], ())


def params_from_fast3r_checkpoint(
    state_dict: Dict[str, np.ndarray], cfg, strip_net_prefix: bool = True,
) -> Params:
    """Variant-aware torch-checkpoint -> param-pytree conversion: handles
    every Fast3RConfig combination (croco|dino encoder x fast3r|llama
    decoder).  Supersedes torch_state_dict_to_params (kept for the
    croco+fast3r fast path its callers pin)."""
    sd = {}
    for k, v in state_dict.items():
        if strip_net_prefix and k.startswith("net."):
            k = k[len("net."):]
        sd[k] = np.asarray(getattr(v, "numpy", lambda: v)()
                           if hasattr(v, "numpy") else v)

    entries, stacks = _variant_key_map(cfg)
    tree: Params = {}
    for prefix, path, kind in entries:
        if kind == "tensor":
            if prefix not in sd:
                raise KeyError(f"missing checkpoint tensor {prefix}")
            _set_path(tree, path, sd[prefix])
            continue
        wkey, bkey = prefix + ".weight", prefix + ".bias"
        if wkey not in sd:
            raise KeyError(f"missing checkpoint tensor {wkey}")
        _set_path(tree, path, _to_jax_tensors(kind, sd[wkey], sd.get(bkey)))

    for path, depth, as_array in stacks:
        parent = _get_path(tree, path[:-1])
        layers = parent[path[-1]]
        if as_array:
            parent[path[-1]] = np.stack([layers[i] for i in range(depth)])
        else:
            parent[path[-1]] = _stack_layer_dicts(layers, depth)
    return _intdicts_to_lists(tree)


def fast3r_params_to_state_dict(params: Params, cfg) -> Dict[str, np.ndarray]:
    """Variant-aware reverse conversion (export / golden tests); see
    params_from_fast3r_checkpoint."""
    entries, stacks = _variant_key_map(cfg)
    stacked_roots = {path[-1] for path, _, _ in stacks}
    sd: Dict[str, np.ndarray] = {}
    for prefix, path, kind in entries:
        layer = None
        if (len(path) >= 3 and isinstance(path[2], int)
                and path[1] in stacked_roots):
            layer = path[2]
            node = _get_path(params, (path[0], path[1]) + path[3:])
        else:
            node = _get_path(params, path)
        if kind == "tensor":
            arr = np.asarray(node if layer is None else np.asarray(node)[layer])
            sd[prefix] = np.ascontiguousarray(arr)
            continue
        if layer is not None:
            node = {k: np.asarray(v)[layer] for k, v in _flatten1(node).items()}
        else:
            node = {k: np.asarray(v) for k, v in _flatten1(node).items()}
        w, b = _from_jax_tensors(kind, node)
        sd[prefix + ".weight"] = w
        if b is not None:
            sd[prefix + ".bias"] = b
    # reference DPT layer_rn aliasing (see params_to_torch_state_dict)
    for key in list(sd):
        m = re.match(r"(.*scratch\.)layer(\d)_rn(\..*)", key)
        if m:
            sd[f"{m.group(1)}layer_rn.{int(m.group(2)) - 1}{m.group(3)}"] = sd[key]
    return sd


def load_dust3r_checkpoint_partial(
    params: Params,
    state_dict: Dict[str, np.ndarray],
    enc_depth: int,
    load_head: bool = True,
) -> Params:
    """Initialize a Fast3R param tree from a pairwise DUSt3R checkpoint.

    Behavioral reference: fast3r/models/fast3r.py:162-239
    (load_from_dust3r_checkpoint): only patch_embed / enc_blocks / enc_norm
    (-> encoder) and downstream_head1 (-> global head) transfer; everything
    else (fusion decoder, local head) keeps its current initialization.

    Returns a new param tree; missing/mismatched tensors are skipped (the
    reference's strict=False behavior).
    """
    import jax

    sd = {}
    for k, v in state_dict.items():
        sd[k] = np.asarray(getattr(v, "numpy", lambda: v)()
                           if hasattr(v, "numpy") else v)

    out = jax.tree.map(lambda a: np.asarray(a).copy(), params)

    entries: List[Tuple[str, Tuple, str]] = [
        ("patch_embed.proj", ("encoder", "patch_embed"), "conv"),
        ("enc_norm", ("encoder", "norm"), "ln"),
    ]
    for i in range(enc_depth):
        entries += _block_entries(f"enc_blocks.{i}.", ("encoder", "blocks", i))
    if load_head:
        entries += [
            (t.replace("downstream_head.", "downstream_head1."), p, k)
            for (t, p, k) in _head_entries("downstream_head", "head_global")
        ]

    loaded = skipped = 0
    for prefix, path, kind in entries:
        wkey = prefix + ".weight"
        if wkey not in sd:
            skipped += 1
            continue
        p = _to_jax_tensors(kind, sd[wkey], sd.get(prefix + ".bias"))
        # stacked block layers write one slice of the layer axis
        if len(path) >= 3 and path[1] == "blocks":
            layer = path[2]
            node = _get_path(out, (path[0], "blocks") + path[3:])
            ok = all(
                k in node and node[k].shape[1:] == v.shape
                for k, v in p.items()
            )
            if not ok:
                skipped += 1
                continue
            for k, v in p.items():
                node[k] = np.asarray(node[k]).copy()
                node[k][layer] = v
        else:
            try:
                node = _get_path(out, path[:-1])
                cur = node[path[-1]] if isinstance(node, list) \
                    else node.get(path[-1], {})
            except (KeyError, IndexError):
                skipped += 1
                continue
            if not all(k in cur and np.shape(cur[k]) == v.shape
                       for k, v in p.items()):
                skipped += 1
                continue
            node[path[-1]] = {**cur, **p}
        loaded += 1
    return out


def _intdicts_to_lists(node):
    """Normalize {0: a, 1: b, ...} dicts into lists to match init_* pytrees."""
    if isinstance(node, dict):
        node = {k: _intdicts_to_lists(v) for k, v in node.items()}
        if node and all(isinstance(k, int) for k in node):
            return [node[i] for i in range(len(node))]
    return node


def params_to_torch_state_dict(
    params: Params, enc_depth: int, dec_depth: int, with_local_head: bool
) -> Dict[str, np.ndarray]:
    """Reverse conversion (used by the golden tests and for checkpoint export)."""
    sd: Dict[str, np.ndarray] = {}
    for prefix, path, kind in fast3r_key_map(enc_depth, dec_depth, with_local_head):
        if len(path) >= 3 and path[1] == "blocks":
            layer = path[2]
            node = _get_path(params, (path[0], "blocks") + path[3:])
            node = {k: np.asarray(v)[layer] for k, v in _flatten1(node).items()}
        else:
            node = {k: np.asarray(v) for k, v in _flatten1(_get_path(params, path)).items()}
        w, b = _from_jax_tensors(kind, node)
        sd[prefix + ".weight"] = w
        if b is not None:
            sd[prefix + ".bias"] = b
    # the reference DPT aliases scratch.layer{i}_rn in a scratch.layer_rn
    # ModuleList (dpt_block.py:79-86), so its state_dict() carries BOTH key
    # spellings for the same storage; emit the aliases too so the export
    # strict-loads into the reference model
    for key in list(sd):
        m = re.match(r"(.*scratch\.)layer(\d)_rn(\..*)", key)
        if m:
            sd[f"{m.group(1)}layer_rn.{int(m.group(2)) - 1}{m.group(3)}"] = sd[key]
    return sd


def _flatten1(node: Params) -> Params:
    return dict(node)
