"""YAML config system: composition + experiment overlays + CLI overrides.

Replaces the reference's Hydra tree (configs/train.yaml with defaults,
``# @package _global_`` experiment overlays, configs snapshot into the run dir
— SURVEY.md §5.6) with a small explicit loader:

  * ``load_config(base, experiment=..., overrides=[...])`` deep-merges a base
    yaml, an optional experiment yaml, and ``a.b.c=value`` CLI overrides
    (values parsed with ast.literal_eval, falling back to string);
  * the resolved config is snapshotted into the run dir (``config.yaml``) and
    is the source of truth for later eval/demo loads (the reference reads the
    run's .hydra/config.yaml, eval.py:69-83);
  * NO eval(): dataset strings use fast3r_tpu.data.dsl.

Builders below map config dicts onto the typed model/optim dataclasses.
"""

from __future__ import annotations

import ast
import copy
import os
from typing import Any, Dict, List, Optional, Sequence

import yaml

from fast3r_tpu.inference import config_from_reference_args
from fast3r_tpu.models.fast3r import Fast3RConfig
from fast3r_tpu.train.losses import LossConfig
from fast3r_tpu.train.step import OptimConfig


def deep_merge(base: Dict, overlay: Dict) -> Dict:
    out = copy.deepcopy(base)
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def set_dotted(cfg: Dict, dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def parse_override(s: str):
    key, _, raw = s.partition("=")
    try:
        value = ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        value = raw
    return key, value


def load_config(
    base_path: str,
    experiment: Optional[str] = None,
    overrides: Sequence[str] = (),
) -> Dict:
    with open(base_path) as f:
        cfg = yaml.safe_load(f) or {}
    if experiment:
        exp_path = experiment
        if not os.path.exists(exp_path):
            exp_path = os.path.join(
                os.path.dirname(base_path), "experiment", experiment + ".yaml"
            )
        with open(exp_path) as f:
            cfg = deep_merge(cfg, yaml.safe_load(f) or {})
    for ov in overrides:
        key, value = parse_override(ov)
        set_dotted(cfg, key, value)
    return cfg


def save_config(cfg: Dict, run_dir: str) -> str:
    os.makedirs(run_dir, exist_ok=True)
    path = os.path.join(run_dir, "config.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    return path


# ---------------------------------------------------------------------------
# typed builders
# ---------------------------------------------------------------------------

def model_config_from_dict(model_cfg: Dict) -> Fast3RConfig:
    """Accepts the reference's net args layout (encoder_args/decoder_args/
    head_args, configs/model/fast3r.yaml)."""
    return config_from_reference_args(
        model_cfg.get("encoder_args", {}),
        model_cfg.get("decoder_args", {}),
        model_cfg.get("head_args", {}),
        attn_impl=model_cfg.get("attn_impl", "xla"),
    )


def optim_config_from_dict(d: Dict) -> OptimConfig:
    return OptimConfig(
        lr=float(d.get("lr", 1e-4)),
        betas=tuple(d.get("betas", (0.9, 0.95))),
        weight_decay=float(d.get("weight_decay", 0.05)),
        warmup_steps=int(d.get("warmup_steps", 1000)),
        total_steps=int(d.get("total_steps", 100_000)),
        eta_min=float(d.get("eta_min", 1e-6)),
        grad_clip=d.get("grad_clip"),
    )


def loss_config_from_dict(d: Dict) -> LossConfig:
    return LossConfig(
        alpha=float(d.get("alpha", 0.2)),
        norm_mode=d.get("norm_mode", "avg_dis"),
        gt_scale=bool(d.get("gt_scale", False)),
        local_scale_consistent=bool(d.get("local_scale_consistent", False)),
        with_local=bool(d.get("with_local", True)),
    )
