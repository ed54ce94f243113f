"""Evaluation entry point.

Reference: fast3r/eval.py:54-139 — reload the model config from the run's
config snapshot, restore the checkpoint, and run validation (loss + pose/recon
metric suites) over the configured validation datasets.

    python -m fast3r_tpu.cli.eval --run-dir runs/flagship \
        [--checkpoint last] [key=value ...]
    python -m fast3r_tpu.cli.eval --hf-checkpoint CKPT_DIR \
        data.validation_datasets="[...]"
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description="Evaluate Fast3R (TPU)")
    ap.add_argument("--run-dir", default=None)
    ap.add_argument("--hf-checkpoint", default=None)
    ap.add_argument("--checkpoint", default="last")
    ap.add_argument("--eval-pose", action="store_true",
                    help="run pose metrics on every dataset")
    ap.add_argument("--eval-recon", action="store_true",
                    help="run reconstruction metrics on every dataset")
    ap.add_argument("--eval-config", default=None,
                    help="eval preset from fast3r_tpu/configs/eval/ "
                         "(eval_cam_pose, ablation_recon_better_inference_hp, "
                         "ablation_recon_without_local_head, "
                         "ablation_varying_test_views) — the reference's "
                         "configs/eval groups")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    import jax
    import yaml

    from fast3r_tpu.config import (
        _resolve_interpolations,
        deep_merge,
        load_config,
        loss_config_from_dict,
        model_config_from_dict,
        parse_override,
        set_dotted,
    )
    from fast3r_tpu.data.datamodule import MultiViewDataModule
    from fast3r_tpu.train.step import OptimConfig
    from fast3r_tpu.train.trainer import Trainer, TrainerConfig
    from fast3r_tpu.utils.checkpoint_utils import load_model
    from fast3r_tpu.utils.logging import RankedLogger

    log = RankedLogger("fast3r_tpu.eval")
    assert args.run_dir or args.hf_checkpoint, \
        "need --run-dir or --hf-checkpoint"

    if args.run_dir:
        # the run's config snapshot is the source of truth (eval.py:69-83)
        with open(os.path.join(args.run_dir, "config.yaml")) as f:
            cfg = yaml.safe_load(f)
    else:
        default_cfg = os.path.join(os.path.dirname(__file__), "..", "configs",
                                   "train.yaml")
        cfg = load_config(default_cfg)
    if args.eval_config:
        preset = os.path.join(os.path.dirname(__file__), "..", "configs",
                              "eval", args.eval_config + ".yaml")
        with open(preset) as f:
            cfg = deep_merge(cfg, yaml.safe_load(f) or {})
    for ov in args.overrides:
        k, v = parse_override(ov)
        set_dotted(cfg, k, v)
    cfg = _resolve_interpolations(cfg)

    model = load_model(args.run_dir or args.hf_checkpoint,
                       ckpt_name=args.checkpoint)
    model_cfg = model.cfg

    trainer = Trainer(
        model_cfg, OptimConfig(), loss_config_from_dict(cfg.get("loss", {})),
        TrainerConfig(run_dir=args.run_dir or "eval_out", remat=False),
        init_params=model.params,
    )

    data_cfg = cfg.get("data", {})
    val_exprs = data_cfg.get("validation_datasets", [])
    dm = MultiViewDataModule(
        validation_datasets=val_exprs,
        batch_size_per_device=(data_cfg.get("batch_size_per_device", 1)
                               * jax.device_count()),
        num_workers_val=data_cfg.get("num_workers_val", 0),
    )
    val_loaders = dm.val_dataloaders()
    # Suite dispatch is AUTOMATIC per dataset name inside Trainer.validate
    # (the reference's validation_step, module.py:290-301: Co3d_v2 -> pose,
    # dtu/7scenes/nrgbd -> recon).  The CLI flags / an `eval:` preset key
    # are explicit overrides: True forces a suite on for every dataset,
    # False forces it off; absent (None) keeps auto-dispatch.
    eval_cfg = cfg.get("eval", {})
    pose_ov = True if args.eval_pose else eval_cfg.get("pose")
    recon_ov = True if args.eval_recon else eval_cfg.get("recon")
    pose_flags = {name: pose_ov for name in val_loaders}
    recon_flags = {name: recon_ov for name in val_loaders}

    results = trainer.validate(
        val_loaders, epoch=0,
        eval_pose=pose_flags, eval_recon=recon_flags,
        use_pts3d_from_local_head=cfg.get("model", {}).get(
            "eval_use_pts3d_from_local_head", True),
    )
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
