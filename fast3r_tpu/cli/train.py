"""Training entry point.

Reference: fast3r/train.py:57-147 — config composition, seeding, datamodule/
model/trainer instantiation, fit with optional resume.  Usage:

    python -m fast3r_tpu.cli.train [--config path] [--experiment name] \
        [--resume] [key=value ...]
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train Fast3R (TPU)")
    default_cfg = os.path.join(os.path.dirname(__file__), "..", "configs",
                               "train.yaml")
    parser.add_argument("--config", default=default_cfg)
    parser.add_argument("--experiment", default=None)
    parser.add_argument("--resume", action="store_true", default=True)
    parser.add_argument("--no-resume", dest="resume", action="store_false")
    parser.add_argument("--distributed", action="store_true",
                        default=os.environ.get("FAST3R_TPU_DISTRIBUTED") == "1",
                        help="call jax.distributed.initialize() for multi-host "
                             "pods (auto-discovers the coordinator on TPU; "
                             "also enabled via FAST3R_TPU_DISTRIBUTED=1)")
    parser.add_argument("--profile-dir", default=None,
                        help="capture a jax.profiler trace of the first "
                             "training steps into this directory (the "
                             "reference's Lightning profiler debug config)")
    parser.add_argument("overrides", nargs="*",
                        help="dotted config overrides: a.b.c=value")
    args = parser.parse_args(argv)

    import jax

    if args.distributed:
        # multi-host SPMD: every host must join the same coordination
        # service before any device op (reference launches via Lightning's
        # DDP spawn; on TPU pods this single call replaces it)
        jax.distributed.initialize()

    from fast3r_tpu.config import (
        load_config,
        loss_config_from_dict,
        model_config_from_dict,
        optim_config_from_dict,
        save_config,
    )
    from fast3r_tpu.data.datamodule import MultiViewDataModule
    from fast3r_tpu.train.trainer import Trainer, TrainerConfig
    from fast3r_tpu.utils.logging import RankedLogger

    log = RankedLogger("fast3r_tpu.train")
    cfg = load_config(args.config, args.experiment, args.overrides)

    run_dir = cfg.get("paths", {}).get("run_dir", "runs/default")
    run_dir = run_dir.replace("${task_name}", cfg.get("task_name", "default"))
    save_config(cfg, run_dir)
    log.info(f"run dir: {run_dir}; devices: {jax.devices()}")

    model_cfg = model_config_from_dict(cfg["model"])
    optim_cfg = optim_config_from_dict(cfg.get("optim", {}))
    loss_cfg = loss_config_from_dict(cfg.get("loss", {}))
    tcfg_d = cfg.get("trainer", {})
    trainer_cfg = TrainerConfig(
        max_epochs=tcfg_d.get("max_epochs", 10),
        val_every_n_epochs=tcfg_d.get("val_every_n_epochs", 1),
        recon_val_every_n_epochs=tcfg_d.get("recon_val_every_n_epochs", 5),
        ckpt_every_n_epochs=tcfg_d.get("ckpt_every_n_epochs", 20),
        run_dir=run_dir,
        log_every_n_steps=tcfg_d.get("log_every_n_steps", 10),
        seed=cfg.get("seed", 42),
        remat=tcfg_d.get("remat", True),
    )

    data_cfg = cfg.get("data", {})
    bs = (data_cfg.get("batch_size_per_device", 1)
          * jax.local_device_count())
    dm = MultiViewDataModule(
        train_datasets=data_cfg.get("train_datasets", []),
        validation_datasets=data_cfg.get("validation_datasets", []),
        batch_size_per_device=bs,
        num_workers=data_cfg.get("num_workers", 4),
        num_workers_val=data_cfg.get("num_workers_val", 0),
        world_size=jax.process_count(), rank=jax.process_index(),
    )
    train_loader = dm.train_dataloader()
    val_loaders = dm.val_dataloaders()

    trainer = Trainer(model_cfg, optim_cfg, loss_cfg, trainer_cfg)
    trainer.install_signal_handlers()

    pretrained = cfg.get("pretrained")
    if pretrained and not (args.resume and os.path.exists(
            os.path.join(run_dir, "checkpoints", "last"))):
        from fast3r_tpu.inference import Fast3R

        log.info(f"loading pretrained weights from {pretrained}")
        trainer.state = trainer.state.__class__(
            params=Fast3R.from_pretrained(pretrained).params,
            opt_state=trainer.state.opt_state,
            step=trainer.state.step,
            rng=trainer.state.rng,
        )

    try:
        if args.profile_dir:
            with jax.profiler.trace(args.profile_dir):
                trainer.fit(train_loader, val_loaders, resume=args.resume)
        else:
            trainer.fit(train_loader, val_loaders, resume=args.resume)
    except Exception:
        # the reference's task_wrapper logs the exception before re-raising
        # (utils/utils.py:49-100) so cluster logs always show the cause
        log.exception("training failed")
        raise
    log.info("training complete")


if __name__ == "__main__":
    main()
