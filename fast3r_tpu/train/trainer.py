"""Training harness: epoch loop, validation dispatch, checkpoint/resume, requeue.

Replaces the reference's Lightning module + trainer
(multiview_dust3r_module.py:67-1035, configs/trainer/*) with an explicit loop:

  * per-epoch ``dataset.set_epoch`` + epoch-seeded sampler (reference
    on_train_epoch_start, module.py:154-159);
  * jitted SPMD train step (fast3r_tpu/train/step.py) over the device mesh;
  * validation: loss on every val loader; pose evaluation (RRA/RTA/mAA) for
    pose datasets; reconstruction metrics for recon datasets — the reference's
    validation_step dispatch (module.py:290-301);
  * Orbax checkpointing of {params, opt_state, step, rng} with save_last +
    periodic epochs (callbacks/model_checkpoint.yaml), resume from last;
  * SIGTERM/SIGUSR1 -> checkpoint-and-exit for cluster requeue (the Slurm
    auto_requeue flow, configs/trainer/default.yaml:22-29);
  * sample/image counters persisted in the checkpoint so resume keeps
    counts (module.py:91-98).
"""

from __future__ import annotations

import dataclasses
import json
import os
import signal
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fast3r_tpu.models.fast3r import Fast3RConfig, fast3r_forward, init_fast3r
from fast3r_tpu.train.losses import LossConfig, conf_loss_multiview_v2
from fast3r_tpu.train.step import (
    OptimConfig,
    TrainState,
    init_train_state,
    make_jitted_train_step,
)
from fast3r_tpu.utils.logging import MetricLogger, RankedLogger

log = RankedLogger(__name__)

BATCH_KEYS = ("imgs", "true_shapes", "pts3d", "valid_mask", "camera_pose")

# Reference validation_step auto-dispatch (module.py:290-301): pose metrics
# for CO3D batches, reconstruction metrics for the recon benchmark datasets.
def _process_count() -> int:
    """Host count for global-counter bookkeeping (seam: tests patch THIS
    instead of jax.process_count, which orbax also consults)."""
    return jax.process_count()


POSE_EVAL_DATASETS = frozenset({"Co3d_v2"})
RECON_EVAL_DATASETS = frozenset({"dtu", "7scenes", "nrgbd"})


@dataclasses.dataclass
class TrainerConfig:
    max_epochs: int = 10
    val_every_n_epochs: int = 1
    recon_val_every_n_epochs: int = 5   # reference: every 5th epoch (:290-301)
    ckpt_every_n_epochs: int = 20       # model_checkpoint.yaml:3-20
    run_dir: str = "runs/default"
    log_every_n_steps: int = 10
    seed: int = 42
    # metric sinks beyond the always-on CSV (reference logger group,
    # configs/logger/*.yaml): "tensorboard" works out of the box (own event
    # writer); wandb/mlflow/comet/neptune/aim attach if importable
    loggers: Tuple[str, ...] = ("tensorboard",)
    remat: bool = True
    # SPMD: data axis -1 means "all remaining devices"; model_axis > 1 enables
    # tensor parallelism; use_mesh=False keeps the single-device path
    use_mesh: bool = False
    data_axis: int = -1
    model_axis: int = 1


class Trainer:
    def __init__(
        self,
        model_cfg: Fast3RConfig,
        optim_cfg: OptimConfig,
        loss_cfg: LossConfig = LossConfig(),
        trainer_cfg: TrainerConfig = TrainerConfig(),
        init_params=None,
    ):
        self.model_cfg = model_cfg
        self.optim_cfg = optim_cfg
        self.loss_cfg = loss_cfg
        self.cfg = trainer_cfg
        os.makedirs(self.cfg.run_dir, exist_ok=True)
        self.metrics = MetricLogger(
            os.path.join(self.cfg.run_dir, "metrics.csv"),
            sinks=getattr(self.cfg, "loggers", ()),
        )

        params = init_params
        if params is None:
            params = init_fast3r(jax.random.key(self.cfg.seed), model_cfg)

        self.mesh = None
        self._batch_sharding = None
        if self.cfg.use_mesh and len(jax.devices()) > 1:
            from fast3r_tpu.parallel.mesh import (
                batch_sharding,
                make_mesh,
                shard_params,
                zero_init_opt_state,
            )
            from fast3r_tpu.train.step import make_optimizer

            model_ax = max(1, self.cfg.model_axis)
            data_ax = (len(jax.devices()) // model_ax
                       if self.cfg.data_axis in (-1, 0, None)
                       else self.cfg.data_axis)
            self.mesh = make_mesh(data=data_ax, model=model_ax)
            self._batch_sharding = batch_sharding(self.mesh)
            params = shard_params(params, self.mesh)
            tx = make_optimizer(optim_cfg)
            self.state = TrainState(
                params=params,
                opt_state=zero_init_opt_state(tx, params, self.mesh),
                step=jnp.zeros((), jnp.int32),
                rng=jax.random.key(self.cfg.seed + 1),
            )
            log.info(f"SPMD mesh: data={data_ax} x model={model_ax}; "
                     f"ZeRO-sharded optimizer state")
        if self.mesh is None:
            self.state = init_train_state(
                params, optim_cfg, jax.random.key(self.cfg.seed + 1)
            )
        # parameter accounting (reference utils/logging_utils.py:18-63 logs
        # total/trainable counts at fit start)
        n_params = sum(int(np.prod(x.shape))
                       for x in jax.tree.leaves(self.state.params))
        by_top = {
            k: sum(int(np.prod(x.shape)) for x in jax.tree.leaves(v))
            for k, v in self.state.params.items()
        }
        log.info(
            "model parameters: total %.1fM (%s)",
            n_params / 1e6,
            ", ".join(f"{k}={v / 1e6:.1f}M" for k, v in sorted(by_top.items())),
        )
        # two jitted step variants: all-landscape fast path + mixed-orientation
        # (portrait samples in batch get dual-orientation head passes —
        # without this their head outputs would be spatially scrambled)
        state_shardings = None
        if self.mesh is not None:
            from fast3r_tpu.parallel.mesh import train_state_shardings
            from fast3r_tpu.train.step import make_optimizer

            state_shardings = train_state_shardings(
                self.state, self.mesh, make_optimizer(optim_cfg))
        self._step_fns = {
            mixed: make_jitted_train_step(
                model_cfg, optim_cfg, loss_cfg, remat=self.cfg.remat,
                mixed_orientation=mixed, state_shardings=state_shardings,
            )
            for mixed in (False, True)
        }
        self._eval_fns: Dict[Any, Any] = {}
        self.epoch = 0
        self.total_samples = 0
        self.total_images = 0
        self._stop_requested = False

    # ---- signal-based requeue (reference SLURMEnvironment auto_requeue) ----
    def install_signal_handlers(self):
        def handler(signum, frame):
            log.info(f"received signal {signum}: checkpointing for requeue")
            self._stop_requested = True

        for sig in (signal.SIGTERM, signal.SIGUSR1):
            signal.signal(sig, handler)

    # ---- checkpointing --------------------------------------------------
    def _ckpt_dir(self, name: str) -> str:
        return os.path.join(os.path.abspath(self.cfg.run_dir), "checkpoints", name)

    def save_checkpoint(self, name: str = "last"):
        from fast3r_tpu.utils.orbax_io import save_train_state

        meta = {
            "epoch": self.epoch,
            "total_samples": self.total_samples,
            "total_images": self.total_images,
        }
        save_train_state(self._ckpt_dir(name), self.state, meta)
        log.info(f"saved checkpoint {name!r} at step {int(self.state.step)}")

    def load_checkpoint(self, name: str = "last") -> bool:
        from fast3r_tpu.utils.orbax_io import restore_train_state

        path = self._ckpt_dir(name)
        if not os.path.exists(path):
            return False
        self.state, meta = restore_train_state(path, self.state)
        self.epoch = meta["epoch"]
        self.total_samples = meta["total_samples"]
        self.total_images = meta["total_images"]
        log.info(f"resumed from {name!r}: epoch={self.epoch} "
                 f"step={int(self.state.step)}")
        return True

    # ---- train ----------------------------------------------------------
    def _device_batch(self, batch) -> Dict[str, jnp.ndarray]:
        if self._batch_sharding is not None:
            return {
                k: jax.device_put(jnp.asarray(batch[k]), self._batch_sharding)
                for k in BATCH_KEYS
            }
        return {k: jnp.asarray(batch[k]) for k in BATCH_KEYS}

    def fit(self, train_loader, val_loaders: Optional[Dict[str, Any]] = None,
            resume: bool = True):
        if resume:
            self.load_checkpoint("last")
        start_epoch = self.epoch
        for epoch in range(start_epoch, self.cfg.max_epochs):
            self.epoch = epoch
            if hasattr(train_loader, "set_epoch"):
                # DataLoader.set_epoch also forwards the epoch into worker
                # processes (their dataset copies re-seed lazily per batch)
                train_loader.set_epoch(epoch)
            else:
                if hasattr(train_loader.dataset, "set_epoch"):
                    train_loader.dataset.set_epoch(epoch)
                if getattr(train_loader, "sampler", None) is not None:
                    train_loader.sampler.set_epoch(epoch)

            t_epoch = time.time()
            for i, batch in enumerate(train_loader):
                jb = self._device_batch(batch)
                ts = np.asarray(batch["true_shapes"])
                mixed = bool((ts[..., 1] < ts[..., 0]).any())
                self.state, m = self._step_fns[mixed](self.state, jb)
                B, V = batch["imgs"].shape[:2]
                # GLOBAL counts: every host steps in lockstep on its own
                # rank-sliced batch of the same size, so the global increment
                # is local x process_count — the reference's AccumulatedSum
                # metric sums the per-rank counts the same way
                # (module.py:33-50 + sync_dist logging); counters persist in
                # the checkpoint, so resume continues the global tally
                n_hosts = _process_count()
                self.total_samples += B * n_hosts
                self.total_images += B * V * n_hosts
                if i % self.cfg.log_every_n_steps == 0:
                    self.metrics.log(
                        step=int(self.state.step), epoch=epoch,
                        loss=float(m["loss"]), lr=float(m["lr"]),
                        grad_norm=float(m["grad_norm"]),
                        total_samples=self.total_samples,
                        total_images=self.total_images,
                        # per-group grad/param norms: the wandb.watch
                        # gradient-logging equivalent (module.py:146-152)
                        **{k: float(v) for k, v in m.items()
                           if k.startswith("watch/")},
                    )
                if self._stop_requested:
                    self.save_checkpoint("last")
                    log.info("stopping for requeue")
                    return
            log.info(f"epoch {epoch} done in {time.time() - t_epoch:.1f}s "
                     f"(step {int(self.state.step)})")

            if val_loaders and (epoch + 1) % self.cfg.val_every_n_epochs == 0:
                self.validate(val_loaders, epoch)

            # persist the NEXT epoch to run so resume continues, not repeats
            self.epoch = epoch + 1
            self.save_checkpoint("last")
            if (epoch + 1) % self.cfg.ckpt_every_n_epochs == 0:
                self.save_checkpoint(f"epoch_{epoch:04d}")

    # ---- validation ------------------------------------------------------
    def _val_loss_fn(self, mixed: bool = False):
        key = ("val_loss", mixed)
        if key not in self._eval_fns:
            def fn(params, batch, rng):
                preds = fast3r_forward(
                    params, self.model_cfg, batch["imgs"],
                    batch["true_shapes"], is_training=False,
                    mixed_orientation=mixed,
                )
                gts = {k: batch[k] for k in
                       ("pts3d", "valid_mask", "camera_pose")}
                loss, _ = conf_loss_multiview_v2(gts, preds, self.loss_cfg)
                return loss, preds
            self._eval_fns[key] = jax.jit(fn)
        return self._eval_fns[key]

    def validate(self, val_loaders: Dict[str, Any], epoch: int,
                 eval_pose: Optional[Dict[str, Optional[bool]]] = None,
                 eval_recon: Optional[Dict[str, Optional[bool]]] = None,
                 use_pts3d_from_local_head: bool = True) -> Dict[str, float]:
        """Per-dataset val loss + pose/recon metric suites.

        Dispatch follows the reference's validation_step
        (module.py:290-301): when a loader's entry in ``eval_pose`` /
        ``eval_recon`` is None (or absent while the dict is None), the suite
        is AUTO-dispatched from the batch's dataset name — ``Co3d_v2`` runs
        the camera-pose suite, ``dtu``/``7scenes``/``nrgbd`` run the
        reconstruction suite.  An explicit True/False forces the suite
        on/off (the CLI's --eval-pose/--eval-recon override path).
        """
        from fast3r_tpu.eval.pose import estimate_camera_poses
        from fast3r_tpu.eval.pose_metrics import pose_metrics
        from fast3r_tpu.eval.recon import evaluate_reconstruction

        def _dispatch(flags, name, batch, auto_names, epoch_ok=True):
            want = flags.get(name) if flags else None
            if want is not None:
                return want
            ds = batch.get("dataset")
            if not (epoch_ok and bool(ds)):
                return False
            # case-insensitive substring match so renamed/derived dataset
            # names (e.g. "Co3d_v2_tiny") still dispatch their suite, rather
            # than the exact-name silence the reference's `==` check has
            # (module.py:290-301)
            ds_name = str(ds[0][0]).lower()
            return any(a.lower() in ds_name for a in auto_names)

        # the reference only auto-runs the (slow) recon suite every 5 epochs
        # (module.py:296 "eval only every 5 epochs because it's slow");
        # explicit flags bypass the gate
        recon_epoch_ok = epoch % 5 == 4 or epoch == 0

        results: Dict[str, float] = {}
        for name, loader in val_loaders.items():
            losses: List[float] = []
            pose_ms, recon_ms = [], []
            suite_matched = False
            for batch in loader:
                jb = self._device_batch(batch)
                ts = np.asarray(batch["true_shapes"])
                fn = self._val_loss_fn(bool((ts[..., 1] < ts[..., 0]).any()))
                loss, preds = fn(self.state.params, jb,
                                 jax.random.key(0))
                losses.append(float(loss))
                pose_on = _dispatch(eval_pose, name, batch,
                                    POSE_EVAL_DATASETS)
                # match test without the epoch gate, for the no-suite warning
                suite_matched |= bool(pose_on or _dispatch(
                    eval_recon, name, batch, RECON_EVAL_DATASETS))
                if pose_on:
                    preds_v = _split_preds_by_view(preds)
                    # thread true shapes through so portrait samples' maps
                    # are un-transposed before PnP (the reference's
                    # correct_preds_orientation, module.py:871-938)
                    views_v = [{"true_shape": ts[:, i]}
                               for i in range(len(preds_v))]
                    poses, _ = estimate_camera_poses(preds_v, views=views_v)
                    for b in range(len(poses)):
                        gt = np.asarray(batch["camera_pose"][b])
                        pose_ms.append(pose_metrics(np.stack(poses[b]), gt))
                if _dispatch(eval_recon, name, batch, RECON_EVAL_DATASETS,
                             recon_epoch_ok):
                    views_v, preds_v = _split_batch_by_view(batch, preds)
                    rs = evaluate_reconstruction(
                        views_v, preds_v,
                        use_pts3d_from_local_head=use_pts3d_from_local_head)
                    recon_ms.extend([r for r in rs if r])
            if losses and not suite_matched:
                log.warning(
                    f"val loader {name!r}: no metric suite dispatched — the "
                    "dataset name matched neither the pose set "
                    f"{sorted(POSE_EVAL_DATASETS)} nor the recon set "
                    f"{sorted(RECON_EVAL_DATASETS)} and no explicit "
                    "eval_pose/eval_recon flag was given; only val loss is "
                    "recorded for it"
                )
            results[f"val/{name}/loss"] = float(np.mean(losses)) if losses else float("nan")
            for ms, prefix in ((pose_ms, "pose"), (recon_ms, "recon")):
                if ms:
                    for key in ms[0]:
                        results[f"val/{name}/{prefix}/{key}"] = float(
                            np.mean([m[key] for m in ms])
                        )
        # cross-host reduction (the reference's sync_dist/all_gather_object
        # metric aggregation, module.py:52-65) via multihost_utils
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            keys = sorted(results)
            vals = np.array([results[k] for k in keys], np.float32)
            gathered = multihost_utils.process_allgather(vals)
            results = {
                k: float(np.nanmean(gathered[:, i]))
                for i, k in enumerate(keys)
            }
        self.metrics.log(step=int(self.state.step), epoch=epoch, **results)
        log.info(f"validation @ epoch {epoch}: "
                 + json.dumps({k: round(v, 4) for k, v in results.items()}))
        return results


def _split_preds_by_view(preds: Dict[str, jnp.ndarray]) -> List[Dict]:
    V = preds["pts3d_in_other_view"].shape[1]
    return [
        {k: np.asarray(v[:, i]) for k, v in preds.items()} for i in range(V)
    ]


def _split_batch_by_view(batch, preds):
    V = preds["pts3d_in_other_view"].shape[1]
    views = [
        {
            "pts3d": np.asarray(batch["pts3d"][:, i]),
            "valid_mask": np.asarray(batch["valid_mask"][:, i]),
        }
        for i in range(V)
    ]
    return views, _split_preds_by_view(preds)
