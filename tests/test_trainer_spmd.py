"""Trainer with use_mesh: SPMD fit over the 8-device virtual mesh."""

import numpy as np

import jax

from fast3r_tpu.data.loader import get_data_loader
from fast3r_tpu.models.fast3r import Fast3RConfig
from fast3r_tpu.train.losses import LossConfig
from fast3r_tpu.train.step import OptimConfig
from fast3r_tpu.train.trainer import Trainer, TrainerConfig


def test_spmd_trainer_fit(tmp_path):
    assert len(jax.devices()) == 8
    trainer = Trainer(
        Fast3RConfig.tiny(),
        OptimConfig(warmup_steps=2, total_steps=20),
        LossConfig(),
        TrainerConfig(max_epochs=1, run_dir=str(tmp_path),
                      ckpt_every_n_epochs=100, remat=False,
                      use_mesh=True, model_axis=2),
    )
    assert trainer.mesh is not None
    assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}

    # params actually sharded over the model axis
    specs = [
        str(l.sharding.spec) for l in jax.tree.leaves(trainer.state.params)
        if hasattr(l, "sharding") and hasattr(l.sharding, "spec")
    ]
    assert any("model" in s for s in specs)

    loader = get_data_loader(
        "8 @ DummyMultiview(num_scenes=4, num_views=2, "
        "resolution=[(64, 48)], seed=777)", batch_size=4, num_workers=0)
    trainer.fit(loader, resume=False)
    assert int(trainer.state.step) == 2
    # loss logged finite
    csv = (tmp_path / "metrics.csv").read_text()
    assert "loss" in csv
