"""Config system: composition, overrides, ${} interpolation, python_eval."""

import os

import pytest

from fast3r_tpu.config import load_config, save_config


@pytest.fixture
def cfg_dir(tmp_path):
    (tmp_path / "base.yaml").write_text(
        "task_name: demo\n"
        "data:\n"
        "  num_views: 20\n"
        "  window: ${python_eval:\"${data.num_views} * 2\"}\n"
        "  expr: D(num_views=${data.num_views})\n"
        "paths:\n"
        "  run_dir: runs/${task_name}\n"
    )
    exp = tmp_path / "experiment"
    exp.mkdir()
    (exp / "big.yaml").write_text("task_name: big\ndata:\n  num_views: 40\n")
    return str(tmp_path)


def test_interpolation_and_python_eval(cfg_dir):
    cfg = load_config(os.path.join(cfg_dir, "base.yaml"))
    assert cfg["data"]["window"] == 40 and isinstance(cfg["data"]["window"], int)
    assert cfg["data"]["expr"] == "D(num_views=20)"
    assert cfg["paths"]["run_dir"] == "runs/demo"


def test_experiment_overlay_and_overrides(cfg_dir):
    cfg = load_config(os.path.join(cfg_dir, "base.yaml"), experiment="big",
                      overrides=["data.num_views=8"])
    # overrides win over the overlay, and interpolation sees the final value
    assert cfg["data"]["window"] == 16
    assert cfg["data"]["expr"] == "D(num_views=8)"
    assert cfg["paths"]["run_dir"] == "runs/big"


def test_python_eval_rejects_code(cfg_dir, tmp_path):
    (tmp_path / "evil.yaml").write_text(
        "x: ${python_eval:\"__import__('os').getpid()\"}\n")
    with pytest.raises(ValueError):
        load_config(str(tmp_path / "evil.yaml"))


def test_save_roundtrip(cfg_dir, tmp_path):
    cfg = load_config(os.path.join(cfg_dir, "base.yaml"))
    path = save_config(cfg, str(tmp_path / "run"))
    cfg2 = load_config(path)
    assert cfg2 == cfg
