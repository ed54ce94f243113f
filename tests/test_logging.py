"""Metric sinks: self-contained TensorBoard event writer + MetricLogger
multiplexing (reference logger group configs/logger/*.yaml)."""

import glob
import os
import struct

import numpy as np
import pytest

from fast3r_tpu.utils.tb_writer import (
    TBEventWriter,
    crc32c,
    decode_scalar_event,
    encode_scalar_event,
    iter_records,
    masked_crc32c,
)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_scalar_event_roundtrip():
    metrics = {"train/loss": 1.25, "lr": 3e-4, "val/RRA_at_15": 0.875}
    data = encode_scalar_event(step=1234, wall_time=1_700_000_000.5,
                               metrics=metrics)
    step, decoded = decode_scalar_event(data)
    assert step == 1234
    assert set(decoded) == set(metrics)
    for k in metrics:
        assert decoded[k] == pytest.approx(metrics[k], rel=1e-6)


def test_tb_event_file_format(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.add_scalars(0, {"loss": 2.0})
    w.add_scalars(10, {"loss": 1.0, "acc": 0.5})
    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(files) == 1
    blob = open(files[0], "rb").read()
    records = list(iter_records(blob))  # asserts both CRCs per record
    assert len(records) == 3  # file_version + 2 scalar events
    # record framing: length header is little-endian uint64
    (ln0,) = struct.unpack_from("<Q", blob, 0)
    assert ln0 == len(records[0])
    step1, m1 = decode_scalar_event(records[2])
    assert step1 == 10 and m1["acc"] == pytest.approx(0.5)


def test_metric_logger_tensorboard_sink(tmp_path):
    from fast3r_tpu.utils.logging import MetricLogger

    csv_path = str(tmp_path / "metrics.csv")
    m = MetricLogger(csv_path, sinks=("tensorboard",))
    m.log(step=1, epoch=0, loss=3.5)
    m.log(step=2, epoch=0, loss=2.5, extra=1.0)
    # csv row count
    rows = open(csv_path).read().strip().splitlines()
    assert len(rows) == 3  # header + 2
    # tensorboard events alongside
    files = glob.glob(str(tmp_path / "tensorboard" / "events.out.tfevents.*"))
    assert len(files) == 1
    recs = list(iter_records(open(files[0], "rb").read()))
    steps, all_metrics = [], {}
    for r in recs[1:]:
        s, mm = decode_scalar_event(r)
        steps.append(s)
        all_metrics.update(mm)
    assert steps == [1, 2]
    assert all_metrics["loss"] == pytest.approx(2.5)
    assert all_metrics["extra"] == pytest.approx(1.0)


def test_metric_logger_unavailable_sink_is_skipped(tmp_path):
    from fast3r_tpu.utils.logging import MetricLogger

    # mlflow/comet/neptune/aim are not installed in this env: the logger
    # must warn and keep going, not raise
    m = MetricLogger(str(tmp_path / "m.csv"),
                     sinks=("mlflow", "comet", "neptune", "aim"))
    m.log(step=1, loss=1.0)
    assert os.path.exists(str(tmp_path / "m.csv"))


def test_trainer_config_has_tensorboard_default():
    from fast3r_tpu.train.trainer import TrainerConfig

    assert "tensorboard" in TrainerConfig().loggers
