"""Observability utilities (utils/logging.py, utils/meters.py):
settings.txt dump, JSONL scalar stream, meters math."""

import json
import os

import numpy as np

from fal_net_tpu.train.config import Stage1Config
from fal_net_tpu.utils.logging import MetricsLogger, dump_settings
from fal_net_tpu.utils.meters import AverageMeter, MultiAverageMeter, count_params


def test_dump_settings_writes_all_fields(tmp_path):
    cfg = Stage1Config(model="B", batch_size=8, lr=1e-4)
    dump_settings(str(tmp_path), cfg)
    text = (tmp_path / "settings.txt").read_text()
    # every config field appears, as in the reference's display_config
    # (Train_Stage1_K.py:73-85)
    for field in ("model", "batch_size", "lr", "max_disp", "milestones"):
        assert field in text, field
    assert "TRAINING SETTINGS" in text


def test_metrics_logger_jsonl_stream(tmp_path):
    lg = MetricsLogger(str(tmp_path))
    lg.scalars(0, {"loss": 1.5}, prefix="train/")
    lg.scalars(10, {"rmse": 0.25, "epe": np.float32(2.0)}, prefix="val/")
    lg.close()
    lines = [
        json.loads(ln)
        for ln in (tmp_path / "metrics.jsonl").read_text().splitlines()
    ]
    assert lines[0]["step"] == 0 and lines[0]["train/loss"] == 1.5
    assert lines[1]["step"] == 10 and lines[1]["val/rmse"] == 0.25
    assert isinstance(lines[1]["val/epe"], float)  # np scalars serialized


def test_metrics_logger_appends_across_resume(tmp_path):
    lg = MetricsLogger(str(tmp_path))
    lg.scalars(0, {"a": 1.0})
    lg.close()
    lg2 = MetricsLogger(str(tmp_path))  # resume: same dir reopens in append
    lg2.scalars(1, {"a": 2.0})
    lg2.close()
    lines = (tmp_path / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 2


def test_average_meter_matches_reference_semantics():
    m = AverageMeter()
    m.update(2.0, n=4)
    m.update(6.0, n=4)
    assert m.val == 6.0
    assert m.avg == 4.0  # weighted by n, like myUtils.py:59-110
    assert "6.000 (4.000)" in repr(m)
    m.reset()
    assert m.avg == 0.0  # no division by zero


def test_multi_average_meter():
    m = MultiAverageMeter(["abs_rel", "rms"])
    m.update([0.1, 4.0])
    m.update([0.3, 6.0])
    np.testing.assert_allclose(m.avg, [0.2, 5.0])
    assert "abs_rel" in repr(m)


def test_count_params():
    tree = {"a": np.zeros((3, 4)), "b": {"c": np.zeros(5)}}
    assert count_params(tree) == 17
