"""Metric meter / logger unit tests (reference SmoothedValue/MetricLogger)."""

import logging

from clip_event_tpu.engine.metrics import MetricLogger, ScalarWriter, SmoothedValue


def test_smoothed_value_window_and_global():
    v = SmoothedValue(window_size=3)
    for x in (1.0, 2.0, 3.0, 4.0):
        v.update(x)
    assert v.value == 4.0
    assert v.avg == 3.0  # window (2, 3, 4)
    assert v.median == 3.0
    assert v.global_avg == 2.5
    assert "(" in str(v)


def test_metric_logger_update_and_format():
    ml = MetricLogger()
    ml.update(loss=1.0, lr=0.1)
    ml.update(loss=3.0, lr=0.1)
    assert ml.loss.global_avg == 2.0
    assert "loss" in str(ml) and "lr" in str(ml)


def test_log_every_iterates_and_logs(caplog):
    ml = MetricLogger()
    seen = []
    with caplog.at_level(logging.INFO):
        for item in ml.log_every(range(5), print_freq=2, header="E[0]"):
            ml.update(loss=float(item))
            seen.append(item)
    assert seen == list(range(5))
    assert any("E[0]" in rec.message for rec in caplog.records)


def test_scalar_writer_jsonl(tmp_path):
    import json

    w = ScalarWriter(str(tmp_path))
    w.add_scalar("train_loss", 1.5, 0)
    w.add_scalar("train_loss", 1.2, 1)
    w.close()
    lines = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    assert lines[0] == {"tag": "train_loss", "value": 1.5, "step": 0}
    assert len(lines) == 2
