"""Metric meter / logger unit tests (reference SmoothedValue/MetricLogger)."""

import logging
import time

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


def test_log_every_warns_when_data_bound(caplog):
    """A loader that stalls longer than the step computes must trigger the
    data-bound warning exactly once (past the warm-up steps)."""
    import time

    logger = MetricLogger()

    def slow_loader():
        for i in range(12):
            time.sleep(0.02)  # "data" wait dominates
            yield i

    with caplog.at_level(logging.WARNING, logger="clip_event_tpu.engine.metrics"):
        for _ in logger.log_every(slow_loader(), print_freq=0):
            pass  # step itself is ~free
    warnings = [r for r in caplog.records if "bottleneck" in r.message]
    assert len(warnings) == 1


def test_log_every_no_warning_when_compute_bound(caplog):
    logger = MetricLogger()

    def fast_loader():
        for i in range(12):
            yield i

    with caplog.at_level(logging.WARNING, logger="clip_event_tpu.engine.metrics"):
        for _ in logger.log_every(fast_loader(), print_freq=0):
            time.sleep(0.02)
    assert not [r for r in caplog.records if "bottleneck" in r.message]
