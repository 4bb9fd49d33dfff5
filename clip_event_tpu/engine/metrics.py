"""Training metrics & logging (reference `SmoothedValue`/`MetricLogger`,
`utils.py:18-295`).

Differences by design: under pjit the loss is already computed on the
*global* batch (GSPMD reduces across the mesh), so the reference's
all_reduce-based meter sync (`utils.py:36-47`, `reduce_dict`
`utils.py:136-160`) is unnecessary — every process logs identical values.
Timing is honest without a per-step device sync: the step returns device
arrays and the logger only blocks when it prints.
"""

from __future__ import annotations

import datetime
import logging
import os
import time
from collections import defaultdict, deque
from typing import Dict, Iterable

log = logging.getLogger(__name__)


class SmoothedValue:
    """Windowed + global average meter."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        value = float(value)
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        vals = sorted(self.deque)
        return vals[len(vals) // 2] if vals else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / self.count if self.count else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def synchronize_between_processes(self):
        """All-reduce count/total so `global_avg` is global (reference
        `SmoothedValue.synchronize_between_processes`, `utils.py:36-47`).
        Window stats (median/avg/value) stay local, as in the reference."""
        from clip_event_tpu.parallel.collectives import reduce_dict

        t = reduce_dict(
            {"count": float(self.count), "total": self.total}, average=False
        )
        self.count = int(t["count"])
        self.total = t["total"]

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            value=self.value,
        )


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def add_meter(self, name: str, meter: SmoothedValue):
        self.meters[name] = meter

    def update(self, **kwargs):
        for name, value in kwargs.items():
            self.meters[name].update(float(value))

    def synchronize_between_processes(self):
        """Sync every meter's global stats across processes — needed for
        host-side quantities (data_time, iter_time) that diverge per process
        (device-side losses are already global under pjit)."""
        for meter in self.meters.values():
            meter.synchronize_between_processes()

    def __getattr__(self, name):
        if name in self.meters:
            return self.meters[name]
        raise AttributeError(name)

    def __str__(self):
        return self.delimiter.join(f"{n}: {m}" for n, m in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int, header: str = ""):
        """Yield items while tracking iter/data time and printing progress
        with ETA (`utils.py:243-295`)."""
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        try:
            total = len(iterable)
        except TypeError:
            total = None
        i = 0
        warned_data_bound = False
        end = time.time()
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if print_freq and i % print_freq == 0:
                eta = ""
                if total:
                    eta_s = iter_time.global_avg * (total - i)
                    eta = f"eta: {datetime.timedelta(seconds=int(eta_s))}  "
                count = f"[{i}/{total}]" if total else f"[{i}]"
                log.info(
                    "%s %s %s%s  time: %s  data: %s",
                    header, count, eta, str(self), iter_time, data_time,
                )
            if (
                not warned_data_bound
                and i >= 8  # past the compile/warm-up steps
                and data_time.avg > 0.5 * iter_time.avg
            ):
                warned_data_bound = True
                log.warning(
                    "input pipeline is the bottleneck: data wait %.3fs per "
                    "step vs %.3fs total — the accelerator is idle %.0f%% of "
                    "the time. Raise num_workers / prefetch, or check that "
                    "the native decode path is active (CLIP_EVENT_NATIVE=1).",
                    data_time.avg, iter_time.avg,
                    100.0 * data_time.avg / max(iter_time.avg, 1e-9),
                )
            i += 1
            end = time.time()


def create_logger(task: str, log_dir: str, level: str = "info", phase: str = "train") -> None:
    """Per-process timestamped log file + console, rank-tagged format
    (reference `create_logger`, `engine.py:177-200`)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    time_str = time.strftime("%Y-%m-%d-%H-%M")
    rank, world = jax.process_index(), jax.process_count()
    if world > 1:
        filename = f"{task}_{phase}_{time_str}_rank{rank}.txt"
        head = f"%(asctime)-15s:[P:%(process)d]:Rank[{rank}/{world}] %(message)s"
    else:
        filename = f"{task}_{phase}_{time_str}.txt"
        head = "%(asctime)-15s:[P:%(process)d]: %(message)s"
    root = logging.getLogger()
    root.setLevel(logging.DEBUG if level == "debug" else logging.INFO)
    for handler in list(root.handlers):
        root.removeHandler(handler)
    file_handler = logging.FileHandler(os.path.join(log_dir, filename))
    file_handler.setFormatter(logging.Formatter(head))
    root.addHandler(file_handler)
    if rank == 0:  # rank-0-only console, like setup_for_distributed (utils.py:515-527)
        console = logging.StreamHandler()
        console.setFormatter(logging.Formatter(head))
        root.addHandler(console)


class ScalarWriter:
    """Minimal TensorBoard-compatible scalar writer.

    Prefers tensorboardX / tf.summary when available; always also appends a
    plain JSONL file (`scalars.jsonl`) so runs are inspectable without TB.
    """

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "scalars.jsonl"), "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(logdir=logdir)
        except ImportError:
            try:
                import tensorflow as tf  # type: ignore

                self._tb = _TFWriter(tf, logdir)
            except ImportError:
                pass

    def add_scalar(self, tag: str, value: float, step: int):
        import json

        self._jsonl.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None and hasattr(self._tb, "close"):
            self._tb.close()


class _TFWriter:
    def __init__(self, tf, logdir):
        self._tf = tf
        self._writer = tf.summary.create_file_writer(logdir)

    def add_scalar(self, tag, value, step):
        with self._writer.as_default():
            self._tf.summary.scalar(tag, value, step=step)

    def close(self):
        self._writer.close()
