"""Logging + metrics: named loggers with rank-0 file handlers (reference
utils/logger.py), JSONL scalar stream (TensorBoard replacement), multi-item
AverageMeter (utils/AverageMeter.py), and Acc_Metric model selection."""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Sequence


def get_logger(name: str, log_file: str | None = None, rank: int = 0,
               level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if getattr(logger, "_si_mamba_configured", False):
        return logger
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is not None and rank == 0:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file, "a")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.setLevel(level if rank == 0 else logging.ERROR)
    logger.propagate = False
    logger._si_mamba_configured = True
    return logger


def print_log(msg: str, logger: logging.Logger | str | None = None):
    if logger is None:
        print(msg)
    elif isinstance(logger, str):
        get_logger(logger).info(msg)
    else:
        logger.info(msg)


class ScalarWriter:
    """Append-only JSONL scalar stream: one line per record."""

    def __init__(self, path: str | None, rank: int | None = None):
        # rank-0-only write (reference rank-gated TB writers, main.py:62-67)
        # — multi-host runners share one exp_dir
        if rank is None:
            import jax

            rank = jax.process_index()
        self.path = path if rank == 0 else None
        if self.path:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            self._f = open(self.path, "a")
        else:
            self._f = None

    def add_scalar(self, tag: str, value: float, step: int):
        if self._f:
            self._f.write(json.dumps({"tag": tag, "value": float(value),
                                      "step": int(step), "ts": time.time()}) + "\n")
            self._f.flush()

    def close(self):
        if self._f:
            self._f.close()


class AverageMeter:
    """Multi-item running averages (reference utils/AverageMeter.py:2-42)."""

    def __init__(self, items: Sequence[str] | None = None):
        self.items = list(items) if items else None
        n = len(self.items) if self.items else 1
        self._val = [0.0] * n
        self._sum = [0.0] * n
        self._count = [0] * n

    def update(self, values):
        if not isinstance(values, (list, tuple)):
            values = [values]
        for i, v in enumerate(values):
            self._val[i] = float(v)
            self._sum[i] += float(v)
            self._count[i] += 1

    def val(self, idx: int | None = None):
        return self._val if idx is None else self._val[idx]

    def avg(self, idx: int | None = None):
        avgs = [s / max(c, 1) for s, c in zip(self._sum, self._count)]
        return avgs if idx is None else avgs[idx]


class DeferredMeters:
    """One-step-lagged device→host metric readback for train loops.

    ``float(metrics[...])`` right after a jitted step is a blocking device
    sync: the host idles until the step it JUST dispatched completes, so
    batch prep / transfer for the next step never overlaps compute (on the
    tunneled TPU each sync also pays the ~28 ms relay RTT). ``push(m)``
    instead reads back the PREVIOUS step's metrics — already finished by
    then — and stores the new device values, keeping exactly one step in
    flight (bounded, unlike free-running async dispatch). ``flush()`` drains
    the final pending metrics at epoch end. Averages are order-independent,
    so epoch statistics are bit-identical to the eager pattern.
    """

    def __init__(self, meter: AverageMeter, keys: Sequence[str]):
        self.meter = meter
        self.keys = tuple(keys)
        self._pending = None

    def _drain(self):
        self.meter.update([float(self._pending[k]) for k in self.keys])

    def push(self, metrics) -> None:
        if self._pending is not None:
            self._drain()
        self._pending = metrics

    def flush(self) -> None:
        if self._pending is not None:
            self._drain()
            self._pending = None


class AccMetric:
    """Accuracy metric with better_than (reference runner_finetune.py:54-72)."""

    def __init__(self, acc: float = 0.0):
        self.acc = float(acc)

    def better_than(self, other: "AccMetric") -> bool:
        return self.acc > other.acc

    def state_dict(self):
        return {"acc": self.acc}
