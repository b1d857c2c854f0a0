"""Logging + training metrics.

Equivalents of the reference's observability toolbox: ``build_logger``
(omchat/utils.py:17-57, timed-rotating file handler + stream capture) and the
training-era ``SmoothedValue`` / ``MetricLogger``
(multimodal_encoder/utils.py:43-186) — with the NCCL dist-sync replaced by
``jax.process_index`` awareness (values are synced by the caller via psum when
needed; on TPU, metrics are per-host scalars already reduced inside jit).
"""

from __future__ import annotations

import datetime
import logging
import logging.handlers
import os
import sys
import time
from collections import defaultdict, deque
from typing import Dict, Iterable, Optional

_handler: Optional[logging.Handler] = None


def build_logger(logger_name: str, logger_filename: str, log_dir: str = ".") -> logging.Logger:
    """Console + daily-rotating file logger (reference omchat/utils.py:17-57)."""
    global _handler
    formatter = logging.Formatter(
        fmt="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    root = logging.getLogger()
    if not root.handlers:
        console = logging.StreamHandler(sys.stdout)
        console.setFormatter(formatter)
        root.addHandler(console)
        root.setLevel(logging.INFO)

    if _handler is None:
        os.makedirs(log_dir, exist_ok=True)
        path = os.path.join(log_dir, logger_filename)
        _handler = logging.handlers.TimedRotatingFileHandler(path, when="D", utc=True)
        _handler.setFormatter(formatter)
        for name, item in logging.root.manager.loggerDict.items():
            if isinstance(item, logging.Logger):
                item.addHandler(_handler)

    logger = logging.getLogger(logger_name)
    logger.setLevel(logging.INFO)
    if _handler not in logger.handlers:
        logger.addHandler(_handler)
    return logger


class SmoothedValue:
    """Windowed + global average tracker (reference utils.py:43-80)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg, max=self.max, value=self.value
        )


class MetricLogger:
    """Iteration logger with iter/data timing and device-memory reporting
    (reference utils.py:83-186; cuda.max_memory_allocated → TPU memory_stats)."""

    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(f"{name}: {meter}" for name, meter in self.meters.items())

    @staticmethod
    def _device_mem_mb() -> Optional[float]:
        import jax

        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            return stats["bytes_in_use"] / 1e6
        return None

    def log_every(self, iterable: Iterable, print_freq: int, header: str = "", logger=None):
        emit = (logger.info if logger else print)
        i = 0
        start = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                mem = self._device_mem_mb()
                mem_str = f" mem: {mem:.0f}MB" if mem is not None else ""
                emit(
                    f"{header} [{i}] {self} time: {iter_time} data: {data_time}{mem_str}"
                )
            i += 1
            end = time.time()
        total = time.time() - start
        emit(f"{header} Total time: {datetime.timedelta(seconds=int(total))}")
