"""Observability: windowed metrics, step timing, TensorBoard scalars, and
jax.profiler trace hooks — the TPU replacement for the reference's
``vision/utils.py`` ``SmoothedValue``/``MetricLogger`` (``:13-233``) and the
TensorBoard ``SummaryWriter`` epoch scalars (``train_vqvae_deep.py:24-25,
199-202``).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict, deque
from typing import Dict, Iterable, Optional

import numpy as np


class SmoothedValue:
    """Window + global average of a scalar stream (reference
    ``vision/utils.py:13-67``; no cross-process sync needed — SPMD metrics
    arrive globally reduced)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return float(np.max(self.deque)) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, max=self.max,
                               value=self.value)


class MetricLogger:
    """Iteration logger with ETA and per-step data/iter timing (reference
    ``MetricLogger.log_every``, vision/utils.py:146-233)."""

    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, name):
        if name in self.meters:
            return self.meters[name]
        raise AttributeError(name)

    def __str__(self):
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = "", total: Optional[int] = None):
        i = 0
        total = total if total is not None else getattr(iterable, "__len__", lambda: None)()
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                if total:
                    eta = iter_time.global_avg * (total - i)
                    eta_s = f"eta: {int(eta)//3600:d}:{(int(eta)//60)%60:02d}:{int(eta)%60:02d}  "
                else:
                    eta_s = ""
                print(f"{header} [{i}{f'/{total}' if total else ''}]  {eta_s}"
                      f"{self}  time: {iter_time}  data: {data_time}",
                      flush=True)
            i += 1
            end = time.time()
        elapsed = time.time() - start
        print(f"{header} Total time: {elapsed:.1f}s "
              f"({elapsed / max(i, 1):.4f} s/it)", flush=True)


class TensorBoardWriter:
    """Thin, optional TB scalar writer (replaces the torch SummaryWriter
    usage; no-op when TB is unavailable or logdir empty)."""

    def __init__(self, logdir: str = ""):
        self._w = None
        if logdir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._w = SummaryWriter(logdir)
            except Exception:
                self._w = None

    def add_scalar(self, tag: str, value: float, step: int):
        if self._w is not None:
            self._w.add_scalar(tag, float(value), int(step))

    def add_scalars(self, scalars: Dict[str, float], step: int,
                    prefix: str = ""):
        for k, v in scalars.items():
            self.add_scalar(f"{prefix}{k}", v, step)

    def flush(self):
        if self._w is not None:
            self._w.flush()


class CsvLogger:
    """Append-mode per-step scalar CSV (loss curves for convergence
    evidence; complements the TB writer, which needs a TB install to read).
    No-op when ``path`` is empty.  Columns are fixed by the first write."""

    def __init__(self, path: str = ""):
        self.path = path
        self._cols = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, step: int, scalars: Dict[str, float]):
        if not self.path:
            return
        if self._cols is None:
            self._cols = sorted(scalars)
            if not os.path.exists(self.path) or os.path.getsize(self.path) == 0:
                with open(self.path, "a") as f:
                    f.write(",".join(["step"] + self._cols) + "\n")
        with open(self.path, "a") as f:
            f.write(",".join([str(int(step))] +
                             [f"{float(scalars.get(c, float('nan'))):.6g}"
                              for c in self._cols]) + "\n")


@contextlib.contextmanager
def profile_trace(logdir: str, enabled: bool = True):
    """jax.profiler trace context (SURVEY §5: the TPU analogue of the
    reference's wall-clock prints + cuda max-mem logging)."""
    if not enabled or not logdir:
        yield
        return
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-clock timing with warmup skip."""

    def __init__(self, skip_first: int = 2):
        self.skip = skip_first
        self.times: list = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            if self.skip > 0:
                self.skip -= 1
            else:
                self.times.append(now - self._last)
        self._last = now

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0

    @property
    def p50(self) -> float:
        return float(np.median(self.times)) if self.times else 0.0
