"""Profiling & throughput observability.

The reference has no tracing at all (SURVEY §5) — only a Keras progress
bar. Here:
  - ``trace(dir)``: context manager around ``jax.profiler`` writing a
    TensorBoard-loadable trace (enable in training via TRAIN.PROFILE_DIR);
  - ``StepTimer``: wall-clock EMA of step time + items/sec, the
    segments/sec/chip counter the north-star metrics are defined in.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA step timer; call ``tick(n_items)`` once per step."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self._last: Optional[float] = None
        self.ema_dt: Optional[float] = None
        self.steps = 0

    def tick(self, n_items: int = 0) -> None:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.ema_dt = (dt if self.ema_dt is None
                           else self.alpha * dt + (1 - self.alpha) * self.ema_dt)
        self._last = now
        self.steps += 1
        self._n_items = n_items

    @property
    def step_ms(self) -> float:
        return 1000.0 * (self.ema_dt or float("nan"))

    def items_per_sec(self, n_items: int) -> float:
        return n_items / self.ema_dt if self.ema_dt else float("nan")
