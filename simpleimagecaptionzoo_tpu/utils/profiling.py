"""Tracing / profiling utilities (SURVEY.md §5: the reference has only tqdm
progress bars; steps/sec + captions/sec counters and a jax.profiler hook are
first-class here since the 10x-throughput target must be measured)."""
from __future__ import annotations

import contextlib
import time
from typing import Optional


class ThroughputMeter:
    """Counts items (steps, captions, tokens) per wall-clock second."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._items = 0.0

    def add(self, n: float) -> None:
        self._items += n

    @property
    def rate(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._items / dt if dt > 0 else 0.0

    @property
    def items(self) -> float:
        return self._items


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """``with profiler_trace('/tmp/tb'):`` wraps a region in a
    ``jax.profiler`` trace (viewable in TensorBoard / xprof); no-op when
    ``log_dir`` is None."""
    if not log_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_timer(name: str, sink=print):
    t0 = time.perf_counter()
    yield
    sink(f"[{name}] {time.perf_counter() - t0:.3f}s")
