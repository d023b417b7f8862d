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


# ---------------------------------------------------------------------------
# FLOPs / MFU accounting (roofline bookkeeping for the benches)
# ---------------------------------------------------------------------------

# Peak dense-matmul throughput assumed for MFU. TPU v5e datasheet: 197
# TFLOP/s bf16 (f32 via MXU is ~half).  MFU is reported against these
# constants explicitly so the denominator is auditable.
PEAK_TFLOPS = {"bf16": 197.0, "f32": 98.5}


def xla_flops(jitted_fn, *args, **kwargs) -> Optional[float]:
    """Model FLOPs of one call as counted by XLA's cost analysis (the same
    HLO the chip runs, so fused/DCE'd ops are excluded).  Returns None when
    the backend exposes no cost model."""
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", -1.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def mfu(flops_per_call: Optional[float], seconds_per_call: float,
        dtype: str = "bf16") -> Optional[dict]:
    """-> {'achieved_tflops', 'mfu', 'peak_tflops_assumed'} or None."""
    if not flops_per_call or seconds_per_call <= 0:
        return None
    achieved = flops_per_call / seconds_per_call / 1e12
    peak = PEAK_TFLOPS[dtype]
    return {"achieved_tflops": round(achieved, 2),
            "mfu": round(achieved / peak, 4),
            "peak_tflops_assumed": peak}
