"""Lightweight per-stage tracing, counters, and metrics.

The reference has no observability at all (SURVEY.md §5.1); the rebuild adds

* a near-zero-overhead stage timer aggregating wall-time distributions per
  pipeline stage (host parse / transfer / device reconstruct / present),
  enabled with H263_TPU_TRACE=1 or trace_enabled();
* always-on event counters (frames decoded, transfer bytes, transport
  fallbacks, pool churn) — a few dict increments per *step*, so they stay
  on even in production serving;
* an opt-in bridge to the XLA profiler for device-side traces.
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from collections import defaultdict

_lock = threading.Lock()
# name -> [count, total_seconds, min_seconds, max_seconds]
_stats: dict = defaultdict(lambda: [0, 0.0, float("inf"), 0.0])
_counters: dict = defaultdict(int)
_enabled = bool(os.environ.get("H263_TPU_TRACE"))


def trace_enabled(on: bool = True) -> None:
    global _enabled
    _enabled = on


def _record(name: str, dt: float) -> None:
    with _lock:
        s = _stats[name]
        s[0] += 1
        s[1] += dt
        if dt < s[2]:
            s[2] = dt
        if dt > s[3]:
            s[3] = dt


@contextlib.contextmanager
def trace_stage(name: str):
    """Time a pipeline stage; no-op unless tracing is enabled."""
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _record(name, time.perf_counter() - t0)


class StageTimer:
    """Explicit start/stop variant for non-scoped stages."""

    def __init__(self, name: str):
        self.name = name
        self._t0 = None

    def start(self):
        if _enabled:
            self._t0 = time.perf_counter()
        return self

    def stop(self):
        if self._t0 is not None:
            _record(self.name, time.perf_counter() - self._t0)
            self._t0 = None


def incr(name: str, n: int = 1) -> None:
    """Bump an event counter (always on; call per step, not per stream)."""
    with _lock:
        _counters[name] += n


def get_metrics() -> dict:
    """Stage-timer snapshot: {stage: {count, total_s, mean_ms, min_ms,
    max_ms}}."""
    with _lock:
        return {
            name: {
                "count": c,
                "total_s": round(t, 6),
                "mean_ms": round(1e3 * t / c, 4) if c else 0.0,
                "min_ms": round(1e3 * lo, 4) if c else 0.0,
                "max_ms": round(1e3 * hi, 4) if c else 0.0,
            }
            for name, (c, t, lo, hi) in _stats.items()
        }


def get_counters() -> dict:
    """Event-counter snapshot: {name: count}."""
    with _lock:
        return dict(_counters)


def reset_metrics() -> None:
    with _lock:
        _stats.clear()
        _counters.clear()


@contextlib.contextmanager
def xla_profile(logdir: str):
    """Capture an XLA device profile around a region (TensorBoard format)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
