"""Lightweight per-stage tracing and metrics.

The reference has no observability at all (SURVEY.md §5.1); the rebuild adds
a near-zero-overhead stage timer that aggregates wall-time and counts per
pipeline stage (host parse / transfer / device reconstruct / present), plus
an opt-in bridge to the XLA profiler for device-side traces.

Enable with H263_TPU_TRACE=1 (or programmatically via trace_enabled()).
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from collections import defaultdict

_lock = threading.Lock()
_stats: dict = defaultdict(lambda: [0, 0.0])  # name -> [count, total_seconds]
_enabled = bool(os.environ.get("H263_TPU_TRACE"))


def trace_enabled(on: bool = True) -> None:
    global _enabled
    _enabled = on


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
        dt = time.perf_counter() - t0
        with _lock:
            s = _stats[name]
            s[0] += 1
            s[1] += dt


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
            dt = time.perf_counter() - self._t0
            with _lock:
                s = _stats[self.name]
                s[0] += 1
                s[1] += dt
            self._t0 = None


def get_metrics() -> dict:
    """Snapshot: {stage: {count, total_s, mean_ms}}."""
    with _lock:
        return {
            name: {
                "count": c,
                "total_s": round(t, 6),
                "mean_ms": round(1e3 * t / c, 4) if c else 0.0,
            }
            for name, (c, t) in _stats.items()
        }


def reset_metrics() -> None:
    with _lock:
        _stats.clear()


@contextlib.contextmanager
def xla_profile(logdir: str):
    """Capture an XLA device profile around a region (TensorBoard format)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
