"""Framework utilities: tracing, metrics, checkpointing."""

from .trace import (StageTimer, get_counters, get_metrics, incr,
                    reset_metrics, trace_stage)

__all__ = ["StageTimer", "get_counters", "get_metrics", "incr",
           "reset_metrics", "trace_stage"]
