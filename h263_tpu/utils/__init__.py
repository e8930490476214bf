"""Framework utilities: tracing, metrics, checkpointing."""

from .trace import StageTimer, get_metrics, reset_metrics, trace_stage

__all__ = ["StageTimer", "get_metrics", "reset_metrics", "trace_stage"]
