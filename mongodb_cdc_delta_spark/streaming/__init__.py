"""Structured Streaming front-end for the CDC pipeline."""

from .metrics import PipelineMetricsListener
from .pipeline import CDCStreamPipeline
from .stateful import (
    running_totals,
    session_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "CDCStreamPipeline",
    "PipelineMetricsListener",
    "session_window_agg",
    "tumbling_window_agg",
    "running_totals",
]
