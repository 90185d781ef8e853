"""Structured Streaming front-end for the CDC pipeline."""

from .pipeline import CDCStreamPipeline
from .metrics import PipelineMetricsListener

__all__ = ["CDCStreamPipeline", "PipelineMetricsListener"]
