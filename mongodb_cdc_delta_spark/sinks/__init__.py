"""Transactional lake sinks (ACID append, time travel, OPTIMIZE/VACUUM)."""

from .catalog import LakeCatalog
from .delta_export import DeltaExporter, export_delta, sync_delta
from .table import CommitInfo, ConcurrentWriteError, LakeTable

__all__ = [
    "LakeTable",
    "LakeCatalog",
    "CommitInfo",
    "ConcurrentWriteError",
    "DeltaExporter",
    "export_delta",
    "sync_delta",
]
