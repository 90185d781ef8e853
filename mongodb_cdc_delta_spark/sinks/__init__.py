"""Transactional lake sinks (ACID append, time travel, OPTIMIZE/VACUUM)."""

from .catalog import LakeCatalog
from .delta_export import (
    DeltaExporter,
    export_delta,
    replay_delta_log,
    sync_delta,
    vacuum_export,
    write_checkpoint,
)
from .table import CommitInfo, ConcurrentWriteError, LakeTable

__all__ = [
    "LakeTable",
    "LakeCatalog",
    "CommitInfo",
    "ConcurrentWriteError",
    "DeltaExporter",
    "export_delta",
    "sync_delta",
    "vacuum_export",
    "write_checkpoint",
    "replay_delta_log",
]
