"""Transactional lake sinks (ACID append, time travel, OPTIMIZE/VACUUM)."""

from .catalog import LakeCatalog
from .table import CommitInfo, ConcurrentWriteError, LakeTable

__all__ = ["LakeTable", "LakeCatalog", "CommitInfo", "ConcurrentWriteError"]
