"""Transactional lake sinks (ACID append, time travel, OPTIMIZE/VACUUM)."""

from .table import CommitInfo, ConcurrentWriteError, LakeTable

__all__ = ["LakeTable", "CommitInfo", "ConcurrentWriteError"]
