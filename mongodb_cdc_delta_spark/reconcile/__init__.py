"""Source↔target reconciliation engine.

The reference specifies (but never shipped) a reconciliation service:
count compare → range-partitioned batch hash compare → record-level diff →
repair (reference: specs/001-mongodb-cdc-delta/research.md:659-855,
spec FR-017..023). Here it is a handful of pure DataFrame plans; Spark's
shuffle replaces the reference's hand-rolled worker pool.
"""

from .engine import (
    apply_repair,
    bucket_hash_compare,
    count_compare,
    current_state,
    record_diff,
    repair_plan,
)
from .incremental import incremental_reconcile, snapshot_diff

__all__ = [
    "count_compare",
    "bucket_hash_compare",
    "record_diff",
    "repair_plan",
    "apply_repair",
    "current_state",
    "incremental_reconcile",
    "snapshot_diff",
]
