"""Policy-driven table maintenance (auto-OPTIMIZE / auto-VACUUM).

The reference leaves compaction/vacuum to operator-triggered calls
(delta-writer delta_writer.py:234-282). A streaming CDC table degrades
continuously — every micro-batch adds small files, every DV delete adds
tombstones — so at scale maintenance must be a policy, not a runbook:

    plan = maintenance_plan(table)        # metadata-only diagnosis
    auto_maintain(table)                  # act when thresholds trip

Decisions read ONLY the commit log (file counts/sizes per partition, DV
density from the snapshot) — no data scan. Wire ``auto_maintain`` into the
same driver loop as the reconciliation scheduler (e.g. hourly) or call it
from foreachBatch every N batches.
"""

from __future__ import annotations

import os
from typing import Any

from .table import LakeTable

#: files smaller than this are "small" (Delta's OPTIMIZE targets ~128 MB+)
DEFAULT_SMALL_FILE_BYTES = 32 * 1024 * 1024
#: compact a partition once it holds this many small files
DEFAULT_SMALL_FILE_COUNT = 8
#: rewrite DV-carrying files once deleted rows exceed this share
DEFAULT_DV_RATIO = 0.10


def maintenance_plan(
    table: LakeTable,
    small_file_bytes: int = DEFAULT_SMALL_FILE_BYTES,
    small_file_count: int = DEFAULT_SMALL_FILE_COUNT,
    dv_ratio: float = DEFAULT_DV_RATIO,
) -> dict[str, Any]:
    """Diagnose a table from its commit log: which partitions have
    accumulated enough small files to compact, and whether deletion
    vectors hold enough dead rows to justify a rewrite."""
    snap = table._replay()
    if snap.schema is None:
        return {"optimize": False, "vacuum": False, "partitions": []}

    by_part: dict[str, list[str]] = {}
    for f in snap.files:
        by_part.setdefault(os.path.dirname(f), []).append(f)

    compact_parts: list[str] = []
    for part, files in by_part.items():
        small = 0
        for f in files:
            try:
                size = os.path.getsize(os.path.join(table.root, f))
            except OSError:
                continue
            if size < small_file_bytes:
                small += 1
        if small >= small_file_count:
            compact_parts.append(part or ".")

    total_rows = sum(
        (snap.file_stats.get(f) or {}).get("numRecords", 0)
        for f in snap.files
    )
    dv_rows = sum(len(v) for v in snap.file_dvs.values())
    dv_share = dv_rows / total_rows if total_rows else 0.0

    return {
        "optimize": bool(compact_parts) or dv_share >= dv_ratio,
        "vacuum": True,  # vacuum is always safe; retention does the gating
        "partitions": sorted(compact_parts),
        "dv_rows": dv_rows,
        "dv_share": round(dv_share, 4),
        "n_files": len(snap.files),
    }


def auto_maintain(
    table: LakeTable,
    small_file_bytes: int = DEFAULT_SMALL_FILE_BYTES,
    small_file_count: int = DEFAULT_SMALL_FILE_COUNT,
    dv_ratio: float = DEFAULT_DV_RATIO,
    retention_hours: float = 168.0,
    run_vacuum: bool = True,
) -> dict[str, Any]:
    """Apply the plan: OPTIMIZE when small files or DV density tripped,
    then VACUUM (retention-gated). Returns what was done."""
    plan = maintenance_plan(
        table, small_file_bytes, small_file_count, dv_ratio
    )
    out: dict[str, Any] = {"plan": plan}
    if plan["optimize"]:
        out["optimize"] = table.optimize()
    if run_vacuum and plan["vacuum"]:
        out["vacuum"] = table.vacuum(retention_hours=retention_hours)
    return out
