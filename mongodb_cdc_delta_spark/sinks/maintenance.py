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


#: re-cluster only when a predicate-logged column's file ranges overlap
#: this much on average (mean_overlap ≈ files scanned per point query)
DEFAULT_RECLUSTER_OVERLAP = 2.0


def recluster_candidates(
    table: LakeTable,
    min_overlap: float = DEFAULT_RECLUSTER_OVERLAP,
    top_n: int = 2,
) -> list[str]:
    """Columns worth a clustering rewrite: frequently filtered (per the
    predicate side log) AND badly clustered (per commit-log file stats).
    Both signals are required — a badly-clustered column nobody queries is
    not worth rewriting the table for, and a well-clustered hot column
    already prunes. Metadata-only; no data scan."""
    freq = table._predicate_frequencies()
    if not freq:
        return []
    rep = table.clustering_report()
    ranked = sorted(
        (
            (col, m["mean_overlap"] * (1 + freq[col]))
            for col, m in rep.items()
            if col in freq and m["mean_overlap"] >= min_overlap
        ),
        key=lambda kv: -kv[1],
    )
    return [c for c, _ in ranked[:top_n]]


def auto_maintain(
    table: LakeTable,
    small_file_bytes: int = DEFAULT_SMALL_FILE_BYTES,
    small_file_count: int = DEFAULT_SMALL_FILE_COUNT,
    dv_ratio: float = DEFAULT_DV_RATIO,
    retention_hours: float = 168.0,
    run_vacuum: bool = True,
    auto_recluster: bool = True,
    recluster_min_overlap: float = DEFAULT_RECLUSTER_OVERLAP,
    log_retain_commits: int | None = 10_000,
) -> dict[str, Any]:
    """Apply the plan: OPTIMIZE when small files or DV density tripped,
    then VACUUM (retention-gated). Returns what was done.

    With ``auto_recluster``, the compaction rewrite is upgraded to
    OPTIMIZE ZORDER on the advisor's candidates whenever the workload's
    predicate log shows queries filtering on badly-clustered columns —
    the observe→diagnose→re-cluster loop runs itself, so data skipping
    keeps tracking the live query mix instead of the layout chosen at
    table-creation time."""
    plan = maintenance_plan(
        table, small_file_bytes, small_file_count, dv_ratio
    )
    out: dict[str, Any] = {"plan": plan}
    cands = (
        recluster_candidates(table, recluster_min_overlap)
        if auto_recluster
        else []
    )
    plan["recluster_by"] = cands
    if cands:
        # a clustering rewrite subsumes compaction (it rewrites every
        # partition), so run it whether or not small-file thresholds
        # tripped. Z-order needs numeric/date/timestamp columns (hashing
        # strings destroys curve locality); a string candidate gets a
        # linear cluster_by sort instead, which its leading-column
        # min/max stats still benefit from.
        from pyspark.sql.types import DateType, NumericType, TimestampType

        schema = table._replay().schema
        zorderable = [
            c
            for c in cands
            if isinstance(
                schema[c].dataType, (NumericType, DateType, TimestampType)
            )
        ]
        if zorderable:
            out["optimize"] = table.optimize(zorder_by=zorderable)
        else:
            out["optimize"] = table.optimize(cluster_by=cands[:1])
    elif plan["optimize"]:
        # same threshold the plan diagnosed with: only small/DV'd files
        # are rewritten, so a tick's cost tracks new data, not table size
        out["optimize"] = table.optimize(small_file_bytes=small_file_bytes)
    if run_vacuum and plan["vacuum"]:
        out["vacuum"] = table.vacuum(retention_hours=retention_hours)
    if log_retain_commits is not None:
        # Delta's logRetentionDuration expressed in commit count: bound
        # the log directory on always-on streams (~260k commits/month at
        # 10 s batches). Time travel stays available over the retained
        # window; truncate_log is a no-op until the log outgrows it.
        tr = table.truncate_log(retain_commits=log_retain_commits)
        if tr.get("commits_deleted"):
            out["truncate_log"] = tr
    return out
