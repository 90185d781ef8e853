"""Commit-log longevity measurement (r7 verdict item 2).

Ingests N tiny micro-batch commits into ONE LakeTable (the shape of a
month-long 10 s-batch CDC stream: the reference SLO horizon implies ~260k
commits/month) and records, at log-spaced milestones:

- append latency (median of the last window) vs commit count
- table-open cost: fresh LakeTable()._replay() wall (the driver-side
  log cost a new reader pays — isolated from Spark scan time)
- read().count() wall (replay + actual parquet scan)
- checkpoint write wall + checkpoint file size + log-dir entry count

Then truncates the log to the retention window and re-measures open cost.

Usage: python tools/longevity_bench.py [n_commits] [out_json] [maintain_every]
Writes one JSON document (milestone table + verdict) to out_json
(default /tmp/longevity_r8.json) and prints it. maintain_every > 0 runs
auto_maintain (compaction + retention vacuum + log truncation) every N
commits — the designed deployment shape, which bounds file count and
therefore checkpoint size; 0 (default) measures the unmaintained
worst case.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongodb_cdc_delta_spark.session import get_spark  # noqa: E402
from mongodb_cdc_delta_spark.sinks.maintenance import auto_maintain  # noqa: E402
from mongodb_cdc_delta_spark.sinks.table import (  # noqa: E402
    LakeTable,
    _checkpoint_path,
)


def _milestones(n: int) -> list[int]:
    base = [100, 300, 1000, 2000, 3000, 5000, 7500, 10000, 15000, 20000]
    return [m for m in base if m <= n] + ([n] if n not in base else [])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/longevity_r8.json"
    maintain_every = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    root = "/tmp/longevity_table_r8"
    shutil.rmtree(root, ignore_errors=True)
    spark = get_spark(app_name="longevity-bench", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(8).selectExpr(
        "id AS _id", "id * 3 AS qty", "CAST(id AS STRING) AS note"
    )
    df = df.coalesce(1)
    t = LakeTable(spark, root)

    marks = set(_milestones(n))
    window: list[float] = []
    rows = []
    t_start = time.time()
    for i in range(n):
        a0 = time.perf_counter()
        t.append(df, partition_by=[], txn=("longevity", i))
        window.append(time.perf_counter() - a0)
        if len(window) > 200:
            window.pop(0)
        commits = i + 1
        if maintain_every and commits % maintain_every == 0:
            auto_maintain(
                t,
                small_file_bytes=1 << 20,
                small_file_count=32,
                retention_hours=0.0,
                auto_recluster=False,
                log_retain_commits=2_000,
            )
        if commits in marks:
            # fresh-object open: driver-side replay only
            o0 = time.perf_counter()
            snap = LakeTable(spark, root)._replay()
            open_s = time.perf_counter() - o0
            r0 = time.perf_counter()
            cnt = t.read().count()
            read_s = time.perf_counter() - r0
            c0 = time.perf_counter()
            t._write_checkpoint(snap.version)
            ckpt_s = time.perf_counter() - c0
            ckpt_bytes = os.path.getsize(
                _checkpoint_path(root, snap.version)
            )
            log_entries = len(os.listdir(os.path.join(root, "_log")))
            rows.append(
                {
                    "commits": commits,
                    "append_p50_ms": round(
                        statistics.median(window) * 1000, 1
                    ),
                    "open_ms": round(open_s * 1000, 1),
                    "read_count_s": round(read_s, 3),
                    "rows": cnt,
                    "ckpt_write_ms": round(ckpt_s * 1000, 1),
                    "ckpt_bytes": ckpt_bytes,
                    "log_entries": log_entries,
                    "n_files": len(snap.files),
                }
            )
            print(json.dumps(rows[-1]), flush=True)

    # retention: truncate to the last 1000 commits, re-measure open
    tr = t.truncate_log(retain_commits=1000)
    o0 = time.perf_counter()
    LakeTable(spark, root)._replay()
    open_after_ms = round((time.perf_counter() - o0) * 1000, 1)
    log_entries_after = len(os.listdir(os.path.join(root, "_log")))

    # compaction interplay: optimize, then open again
    opt = t.optimize()
    o0 = time.perf_counter()
    snap = LakeTable(spark, root)._replay()
    open_after_opt_ms = round((time.perf_counter() - o0) * 1000, 1)

    first, last = rows[0], rows[-1]
    result = {
        "n_commits": n,
        "maintain_every": maintain_every,
        "total_wall_s": round(time.time() - t_start, 1),
        "milestones": rows,
        "append_growth": round(
            last["append_p50_ms"] / first["append_p50_ms"], 2
        ),
        "open_growth": round(last["open_ms"] / max(first["open_ms"], 0.1), 2),
        "truncate": tr,
        "open_after_truncate_ms": open_after_ms,
        "log_entries_after_truncate": log_entries_after,
        "optimize_files_after": len(snap.files),
        "open_after_optimize_ms": open_after_opt_ms,
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "milestones"}))
    spark.stop()


if __name__ == "__main__":
    main()
