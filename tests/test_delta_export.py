"""Delta-protocol export: structure per the public Delta spec, row-level
round-trips via log replay, O(changes) incremental sync, and (gated on the
extension being loadable offline) DuckDB delta_scan interop.

Reference read contract: DuckDB delta_scan over the writer's tables
(reference README.md:78, research.md:546-615)."""

from __future__ import annotations

import json
import os
import time

import urllib.parse

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from mongodb_cdc_delta_spark.sinks.delta_export import (
    DeltaExporter,
    export_delta,
    replay_delta_log,
    sync_delta,
)
from mongodb_cdc_delta_spark.sinks.table import LakeTable

# deep storage-layer e2e: excluded from the fast lane (see pytest.ini)
pytestmark = pytest.mark.slow


def _duckdb_delta_available() -> bool:
    try:
        con = duckdb.connect()
        con.execute("LOAD delta")
        return True
    except Exception:
        return False


DUCKDB_DELTA = _duckdb_delta_available()


@pytest.fixture
def lake(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "lake"))
    df = spark.range(0, 100).select(
        F.col("id"),
        (F.col("id") % 5).alias("bucket"),
        F.concat(F.lit("v"), F.col("id")).alias("val"),
        F.date_add(
            F.to_date(F.lit("2024-01-01")), (F.col("id") % 3).cast("int")
        ).cast("string").alias("_ingestion_date"),
    )
    t.append(df, partition_by=["_ingestion_date"])
    return t


def _read_exported(spark, dest: str):
    """Read an exported Delta table the way an external reader would:
    snapshot via the INDEPENDENT spec-only log reader
    (interop/delta_reader.py — no shared code with the exporter), scan
    exactly the listed files, reattach partition values from the add
    entries."""
    from mongodb_cdc_delta_spark.interop import delta_reader as dr

    snap = dr.load_snapshot(dest)
    schema = StructType.fromJson(snap.schema)
    parts = []
    data_cols = [
        f for f in schema.fields if f.name not in snap.partition_columns
    ]
    for path, add in snap.files.items():
        df = spark.read.schema(StructType(data_cols)).parquet(
            snap.data_path(path)
        )
        for pc in snap.partition_columns:
            pv = (add.get("partitionValues") or {}).get(pc)
            pf = schema[pc]
            df = df.withColumn(pc, F.lit(pv).cast(pf.dataType))
        parts.append(df.select(*[f.name for f in schema.fields]))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestFullExport:
    def test_log_structure_per_spec(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        res = export_delta(lake, dest)
        assert res["delta_version"] == 0 and res["rewritten"] == 0
        log = os.path.join(dest, "_delta_log", f"{0:020d}.json")
        assert os.path.exists(log)
        actions = [json.loads(x) for x in open(log) if x.strip()]
        kinds = [next(iter(a)) for a in actions]
        assert kinds[0] == "commitInfo"
        assert "protocol" in kinds and "metaData" in kinds
        proto = next(a["protocol"] for a in actions if "protocol" in a)
        # protocol 1/2: no reader table features required — every Delta
        # reader ever shipped can scan this
        assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
        meta = next(a["metaData"] for a in actions if "metaData" in a)
        assert meta["format"] == {"provider": "parquet", "options": {}}
        # schemaString is a Spark schema JSON (that IS Delta's format)
        restored = StructType.fromJson(json.loads(meta["schemaString"]))
        assert restored == lake.schema()
        assert meta["partitionColumns"] == ["_ingestion_date"]
        adds = [a["add"] for a in actions if "add" in a]
        assert adds, "no add actions"
        for add in adds:
            disk = os.path.join(dest, urllib.parse.unquote(add["path"]))
            assert os.path.exists(disk)
            assert add["size"] == os.path.getsize(disk)
            assert add["dataChange"] is True
            assert set(add["partitionValues"]) == {"_ingestion_date"}
            stats = json.loads(add["stats"])
            assert stats["numRecords"] > 0
            assert "minValues" in stats and "maxValues" in stats

    def test_rows_round_trip(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        assert _rows(_read_exported(spark, dest)) == _rows(lake.read())

    def test_fast_path_hard_links(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        res = export_delta(lake, dest)
        assert res["linked"] == res["files"]
        state = replay_delta_log(dest)
        for path in state["files"]:
            rel = urllib.parse.unquote(path)
            src = os.path.join(lake.root, rel)
            dst = os.path.join(dest, rel)
            assert os.path.samefile(src, dst)  # zero-copy

    def test_time_travel_export(self, spark, lake, tmp_path):
        v0 = lake.version()
        lake.append(
            lake.read().limit(5).withColumn("val", F.lit("extra")),
        )
        dest = str(tmp_path / "delta")
        export_delta(lake, dest, version_as_of=v0)
        assert (
            _rows(_read_exported(spark, dest))
            == _rows(lake.read(version_as_of=v0))
        )

    def test_export_refuses_existing_log(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        with pytest.raises(ValueError, match="sync"):
            export_delta(lake, dest)

    def test_dv_files_rewritten_with_deletes_applied(
        self, spark, lake, tmp_path
    ):
        lake.delete_where("bucket = 2", deletion_vectors=True)
        assert lake._replay().file_dvs, "precondition: DV delete happened"
        dest = str(tmp_path / "delta")
        res = export_delta(lake, dest)
        assert res["rewritten"] > 0
        # exported data has the deletions applied — protocol 1 readers
        # need no DV support
        out = _read_exported(spark, dest)
        assert out.where("bucket = 2").count() == 0
        assert _rows(out) == _rows(lake.read())


class TestIncrementalSync:
    def test_append_only_sync_adds_new_files_only(
        self, spark, lake, tmp_path
    ):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        before = set(replay_delta_log(dest)["files"])
        lake.append(
            spark.range(100, 120).select(
                F.col("id"),
                (F.col("id") % 5).alias("bucket"),
                F.concat(F.lit("v"), F.col("id")).alias("val"),
                F.lit("2024-01-04").alias("_ingestion_date"),
            )
        )
        res = sync_delta(lake, dest)
        assert res["removed"] == 0 and res["added"] > 0
        state = replay_delta_log(dest)
        assert before < set(state["files"])
        assert _rows(_read_exported(spark, dest)) == _rows(lake.read())
        # txn action carries the exported lake version (exactly-once hook)
        assert state["txns"]["lake-export"] == lake.version()

    def test_sync_is_idempotent(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        res = sync_delta(lake, dest)
        assert res["noop"] is True
        assert replay_delta_log(dest)["version"] == 0

    def test_delete_then_sync_removes_and_rewrites_only_hit_files(
        self, spark, lake, tmp_path
    ):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        pre = replay_delta_log(dest)["files"]
        pre_mtime = {
            p: os.path.getmtime(
                os.path.join(dest, urllib.parse.unquote(p))
            )
            for p in pre
        }
        lake.delete_where("id < 10")
        res = sync_delta(lake, dest)
        assert res["noop"] is False
        state = replay_delta_log(dest)
        assert _rows(_read_exported(spark, dest)) == _rows(lake.read())
        # untouched exported files were not re-materialized (O(changes))
        survivors = set(pre) & set(state["files"])
        assert survivors, "some files must be untouched by the delete"
        for p in survivors:
            assert (
                os.path.getmtime(os.path.join(dest, urllib.parse.unquote(p)))
                == pre_mtime[p]
            )

    def test_optimize_then_sync_swaps_compacted_files(
        self, spark, lake, tmp_path
    ):
        # several small appends then OPTIMIZE: sync must emit removes for
        # the compacted inputs and adds for the compacted outputs
        for i in range(3):
            lake.append(
                spark.range(200 + i * 10, 210 + i * 10).select(
                    F.col("id"),
                    (F.col("id") % 5).alias("bucket"),
                    F.concat(F.lit("v"), F.col("id")).alias("val"),
                    F.lit("2024-01-05").alias("_ingestion_date"),
                )
            )
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        lake.optimize()
        res = sync_delta(lake, dest)
        assert res["removed"] > 0 and res["added"] > 0
        assert _rows(_read_exported(spark, dest)) == _rows(lake.read())

    def test_schema_evolution_sync_emits_new_metadata(
        self, spark, lake, tmp_path
    ):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        evolved = spark.range(300, 305).select(
            F.col("id"),
            (F.col("id") % 5).alias("bucket"),
            F.concat(F.lit("v"), F.col("id")).alias("val"),
            F.lit("2024-01-06").alias("_ingestion_date"),
            F.lit(1.5).alias("score"),  # new column
        )
        lake.append(evolved)
        sync_delta(lake, dest)
        state = replay_delta_log(dest)
        assert "score" in state["schema"].names
        assert _rows(_read_exported(spark, dest)) == _rows(lake.read())

    def test_sync_requires_prior_export(self, spark, lake, tmp_path):
        with pytest.raises(ValueError, match="export"):
            sync_delta(lake, str(tmp_path / "never-exported"))


class TestLegacySchemaRewrite:
    def test_type_widened_old_files_rewritten_to_snapshot_schema(
        self, spark, tmp_path
    ):
        # file written as long, schema later widened to string: the old
        # file cannot be read under the new schema by a plain parquet
        # reader, so export must rewrite it (cast applied)
        t = LakeTable(spark, str(tmp_path / "lake2"))
        t.append(
            spark.range(5).select(F.col("id"), F.col("id").alias("v")),
            partition_by=[],
        )
        t.append(
            spark.range(5, 10).select(
                F.col("id"), F.concat(F.lit("s"), F.col("id")).alias("v")
            )
        )
        assert t.schema()["v"].dataType.typeName() == "string"
        dest = str(tmp_path / "delta2")
        res = export_delta(t, dest)
        assert res["rewritten"] >= 1
        out = _read_exported(spark, dest)
        assert out.schema["v"].dataType.typeName() == "string"
        assert _rows(out) == _rows(t.read())


@pytest.mark.skipif(
    not DUCKDB_DELTA,
    reason="duckdb delta extension not loadable offline in this container",
)
class TestDuckDbInterop:
    def test_delta_scan_round_trip(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        con = duckdb.connect()
        con.execute("LOAD delta")
        rows = con.execute(
            f"SELECT id, bucket, val FROM delta_scan('{dest}') ORDER BY id"
        ).fetchall()
        expect = sorted(
            (r["id"], r["bucket"], r["val"]) for r in lake.read().collect()
        )
        assert rows == [tuple(r) for r in expect]


class TestCheckpoints:
    def test_checkpoint_state_equals_full_replay(self, spark, lake, tmp_path):
        from mongodb_cdc_delta_spark.sinks.delta_export import (
            read_checkpoint_state,
            write_checkpoint,
        )

        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        lake.append(
            spark.range(100, 110).select(
                F.col("id"),
                (F.col("id") % 5).alias("bucket"),
                F.concat(F.lit("v"), F.col("id")).alias("val"),
                F.lit("2024-01-07").alias("_ingestion_date"),
            )
        )
        sync_delta(lake, dest)
        res = write_checkpoint(dest)
        assert res["version"] == 1
        ck = read_checkpoint_state(dest)
        full = replay_delta_log(dest)
        assert ck["checkpoint_version"] == 1
        assert set(ck["files"]) == set(full["files"])
        for p in full["files"]:
            assert ck["files"][p]["size"] == full["files"][p]["size"]
            assert (
                ck["files"][p]["partitionValues"]
                == full["files"][p]["partitionValues"]
            )
            assert ck["files"][p]["stats"] == full["files"][p].get("stats")
        assert ck["schema"] == full["schema"]
        assert ck["partition_columns"] == full["partition_columns"]
        assert ck["txns"] == full["txns"]
        assert ck["protocol"] == full["protocol"]

    def test_checkpoint_plus_json_tail(self, spark, lake, tmp_path):
        # a reader loading the checkpoint must land on the same state as
        # one replaying every JSON commit, including commits AFTER it
        from mongodb_cdc_delta_spark.sinks.delta_export import (
            read_checkpoint_state,
            write_checkpoint,
        )

        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        write_checkpoint(dest)
        lake.delete_where("id < 20")
        sync_delta(lake, dest)  # commit 1 sits after the version-0 ckpt
        ck = read_checkpoint_state(dest)
        full = replay_delta_log(dest)
        assert ck["checkpoint_version"] == 0
        assert ck["version"] == full["version"] == 1
        assert set(ck["files"]) == set(full["files"])
        assert _rows(_read_exported(spark, dest)) == _rows(lake.read())

    def test_sync_auto_checkpoints_on_cadence(self, spark, lake, tmp_path):
        from mongodb_cdc_delta_spark.sinks import delta_export as de

        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        old = de.CHECKPOINT_EVERY
        de.CHECKPOINT_EVERY = 2
        try:
            results = []
            for i in range(4):
                lake.append(
                    spark.range(500 + i, 501 + i).select(
                        F.col("id"),
                        (F.col("id") % 5).alias("bucket"),
                        F.lit("x").alias("val"),
                        F.lit("2024-01-08").alias("_ingestion_date"),
                    )
                )
                results.append(sync_delta(lake, dest))
            assert [r["checkpointed"] for r in results] == [
                False,
                True,
                False,
                True,
            ]
            ck = de.read_checkpoint_state(dest)
            assert ck["checkpoint_version"] == 4
            assert set(ck["files"]) == set(replay_delta_log(dest)["files"])
        finally:
            de.CHECKPOINT_EVERY = old


def test_source_vacuum_does_not_break_export(spark, lake, tmp_path):
    # the export hard-links data files: when the source table rewrites
    # and VACUUMs old files, the exported table must stay readable (the
    # link keeps the inode alive) and still serve its own snapshot
    dest = str(tmp_path / "delta")
    export_delta(lake, dest)
    before = _rows(_read_exported(spark, dest))
    lake.delete_where("bucket >= 0")  # COW rewrite: every file replaced
    lake.vacuum(retention_hours=0)
    after = _rows(_read_exported(spark, dest))
    assert after == before  # export unaffected by source GC


def test_vacuum_export_deletes_expired_tombstones_only(
    spark, lake, tmp_path
):
    from mongodb_cdc_delta_spark.sinks.delta_export import vacuum_export

    dest = str(tmp_path / "delta")
    export_delta(lake, dest)
    live_before = set(replay_delta_log(dest)["files"])
    lake.delete_where("id < 50")  # COW: rewrites files → sync tombstones
    sync_delta(lake, dest)
    # within retention: nothing deleted yet (in-flight readers protected)
    r1 = vacuum_export(dest, retention_hours=168)
    assert r1["deleted"] == 0 and r1["retained"] > 0
    # past retention: tombstoned bytes go, live files stay readable
    r2 = vacuum_export(dest, retention_hours=0)
    assert r2["deleted"] == r1["retained"]
    state = replay_delta_log(dest)
    for p in state["files"]:
        import urllib.parse as up

        assert os.path.exists(os.path.join(dest, up.unquote(p)))
    assert _rows(_read_exported(spark, dest)) == _rows(lake.read())
    # the vacuumed files were among the pre-delete live set
    assert live_before - set(state["files"])


class TestCrashSafety:
    def test_sidecar_loss_recovers_from_log(self, spark, lake, tmp_path):
        # crash between _write_commit and _save_state: the sidecar lags
        # (or disappears); the next sync must rebuild exporter state from
        # the published log and produce the correct diff — not wedge, not
        # duplicate files
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        lake.delete_where("id < 10")
        sync_delta(lake, dest)
        os.remove(os.path.join(dest, "_lake_export_state.json"))
        # unchanged table: rebuilt state sees the exported lake version
        res = sync_delta(lake, dest)
        assert res["noop"] is True
        # advance after recovery: exactly one new commit, rows still match
        lake.append(
            spark.range(300, 310).select(
                F.col("id"),
                (F.col("id") % 5).alias("bucket"),
                F.lit("r").alias("val"),
                F.lit("2024-01-09").alias("_ingestion_date"),
            )
        )
        res2 = sync_delta(lake, dest)
        assert res2["noop"] is False
        assert _rows(_read_exported(spark, dest)) == _rows(lake.read())

    def test_stale_sidecar_is_ignored(self, spark, lake, tmp_path):
        # a sidecar one commit behind the log (the crash window) must be
        # superseded by log replay, not trusted
        import json as _json

        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        sp = os.path.join(dest, "_lake_export_state.json")
        stale = _json.load(open(sp))
        lake.delete_where("id >= 90")
        sync_delta(lake, dest)  # commit 1 + fresh sidecar
        _json.dump(stale, open(sp, "w"))  # simulate crash-stale sidecar
        res = sync_delta(lake, dest)  # table unchanged since commit 1
        assert res["noop"] is True
        assert replay_delta_log(dest)["version"] == 1

    def test_published_commits_are_put_if_absent(self, spark, lake, tmp_path):
        from mongodb_cdc_delta_spark.sinks.delta_export import (
            ConcurrentExportError,
            _write_commit,
        )

        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        with pytest.raises(ConcurrentExportError):
            _write_commit(dest, 0, [{"commitInfo": {"timestamp": 0}}])

    def test_place_file_retry_is_idempotent(self, tmp_path):
        # crash between file placement and commit publish retries the
        # same placement: an existing same-inode dst must be a no-op, an
        # existing different dst must be atomically replaced — neither
        # may raise (EEXIST / SameFileError would wedge every retry)
        from mongodb_cdc_delta_spark.sinks.delta_export import _place_file

        src = tmp_path / "src.parquet"
        src.write_bytes(b"payload-a")
        dst = tmp_path / "out" / "part.parquet"
        _place_file(str(src), str(dst))
        _place_file(str(src), str(dst))  # retry: same inode, no-op
        assert os.path.samefile(src, dst)
        other = tmp_path / "src2.parquet"
        other.write_bytes(b"payload-b")
        _place_file(str(other), str(dst))  # stale dst: replaced
        assert dst.read_bytes() == b"payload-b"

    def test_restore_resync_relinks_without_duplicate_path_actions(
        self, spark, lake, tmp_path
    ):
        # delete -> sync -> restore -> sync: the restored file re-exports
        # under its ORIGINAL delta path (fast-path link). The retry must
        # not wedge on the still-present old link, and the commit must
        # not contain both an add and a remove of the same path (the
        # Delta protocol forbids that within one version)
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        v_before = lake._replay().version
        lake.delete_where("id < 10")
        sync_delta(lake, dest)
        lake.restore(v_before)
        res = sync_delta(lake, dest)
        assert res["noop"] is False
        commit = os.path.join(
            dest, "_delta_log", f"{res['delta_version']:020d}.json"
        )
        adds, rms = set(), set()
        with open(commit) as fh:
            for line in fh:
                a = json.loads(line)
                if "add" in a:
                    adds.add(a["add"]["path"])
                if "remove" in a:
                    rms.add(a["remove"]["path"])
        assert not (adds & rms), f"add+remove same path: {adds & rms}"
        assert _rows(_read_exported(spark, dest)) == _rows(lake.read())
        # and the NEXT sync after an unrelated change still works
        lake.delete_where("id >= 95")
        sync_delta(lake, dest)
        assert _rows(_read_exported(spark, dest)) == _rows(lake.read())

    def test_sidecar_rebuild_does_not_flag_spurious_schema_change(
        self, spark, tmp_path
    ):
        # the rebuilt sidecar's schema_json comes from the metaData
        # schemaString (StructType round-trip, normalized metadata); a
        # raw dict compare against the lake log's schema JSON would see
        # a phantom schema change and re-rewrite every rewritten file
        t = LakeTable(spark, str(tmp_path / "lake3"))
        t.append(
            spark.range(5).select(F.col("id"), F.col("id").alias("v")),
            partition_by=[],
        )
        t.append(
            spark.range(5, 10).select(
                F.col("id"), F.concat(F.lit("s"), F.col("id")).alias("v")
            )
        )  # widens v to string -> first file is REWRITTEN on export
        dest = str(tmp_path / "delta3")
        assert export_delta(t, dest)["rewritten"] >= 1
        os.remove(os.path.join(dest, "_lake_export_state.json"))
        n_before = len(t._replay().files)
        t.append(
            spark.range(10, 12).select(
                F.col("id"), F.concat(F.lit("s"), F.col("id")).alias("v")
            )
        )  # same schema: only the newly appended files may be exported
        n_new = len(t._replay().files) - n_before
        res = sync_delta(t, dest)
        assert res["added"] == n_new and res["removed"] == 0, (
            f"spurious schema-change rewrite: {res} (expected {n_new} adds)"
        )
        assert _rows(_read_exported(spark, dest)) == _rows(t.read())

    def test_checkpoint_carries_unexpired_tombstones(
        self, spark, lake, tmp_path
    ):
        from mongodb_cdc_delta_spark.sinks.delta_export import (
            read_checkpoint_state,
            write_checkpoint,
        )

        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        lake.delete_where("id < 30")
        res = sync_delta(lake, dest)
        assert res["removed"] > 0
        write_checkpoint(dest)
        ck = read_checkpoint_state(dest)
        # recently-removed files are tracked as tombstones (spec), so a
        # checkpoint-based external vacuum cannot treat them as untracked
        assert len(ck["tombstones"]) == res["removed"]
        assert not (set(ck["tombstones"]) & set(ck["files"]))


class TestCdcOrphanCleanup:
    """A sync that crashes between placing _change_data files and
    publishing the commit must not leak them: in-process failures clean
    up immediately; hard-crash leftovers (uuid-named, never referenced
    by any commit) are swept by vacuum_export on the retention window."""

    def _cdc_files(self, dest: str) -> set[str]:
        cdir = os.path.join(dest, "_change_data")
        out = set()
        for root, _d, names in os.walk(cdir):
            for n in names:
                out.add(os.path.join(root, n))
        return out

    def test_failed_publish_removes_placed_cdc_files(
        self, spark, lake, tmp_path
    ):
        from mongodb_cdc_delta_spark.sinks import delta_export as de

        dest = str(tmp_path / "delta")
        export_delta(lake, dest, change_data=True)
        before = self._cdc_files(dest)
        lake.delete_where("id < 5")
        real = de._write_commit
        de._write_commit = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("boom")
        )
        try:
            with pytest.raises(RuntimeError):
                sync_delta(lake, dest, change_data=True)
        finally:
            de._write_commit = real
        assert self._cdc_files(dest) == before, (
            "failed publish leaked this attempt's cdc files"
        )
        # retry converges and its cdc files are the referenced ones
        res = sync_delta(lake, dest, change_data=True)
        assert res["noop"] is False
        assert _rows(_read_exported(spark, dest)) == _rows(lake.read())

    def test_vacuum_sweeps_unreferenced_aged_cdc_files(
        self, spark, lake, tmp_path
    ):
        from mongodb_cdc_delta_spark.sinks.delta_export import (
            vacuum_export,
        )

        dest = str(tmp_path / "delta")
        export_delta(lake, dest, change_data=True)
        lake.delete_where("id < 5")
        sync_delta(lake, dest, change_data=True)
        # simulate a kill -9 leftover: unreferenced uuid-named cdc file
        orphan = os.path.join(
            dest, "_change_data", "cdc-deadbeefdeadbeef.parquet"
        )
        os.makedirs(os.path.dirname(orphan), exist_ok=True)
        open(orphan, "wb").write(b"not-a-real-parquet")
        fresh = vacuum_export(dest, retention_hours=168.0)
        assert os.path.exists(orphan), (
            "a fresh unreferenced file is inside the retention window "
            "(could be an in-flight concurrent sync) - must be kept"
        )
        assert fresh["cdc_deleted"] == 0
        # age it past the window: swept
        old = time.time() - 200 * 3600
        os.utime(orphan, (old, old))
        res = vacuum_export(dest, retention_hours=168.0)
        assert not os.path.exists(orphan)
        assert res["cdc_deleted"] == 1
        # referenced cdc files inside the window are untouched
        from mongodb_cdc_delta_spark.interop import delta_reader as dr

        assert dr.read_changes(dest, 1, 1)
