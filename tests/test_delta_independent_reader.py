"""The exported ``_delta_log`` round-tripped through the INDEPENDENT
spec-only reader (``interop/delta_reader.py``) — a different author
contract and a different parquet stack (pyarrow, no Spark) from the
writer, standing in for the reference's third-party read contract
(DuckDB ``delta_scan``; reference README.md:78, research.md:546-615)
which cannot be installed offline.

Every writer scenario from ``test_delta_export.py`` is replayed here and
verified by VALUE through the independent reader; refusal tests pin the
reader's spec-gating behavior so it stays adversarial (it must reject
what it cannot faithfully read, not guess).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.interop import delta_reader as dr
from mongodb_cdc_delta_spark.sinks.delta_export import (
    export_delta,
    sync_delta,
    write_checkpoint,
)
from mongodb_cdc_delta_spark.sinks.table import LakeTable

# deep storage-layer e2e: excluded from the fast lane (see pytest.ini)
pytestmark = pytest.mark.slow


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


def _canon_cell(v):
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, datetime):
        if v.tzinfo is not None:  # pyarrow UTC-aware vs Spark naive-UTC
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    return str(v)


def _spark_rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(_canon_cell(r[c]) for c in cols) for r in df.collect()
    )


def _reader_rows(dest, version=None):
    rows = dr.read_rows(dest, version)
    if not rows:
        return []
    cols = sorted(rows[0])
    return sorted(tuple(_canon_cell(r[c]) for c in cols) for r in rows)


def _assert_round_trip(lake, dest, version=None):
    expect = _spark_rows(lake.read() if version is None else lake.read())
    got = _reader_rows(dest, version)
    assert got == expect


class TestFirewall:
    def test_reader_imports_nothing_from_the_writer_package(self):
        """The independent reader must stay independent: no imports from
        the package outside interop/ (spec text is its only source)."""
        import ast

        tree = ast.parse(open(dr.__file__).read())
        mods: list[str] = []
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                mods += [a.name for a in node.names]
            elif isinstance(node, ast.ImportFrom):
                if node.level:  # relative import escaping interop/
                    assert node.level == 1, "no `from ..` imports allowed"
                mods.append(node.module or "")
        for m in mods:
            root = m.split(".")[0]
            assert root not in ("mongodb_cdc_delta_spark", "pyspark"), m
            assert "sinks" not in m, m


class TestFullExportRoundTrip:
    def test_rows_match_by_value(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        _assert_round_trip(lake, dest)

    def test_partition_column_reattached_from_partition_values(
        self, spark, lake, tmp_path
    ):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        snap = dr.load_snapshot(dest)
        assert snap.partition_columns == ["_ingestion_date"]
        rows = dr.read_rows(dest)
        assert {r["_ingestion_date"] for r in rows} == {
            "2024-01-01",
            "2024-01-02",
            "2024-01-03",
        }
        # and the data files genuinely lack the column (spec: partition
        # columns live only in partitionValues)
        import pyarrow.parquet as pq

        some = next(iter(snap.files))
        names = pq.read_schema(snap.data_path(some)).names
        assert "_ingestion_date" not in names

    def test_snapshot_exposes_txn_and_stats(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        snap = dr.load_snapshot(dest)
        assert snap.txns.get("lake-export") == lake.version()
        for add in snap.files.values():
            stats = json.loads(add["stats"])
            assert stats["numRecords"] > 0


class TestSyncScenarios:
    def test_append_sync(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        more = spark.range(100, 140).select(
            F.col("id"),
            (F.col("id") % 5).alias("bucket"),
            F.concat(F.lit("v"), F.col("id")).alias("val"),
            F.lit("2024-01-04").alias("_ingestion_date"),
        )
        lake.append(more, partition_by=["_ingestion_date"])
        sync_delta(lake, dest)
        _assert_round_trip(lake, dest)

    def test_delete_sync(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        lake.delete_where("bucket = 2")
        sync_delta(lake, dest)
        _assert_round_trip(lake, dest)
        assert all(
            r["bucket"] != 2 for r in dr.read_rows(dest)
        )

    def test_optimize_sync(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        lake.optimize()
        sync_delta(lake, dest)
        _assert_round_trip(lake, dest)

    def test_schema_evolution_sync(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        wider = spark.range(200, 220).select(
            F.col("id"),
            (F.col("id") % 5).alias("bucket"),
            F.concat(F.lit("v"), F.col("id")).alias("val"),
            F.lit("extra").alias("note"),
            F.lit("2024-01-05").alias("_ingestion_date"),
        )
        lake.append(wider)
        sync_delta(lake, dest)
        _assert_round_trip(lake, dest)
        snap = dr.load_snapshot(dest)
        assert "note" in [f["name"] for f in snap.schema["fields"]]

    def test_time_travel_versions(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        v0_rows = _reader_rows(dest)
        lake.delete_where("bucket = 0")
        sync_delta(lake, dest)
        # old delta version still readable and unchanged (spec: commits
        # are immutable; snapshot at version 0 ignores the tail)
        assert _reader_rows(dest, version=0) == v0_rows
        assert len(_reader_rows(dest, version=1)) < len(v0_rows)


class TestCheckpointPath:
    def test_reader_prefers_checkpoint_and_survives_json_truncation(
        self, spark, lake, tmp_path
    ):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        lake.delete_where("bucket = 1")
        sync_delta(lake, dest)
        write_checkpoint(dest)
        expect = _reader_rows(dest)
        # Spec "Checkpoints": commits at or before a checkpoint may be
        # cleaned up; a checkpoint-aware reader must not need them.
        for v in (0, 1):
            os.unlink(os.path.join(dest, "_delta_log", f"{v:020d}.json"))
        assert _reader_rows(dest) == expect
        _assert_round_trip(lake, dest)

    def test_checkpoint_plus_json_tail(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        write_checkpoint(dest)
        more = spark.range(100, 120).select(
            F.col("id"),
            (F.col("id") % 5).alias("bucket"),
            F.concat(F.lit("v"), F.col("id")).alias("val"),
            F.lit("2024-01-06").alias("_ingestion_date"),
        )
        lake.append(more, partition_by=["_ingestion_date"])
        sync_delta(lake, dest)
        _assert_round_trip(lake, dest)
        snap = dr.load_snapshot(dest)
        assert snap.version == 1

    def test_multipart_checkpoint_read(self, spark, lake, tmp_path):
        # split a classic checkpoint into the spec's multi-part form
        # ({v}.checkpoint.{p}.{t}.parquet) — the reader must load ALL
        # parts and reconstruct the same state
        import pyarrow.parquet as pq

        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        lake.delete_where("bucket = 2")
        sync_delta(lake, dest)
        write_checkpoint(dest)
        expect = _reader_rows(dest)
        log = os.path.join(dest, "_delta_log")
        single = os.path.join(log, f"{1:020d}.checkpoint.parquet")
        tbl = pq.read_table(single)
        half = tbl.num_rows // 2
        pq.write_table(
            tbl.slice(0, half),
            os.path.join(
                log, f"{1:020d}.checkpoint.{1:010d}.{2:010d}.parquet"
            ),
        )
        pq.write_table(
            tbl.slice(half),
            os.path.join(
                log, f"{1:020d}.checkpoint.{2:010d}.{2:010d}.parquet"
            ),
        )
        os.unlink(single)
        for v in (0, 1):  # force the checkpoint path
            os.unlink(os.path.join(log, f"{v:020d}.json"))
        assert _reader_rows(dest) == expect

    def test_incomplete_multipart_checkpoint_refused(
        self, spark, lake, tmp_path
    ):
        import pyarrow.parquet as pq

        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        write_checkpoint(dest)
        log = os.path.join(dest, "_delta_log")
        single = os.path.join(log, f"{0:020d}.checkpoint.parquet")
        tbl = pq.read_table(single)
        pq.write_table(
            tbl.slice(0, 1),
            os.path.join(
                log, f"{0:020d}.checkpoint.{1:010d}.{2:010d}.parquet"
            ),
        )  # declares 2 parts, only part 1 present
        os.unlink(single)
        with pytest.raises(dr.DeltaReadError, match="incomplete"):
            dr.load_snapshot(dest)

    def test_timestamp_time_travel(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        v0_rows = _reader_rows(dest)
        t0 = dr._commit_timestamp_ms(
            os.path.join(dest, "_delta_log"), 0
        )
        lake.delete_where("bucket = 0")
        # ensure a strictly-later commit timestamp (ms granularity)
        import time as _time

        _time.sleep(0.01)
        sync_delta(lake, dest)
        snap = dr.load_snapshot(dest, timestamp_ms=t0)
        assert snap.version == 0
        assert _reader_rows(dest, snap.version) == v0_rows
        assert dr.load_snapshot(dest).version == 1
        with pytest.raises(dr.DeltaReadError, match="timestamp"):
            dr.load_snapshot(dest, timestamp_ms=t0 - 10_000)
        with pytest.raises(ValueError):
            dr.load_snapshot(dest, version=0, timestamp_ms=t0)

    def test_checkpoint_tombstones_visible(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        lake.delete_where("bucket = 3")
        sync_delta(lake, dest)
        write_checkpoint(dest)
        for v in (0, 1):
            os.unlink(os.path.join(dest, "_delta_log", f"{v:020d}.json"))
        snap = dr.load_snapshot(dest)
        assert snap.tombstones, "recent removes must survive checkpointing"


class TestChangeDataFeed:
    """CDF export (cdc actions + _change_data files) read back through
    the independent reader and compared by value against the lake's own
    read_changes."""

    def _lake_changes(self, lake, from_v, to_v):
        df = lake.read_changes(from_v, to_v).drop(
            "_commit_version", "_commit_timestamp"
        )
        cols = sorted(df.columns)
        return sorted(
            tuple(_canon_cell(r[c]) for c in cols) for r in df.collect()
        )

    def _reader_changes(self, dest, from_v, to_v):
        rows = dr.read_changes(dest, from_v, to_v)
        for r in rows:
            r.pop("_commit_version"), r.pop("_commit_timestamp")
        if not rows:
            return []
        cols = sorted(rows[0])
        return sorted(
            tuple(_canon_cell(r[c]) for c in cols) for r in rows
        )

    def test_flag_in_configuration_and_no_cdc_at_convert(
        self, spark, lake, tmp_path
    ):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest, change_data=True)
        snap = dr.load_snapshot(dest)
        assert (
            snap.metadata["configuration"]["delta.enableChangeDataFeed"]
            == "true"
        )
        log = os.path.join(dest, "_delta_log", f"{0:020d}.json")
        assert not any("cdc" in json.loads(x) for x in open(log))

    def test_sync_changes_match_lake_cdf_net(self, spark, lake, tmp_path):
        # A multi-version sync window folds into ONE delta commit, so
        # the cdc content must be the window's NET effect: a row churned
        # inside the window (inserted at v0+1, deleted at v0+2 — here
        # every bucket=3 row of the append) appears in the lake's raw
        # feed as insert+delete but must CANCEL in the export, or a
        # consumer folding the unordered commit multiset resurrects it.
        dest = str(tmp_path / "delta")
        export_delta(lake, dest, change_data=True)
        v0 = lake.version()
        more = spark.range(100, 130).select(
            F.col("id"),
            (F.col("id") % 5).alias("bucket"),
            F.concat(F.lit("v"), F.col("id")).alias("val"),
            F.lit("2024-01-04").alias("_ingestion_date"),
        )
        lake.append(more, partition_by=["_ingestion_date"])
        lake.delete_where("bucket = 3")
        sync_delta(lake, dest, change_data=True)
        got = self._reader_changes(dest, 1, 1)
        raw = self._lake_changes(lake, v0 + 1, lake.version())
        # expected = multiset difference of the raw window feed, keyed
        # on the data columns. Canonical tuples order columns by sorted
        # name, so locate _change_type positionally.
        from collections import Counter

        cols = sorted(
            lake.read_changes(v0 + 1, lake.version())
            .drop("_commit_version", "_commit_timestamp")
            .columns
        )
        ct = cols.index("_change_type")

        def split(t):
            return t[ct], t[:ct] + t[ct + 1 :]

        def rejoin(kind, data):
            return data[:ct] + (kind,) + data[ct:]

        ins = Counter(d for k, d in map(split, raw) if k == "insert")
        dels = Counter(d for k, d in map(split, raw) if k == "delete")
        expect = sorted(
            [rejoin("insert", d) for d in (ins - dels).elements()]
            + [rejoin("delete", d) for d in (dels - ins).elements()]
        )
        assert got == expect
        assert got, "change set must be non-empty"
        churned = ins & dels  # the intra-window insert+delete pairs
        assert churned, "test must actually exercise window churn"
        got_keys = {split(t)[1] for t in got}
        assert not (set(churned) & got_keys), (
            "rows churned inside the window must cancel in the export"
        )
        # snapshot reads are unaffected by cdc actions
        _assert_round_trip(lake, dest)

    def test_rearrangement_sync_reads_as_zero_changes(
        self, spark, lake, tmp_path
    ):
        # OPTIMIZE swaps files (dataChange adds+removes in the sync
        # commit) but moves no rows: the EMPTY cdc file must override
        # add/remove derivation so downstream sees no changes
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
        export_delta(lake, dest, change_data=True)
        lake.optimize()
        res = sync_delta(lake, dest, change_data=True)
        assert res["added"] > 0 and res["removed"] > 0
        assert self._reader_changes(dest, 1, 1) == []
        _assert_round_trip(lake, dest)

    def test_vacuum_sweeps_expired_cdc_files_only(
        self, spark, lake, tmp_path
    ):
        from mongodb_cdc_delta_spark.sinks.delta_export import (
            vacuum_export,
        )

        dest = str(tmp_path / "delta")
        export_delta(lake, dest, change_data=True)
        lake.delete_where("bucket = 1")
        sync_delta(lake, dest, change_data=True)
        # within retention: everything stays readable
        res = vacuum_export(dest, retention_hours=168.0)
        assert res["cdc_deleted"] == 0
        assert self._reader_changes(dest, 1, 1)
        # retention 0: the commit's cdc files age out; CDF read now
        # fails LOUDLY (file listed but gone), snapshot reads unaffected
        res = vacuum_export(dest, retention_hours=0.0)
        assert res["cdc_deleted"] > 0
        with pytest.raises(dr.DeltaReadError, match="missing"):
            dr.read_changes(dest, 1, 1)
        _assert_round_trip(lake, dest)

    def test_cdf_replication_converges_to_snapshot(
        self, spark, lake, tmp_path
    ):
        """The full point of the CDF export: a downstream replica that
        only ever sees the change feed (apply deletes-then-inserts per
        commit, the standard CDF merge recipe) must converge to the
        exported snapshot through appends, deletes, updates and a
        compaction."""
        dest = str(tmp_path / "delta")
        export_delta(lake, dest, change_data=True)

        def apply_commit(replica, version):
            changes = dr.read_changes(dest, version, version)
            meta = {"_change_type", "_commit_version", "_commit_timestamp"}
            key = lambda r: tuple(
                _canon_cell(r[c]) for c in sorted(r) if c not in meta
            )
            for r in changes:
                if r["_change_type"] == "delete":
                    replica.discard(key(r))
            for r in changes:
                if r["_change_type"] == "insert":
                    replica.add(key(r))

        # seed the replica from the initial snapshot (commit 0 is the
        # CONVERT; its adds are the initial inserts)
        replica: set = set()
        apply_commit(replica, 0)
        steps = [
            lambda: lake.append(
                spark.range(100, 120).select(
                    F.col("id"),
                    (F.col("id") % 5).alias("bucket"),
                    F.concat(F.lit("v"), F.col("id")).alias("val"),
                    F.lit("2024-01-06").alias("_ingestion_date"),
                )
            ),
            lambda: lake.delete_where("bucket = 4"),
            lambda: lake.update_where("bucket = 1", {"val": "'updated'"}),
            lambda: lake.optimize(),
        ]
        v = 0
        for step in steps:
            step()
            res = sync_delta(lake, dest, change_data=True)
            v = res["delta_version"]
            apply_commit(replica, v)
        expect = set(_spark_rows(lake.read()))
        assert replica == expect

    def test_reader_refuses_cdf_without_flag(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)  # change_data NOT enabled
        with pytest.raises(dr.UnsupportedDeltaTable, match="ChangeData"):
            dr.read_changes(dest, 0)


class TestSpecGating:
    """The reader must refuse what it cannot faithfully read."""

    def _bump_protocol(self, dest, proto):
        log = os.path.join(dest, "_delta_log", f"{0:020d}.json")
        lines = [json.loads(x) for x in open(log) if x.strip()]
        lines = [
            {"protocol": proto} if "protocol" in a else a for a in lines
        ]
        with open(log, "w") as fh:
            for a in lines:
                fh.write(json.dumps(a) + "\n")

    def test_refuses_reader_version_3(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        self._bump_protocol(
            dest,
            {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
            },
        )
        with pytest.raises(dr.UnsupportedDeltaTable):
            dr.load_snapshot(dest)

    def test_refuses_column_mapping(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        log = os.path.join(dest, "_delta_log", f"{0:020d}.json")
        lines = [json.loads(x) for x in open(log) if x.strip()]
        for a in lines:
            if "metaData" in a:
                a["metaData"]["configuration"] = {
                    "delta.columnMapping.mode": "name"
                }
        with open(log, "w") as fh:
            for a in lines:
                fh.write(json.dumps(a) + "\n")
        with pytest.raises(dr.UnsupportedDeltaTable):
            dr.load_snapshot(dest)

    def test_refuses_non_contiguous_log(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        lake.delete_where("bucket = 4")
        sync_delta(lake, dest)
        os.unlink(os.path.join(dest, "_delta_log", f"{0:020d}.json"))
        with pytest.raises(dr.DeltaReadError):
            dr.load_snapshot(dest)

    def test_refuses_unknown_action(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        log = os.path.join(dest, "_delta_log", f"{0:020d}.json")
        with open(log) as fh:
            content = fh.read()
        os.unlink(log)
        with open(log, "w") as fh:
            fh.write(content)
            fh.write(json.dumps({"mysteryAction": {"x": 1}}) + "\n")
        with pytest.raises(dr.DeltaReadError):
            dr.load_snapshot(dest)

    def test_refuses_physical_type_mismatch(self, tmp_path):
        # hand-built table whose log declares `long` but whose parquet
        # holds int32 — exactly the bug class (un-rewritten file after a
        # type change) the reader exists to catch; protocol 1/2 requires
        # rewrite, so this must refuse, not cast
        import pyarrow as pa
        import pyarrow.parquet as pq

        root = tmp_path / "bad"
        (root / "_delta_log").mkdir(parents=True)
        pq.write_table(
            pa.table({"id": pa.array([1, 2], pa.int32())}),
            str(root / "part-0.parquet"),
        )
        schema = {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {}},
            ],
        }
        actions = [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {
                "id": "t", "format": {"provider": "parquet",
                                      "options": {}},
                "schemaString": json.dumps(schema),
                "partitionColumns": [], "configuration": {},
            }},
            {"add": {"path": "part-0.parquet", "partitionValues": {},
                     "size": os.path.getsize(root / "part-0.parquet"),
                     "dataChange": True}},
        ]
        with open(root / "_delta_log" / f"{0:020d}.json", "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")
        with pytest.raises(dr.DeltaReadError, match="rewrite"):
            dr.read_rows(str(root))

    def test_refuses_stats_row_count_mismatch(self, spark, lake, tmp_path):
        dest = str(tmp_path / "delta")
        export_delta(lake, dest)
        log = os.path.join(dest, "_delta_log", f"{0:020d}.json")
        lines = [json.loads(x) for x in open(log) if x.strip()]
        for a in lines:
            if "add" in a and a["add"].get("stats"):
                s = json.loads(a["add"]["stats"])
                s["numRecords"] += 1
                a["add"]["stats"] = json.dumps(s)
                break
        with open(log, "w") as fh:
            for a in lines:
                fh.write(json.dumps(a) + "\n")
        with pytest.raises(dr.DeltaReadError):
            dr.read_rows(dest)


class TestPartitionValueParsing:
    def test_primitive_partition_values(self):
        assert dr.parse_partition_value("7", "long") == 7
        assert dr.parse_partition_value("7", "integer") == 7
        assert dr.parse_partition_value("1.5", "double") == 1.5
        assert dr.parse_partition_value("true", "boolean") is True
        assert dr.parse_partition_value("", "string") == ""
        assert dr.parse_partition_value("", "long") is None
        assert dr.parse_partition_value(None, "string") is None
        assert str(dr.parse_partition_value("2024-02-29", "date")) == (
            "2024-02-29"
        )
        ts = dr.parse_partition_value(
            "2024-01-02 03:04:05.123456", "timestamp"
        )
        assert ts.microsecond == 123456
        assert dr.parse_partition_value("1.50", "decimal(4,2)") == Decimal(
            "1.50"
        )

    def test_bad_boolean_raises(self):
        with pytest.raises(dr.DeltaReadError):
            dr.parse_partition_value("TRUE", "boolean")
