"""LakeTable sink: ACID append, schema evolution on write, time travel,
idempotent txns, OPTIMIZE, VACUUM.

Mirrors the reference's integration coverage (tests/integration/
test_cdc_insert.py, test_type_evolution.py:65-118 int32→int64 widening
against the live table, test_crash_recovery.py idempotent redelivery).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.schema import MergeMode, SchemaEvolutionError
from mongodb_cdc_delta_spark.sinks import ConcurrentWriteError, LakeTable

# deep storage-layer e2e: excluded from the fast lane (see pytest.ini)
pytestmark = pytest.mark.slow


@pytest.fixture()
def lake(tmp_path):
    return str(tmp_path / "lake")


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_append_and_read_roundtrip(spark, lake):
    t = LakeTable(spark, lake + "/users")
    df = _df(spark, [(1, "alice"), (2, "bob")], "id long, name string")
    res = t.append(df)
    assert res["version"] == 0 and res["files"] >= 1
    got = t.read().orderBy("id").collect()
    assert [(r.id, r.name) for r in got] == [(1, "alice"), (2, "bob")]


def test_append_is_atomic_versions_increment(spark, lake):
    t = LakeTable(spark, lake + "/t")
    df = _df(spark, [(1,)], "id long")
    t.append(df)
    t.append(df)
    assert t.version() == 1
    assert t.read().count() == 2
    hist = t.history()
    assert [c.version for c in hist] == [1, 0]
    assert all(c.operation == "WRITE" for c in hist)


def test_partitioned_append_prunes(spark, lake):
    t = LakeTable(spark, lake + "/p")
    df = _df(
        spark,
        [(1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-02")],
        "id long, _ingestion_date string",
    )
    t.append(df, partition_by=["_ingestion_date"])
    out = t.read().where(F.col("_ingestion_date") == "2024-01-02")
    assert out.count() == 2
    # partition filter must reach the scan as a PartitionFilters pushdown
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_schema_evolution_add_column(spark, lake):
    t = LakeTable(spark, lake + "/evo")
    t.append(_df(spark, [(1, "a")], "id long, name string"))
    t.append(_df(spark, [(2, "b", 9.5)], "id long, name string, score double"))
    schema = t.schema()
    assert {f.name for f in schema.fields} == {"id", "name", "score"}
    rows = {r.id: r for r in t.read().collect()}
    assert rows[1].score is None and rows[2].score == 9.5


def test_schema_evolution_int_widens_to_long(spark, lake):
    # reference test_type_evolution.py:65-118: int32 → int64 against the table
    t = LakeTable(spark, lake + "/widen")
    t.append(_df(spark, [(1, 10)], "id long, v int"))
    t.append(_df(spark, [(2, 2**40)], "id long, v long"))
    assert t.schema()["v"].dataType.typeName() == "long"
    vals = sorted(r.v for r in t.read().collect())
    assert vals == [10, 2**40]


def test_schema_conflict_to_string_permissive(spark, lake):
    # reference fixture schema_evolution_samples.json:43-62 — long + string
    # resolves to string under PERMISSIVE/AUTO widening
    t = LakeTable(spark, lake + "/conflict")
    t.append(_df(spark, [(1, 42)], "id long, v long"))
    t.append(
        _df(spark, [(2, "hello")], "id long, v string"), mode=MergeMode.PERMISSIVE
    )
    assert t.schema()["v"].dataType.typeName() == "string"
    vals = sorted(r.v for r in t.read().collect())
    assert vals == ["42", "hello"]


def test_schema_conflict_strict_raises(spark, lake):
    t = LakeTable(spark, lake + "/strict")
    t.append(_df(spark, [(1, 42)], "id long, v long"))
    with pytest.raises(SchemaEvolutionError):
        t.append(
            _df(spark, [(2, "x")], "id long, v string"), mode=MergeMode.STRICT
        )


def test_time_travel_by_version(spark, lake):
    t = LakeTable(spark, lake + "/tt")
    t.append(_df(spark, [(1,)], "id long"))
    t.append(_df(spark, [(2,)], "id long"))
    assert t.read(version_as_of=0).count() == 1
    assert t.read(version_as_of=1).count() == 2
    with pytest.raises(ValueError):
        t.read(version_as_of=99)


def test_txn_idempotency_skips_replayed_batch(spark, lake):
    # foreachBatch exactly-once: same (app_id, batch_id) → skipped
    t = LakeTable(spark, lake + "/txn")
    df = _df(spark, [(1,)], "id long")
    r1 = t.append(df, txn=("app", 7))
    r2 = t.append(df, txn=("app", 7))
    assert not r1["skipped"] and r2["skipped"]
    assert t.read().count() == 1
    r3 = t.append(df, txn=("app", 8))
    assert not r3["skipped"] and t.read().count() == 2


def test_concurrent_write_detected(spark, lake):
    t1 = LakeTable(spark, lake + "/cc")
    t2 = LakeTable(spark, lake + "/cc")
    t1.append(_df(spark, [(1,)], "id long"))
    # simulate a lost race: t2 tries to publish a version t1 already owns
    from mongodb_cdc_delta_spark.sinks.table import CommitInfo

    with pytest.raises(ConcurrentWriteError):
        t2._publish(
            CommitInfo(version=0, timestamp_ms=0, operation="WRITE")
        )


def test_optimize_compacts_small_files(spark, lake):
    t = LakeTable(spark, lake + "/opt")
    for i in range(3):
        t.append(
            _df(spark, [(i, "2024-01-01")], "id long, d string").coalesce(1),
            partition_by=["d"],
        )
    before = t.file_count()
    assert before >= 3
    res = t.optimize()
    assert res["partitions_compacted"] == 1
    assert t.file_count() < before
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2]
    # old snapshot still readable (files not deleted until vacuum)
    assert t.read(version_as_of=2).count() == 3


def test_optimize_binpacks_leaves_big_files_alone(spark, lake):
    """Delta-style bin-packing (r8): only files below small_file_bytes are
    rewrite candidates — the big compacted file must NOT be re-read and
    re-written on every maintenance tick (the O(table)-per-tick shape the
    r8 soak measured as growing compaction cost)."""
    import os

    t = LakeTable(spark, lake + "/bp")
    t.append(
        _df(spark, [(i,) for i in range(50_000)], "id long").coalesce(1)
    )
    big = t._replay().files
    assert len(big) == 1
    big_path = big[0]
    big_bytes = os.path.getsize(os.path.join(t.root, big_path))
    for i in range(3):
        t.append(_df(spark, [(100_000 + i,)], "id long").coalesce(1))
    res = t.optimize(small_file_bytes=big_bytes)  # big file is NOT small
    after = t._replay().files
    assert big_path in after, "big file must survive untouched"
    assert len(after) == 2, "three small files bin-packed into one"
    assert res["files_before"] == 4 and res["files_after"] == 2
    assert t.read().count() == 50_003


def test_optimize_splits_output_by_target_rows(spark, lake):
    """Compaction output honors target_file_rows (the old default path
    coalesce(1)'d the whole partition into one unbounded file)."""
    t = LakeTable(spark, lake + "/split")
    for i in range(8):
        t.append(
            _df(
                spark,
                [(i * 25 + j,) for j in range(25)],
                "id long",
            ).coalesce(1)
        )
    t.optimize(target_file_rows=50)
    assert t.file_count() == 4  # ceil(200 / 50)
    assert t.read().count() == 200
    assert sorted(r.id for r in t.read().collect()) == list(range(200))


def test_optimize_rewrites_dv_file_regardless_of_size(spark, lake):
    """A file above small_file_bytes still rewrites when it carries a
    deletion vector: OPTIMIZE is the DV-compaction path."""
    import os

    t = LakeTable(spark, lake + "/dvbig")
    t.append(_df(spark, [(i,) for i in range(10_000)], "id long").coalesce(1))
    t.delete_where("id = 7", deletion_vectors=True)
    snap = t._replay()
    assert any(snap.file_dvs.values())
    f = snap.files[0]
    sz = os.path.getsize(os.path.join(t.root, f))
    res = t.optimize(small_file_bytes=min(sz, 1))  # nothing is "small"
    assert res["files_after"] >= 1
    snap2 = t._replay()
    assert not any(snap2.file_dvs.values()), "DV applied and cleared"
    assert t.read().count() == 9_999


def test_vacuum_deletes_unreferenced_files(spark, lake):
    t = LakeTable(spark, lake + "/vac")
    for i in range(2):
        t.append(_df(spark, [(i,)], "id long").coalesce(1))
    t.optimize()
    # retention 0 → everything unreferenced is deletable immediately
    res = t.vacuum(retention_hours=0.0)
    assert res["files_deleted"] >= 2
    assert t.read().count() == 2


def test_create_if_not_exists(spark, lake):
    from pyspark.sql.types import LongType, StructField, StructType

    t = LakeTable(spark, lake + "/empty")
    schema = StructType([StructField("id", LongType())])
    assert t.create_if_not_exists(schema, partition_by=[])
    assert not t.create_if_not_exists(schema)
    assert t.read().count() == 0
    assert t.schema()["id"].dataType.typeName() == "long"


# ---------------------------------------------------------------------------
# Hardening: UTC timestamp strings, lost-race orphan cleanup, predicate
# error propagation
# ---------------------------------------------------------------------------
def test_timestamp_as_of_string_is_utc_subsecond(spark, lake):
    import datetime as dt

    t = LakeTable(spark, lake + "/ts")
    t.append(_df(spark, [(1,)], "id long"))
    t.append(_df(spark, [(2,)], "id long"))
    v0_ms = t.history()[-1].timestamp_ms
    # an ISO string naming v0's exact UTC commit instant (sub-second kept)
    # must resolve to v0 regardless of the host timezone
    iso = dt.datetime.fromtimestamp(
        v0_ms / 1000, tz=dt.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S.%f")
    assert t.read(timestamp_as_of=iso).count() == 1
    # explicit offset strings work too
    assert (
        t.read(
            timestamp_as_of=dt.datetime.fromtimestamp(
                v0_ms / 1000, tz=dt.timezone.utc
            ).isoformat()
        ).count()
        == 1
    )


def test_lost_race_cleans_up_staged_files(spark, lake, monkeypatch):
    import os

    from mongodb_cdc_delta_spark.sinks import CommitInfo

    t = LakeTable(spark, lake + "/race")
    t.append(_df(spark, [(1,)], "id long"))

    def parquet_files():
        out = []
        for dirpath, _dirs, names in os.walk(t.root):
            if "_tmp" in dirpath or "_log" in dirpath:
                continue
            out.extend(n for n in names if n.endswith(".parquet"))
        return sorted(out)

    before = parquet_files()
    orig_stage = t._stage_write
    stale_version = t.version()

    def stage_then_lose_race(df, partition_by):
        add, rows = orig_stage(df, partition_by)
        # a competing writer publishes the version this append will try
        # (both writers read the same stale snapshot — the classic race)
        import time

        t._publish(
            CommitInfo(
                version=stale_version + 1,
                timestamp_ms=int(time.time() * 1000),
                operation="WRITE",
            )
        )
        monkeypatch.setattr(t, "version", lambda: stale_version)
        return add, rows

    monkeypatch.setattr(t, "_stage_write", stage_then_lose_race)
    with pytest.raises(ConcurrentWriteError):
        t.append(_df(spark, [(2,)], "id long"))
    monkeypatch.undo()
    # the abandoned attempt's staged data files were deleted, not orphaned
    assert parquet_files() == before
    # and a clean retry converges
    t.append(_df(spark, [(2,)], "id long"))
    assert t.read().count() == 2


def test_delete_where_bad_predicate_raises(spark, lake):
    t = LakeTable(spark, lake + "/badpred")
    t.append(_df(spark, [(1, "a"), (2, "b")], "id long, name string"))
    # invalid expression (unknown function) must surface, not silently
    # report "0 files rewritten" success
    with pytest.raises(Exception):
        t.delete_where("no_such_function(id) = 1")
    assert t.read().count() == 2
    # a column absent from every write schema means no row can match:
    # that (and only that) is a clean no-op
    res = t.delete_where("ghost_column = 'x'")
    assert res["files_rewritten"] == 0
    assert t.read().count() == 2


# ---------------------------------------------------------------------------
# File-level min/max data skipping
# ---------------------------------------------------------------------------
def _four_range_files(spark, lake, name):
    t = LakeTable(spark, lake + "/" + name)
    for lo in (0, 100, 200, 300):
        t.append(
            _df(
                spark,
                [(lo + i, f"name-{lo + i}") for i in range(100)],
                "id long, name string",
            ).coalesce(1)
        )
    return t


def test_stats_recorded_in_commit_log(spark, lake):
    t = _four_range_files(spark, lake, "stats")
    snap = t._replay()
    assert len(snap.files) == 4
    for f in snap.files:
        st = snap.file_stats[f]
        assert st is not None and st["numRecords"] == 100
        assert "id" in st["minValues"] and "id" in st["maxValues"]
    ranges = sorted(
        (snap.file_stats[f]["minValues"]["id"], snap.file_stats[f]["maxValues"]["id"])
        for f in snap.files
    )
    assert ranges == [(0, 99), (100, 199), (200, 299), (300, 399)]


def test_point_read_scans_fewer_files(spark, lake):
    t = _four_range_files(spark, lake, "skip")
    pruned = t.read(predicate="id = 250")
    assert len(pruned.inputFiles()) == 1
    assert [r["id"] for r in pruned.collect()] == [250]
    # range predicate spanning two files
    two = t.read(predicate="id >= 150 AND id < 250")
    assert len(two.inputFiles()) == 2
    assert two.count() == 100
    # string stats prune too
    s = t.read(predicate="name = 'name-42'")
    assert len(s.inputFiles()) == 1 and s.count() == 1
    # unprunable predicate still returns exact results over all files
    full = t.read(predicate="id % 100 = 7")
    assert full.count() == 4


def test_delete_where_skips_files_by_stats(spark, lake):
    t = _four_range_files(spark, lake, "delskip")
    res = t.delete_where("id = 250")
    assert res["files_rewritten"] == 1
    assert t.read().count() == 399
    # pruning survives a checkpoint (10+ commits) and OPTIMIZE rewrites
    for _ in range(8):
        t.append(_df(spark, [(1000, "z")], "id long, name string").coalesce(1))
    assert t.version() >= 10
    snap = t._replay()
    assert any(snap.file_stats.get(f) for f in snap.files)
    pruned = t.read(predicate="id = 350")
    assert len(pruned.inputFiles()) == 1 and pruned.count() == 1


def test_pruning_is_conservative(spark, lake):
    from mongodb_cdc_delta_spark.sinks.table import (
        _parse_pruning_conjuncts,
        _stats_admit,
    )

    # OR / parens / functions disable pruning entirely
    assert _parse_pruning_conjuncts("id = 1 OR id = 2") == []
    assert _parse_pruning_conjuncts("(id = 1)") == []
    assert _parse_pruning_conjuncts("abs(id) = 1") == []
    assert _parse_pruning_conjuncts("id = 1 AND name = 'x'") == [
        ("id", "=", 1),
        ("name", "=", "x"),
    ]
    # missing stats always admit
    assert _stats_admit(None, "id", "=", 5)
    assert _stats_admit({"minValues": {}, "maxValues": {}}, "id", "=", 5)
    st = {"minValues": {"id": 10}, "maxValues": {"id": 20}}
    assert not _stats_admit(st, "id", "=", 5)
    assert _stats_admit(st, "id", "=", 15)
    assert not _stats_admit(st, "id", "<", 10)
    assert _stats_admit(st, "id", "<=", 10)
    assert not _stats_admit(st, "id", ">", 20)
    assert _stats_admit(st, "id", ">=", 20)
    # type mismatch (string literal vs numeric stats) admits
    assert _stats_admit(st, "id", "=", "5")


# ---------------------------------------------------------------------------
# OPTIMIZE ZORDER: multi-dimensional clustering
# ---------------------------------------------------------------------------
def test_zorder_multidim_file_skipping(spark, lake):
    t = LakeTable(spark, lake + "/z")
    rows = [(x, y) for x in range(64) for y in range(64)]
    t.append(_df(spark, rows, "x long, y long"))
    res = t.optimize(zorder_by=["x", "y"], target_file_rows=1024)
    snap = t._replay()
    assert len(snap.files) == 4  # 4096 rows / 1024
    assert t.read().count() == 4096
    # every file covers a bounded range in BOTH dimensions, so single-
    # dimension predicates prune on either axis (linear sort by (x, y)
    # would leave y spanning the full range in every file)
    dfy = t.read(predicate="y >= 0 AND y < 16")
    assert len(dfy.inputFiles()) <= 3  # boundary sampling can straddle
    assert dfy.count() == 64 * 16
    dfx = t.read(predicate="x >= 48")
    assert len(dfx.inputFiles()) <= 3
    assert dfx.count() == 16 * 64
    # point query on both dims: at most 2 files (range-partition boundary
    # sampling can straddle a quadrant edge; exact quadrants would give 1)
    pt = t.read(predicate="x = 10 AND y = 10")
    assert len(pt.inputFiles()) <= 2 and pt.count() == 1


def test_zorder_beats_linear_on_trailing_dim(spark, lake):
    rows = [(x, y) for x in range(64) for y in range(64)]
    lin = LakeTable(spark, lake + "/lin")
    lin.append(_df(spark, rows, "x long, y long"))
    lin.optimize(cluster_by=["x", "y"])
    # linear layout compacts to one file — re-split it into 4 by x ranges
    # is what cluster_by+multiple appends would give; the point: a y-only
    # predicate cannot prune a linear (x, y) sort, but prunes a z-order
    z = LakeTable(spark, lake + "/zc")
    z.append(_df(spark, rows, "x long, y long"))
    z.optimize(zorder_by=["x", "y"], target_file_rows=1024)
    zy = z.read(predicate="y = 5")
    assert len(zy.inputFiles()) <= 3  # boundary sampling can straddle
    assert zy.count() == 64


def test_zorder_validation(spark, lake):
    t = LakeTable(spark, lake + "/zv")
    t.append(_df(spark, [(1, "a")], "x long, s string"))
    with pytest.raises(ValueError):
        t.optimize(zorder_by=["s"])  # strings lose curve locality
    with pytest.raises(ValueError):
        t.optimize(cluster_by=["x"], zorder_by=["x"])
    # constant / single-value columns degrade gracefully
    res = t.optimize(zorder_by=["x"])
    assert t.read().count() == 1


def test_vacuum_sweeps_crash_orphans(spark, lake):
    import os
    import time as _time

    t = LakeTable(spark, lake + "/orph")
    t.append(_df(spark, [(1,)], "id long"))
    # simulate a writer that died after staging: a parquet file in the
    # table dir that no commit references
    orphan = os.path.join(t.root, "part-deadwriter-00000.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"PAR1 not really parquet")
    old = _time.time() - 10 * 3600
    os.utime(orphan, (old, old))
    # within retention: untouched (could be a concurrent writer staging)
    res = t.vacuum(retention_hours=24.0)
    assert res["orphans_deleted"] == 0 and os.path.exists(orphan)
    # past retention: swept
    res = t.vacuum(retention_hours=1.0)
    assert res["orphans_deleted"] == 1 and not os.path.exists(orphan)
    # referenced data untouched
    assert t.read().count() == 1


def test_clustering_report_and_advisor(spark, lake):
    t = LakeTable(spark, lake + "/adv")
    # id ranges disjoint per file; v spans the full range in every file
    for lo in (0, 100, 200, 300):
        rows = [(lo + i, i % 50) for i in range(100)]
        t.append(_df(spark, rows, "id long, v long").coalesce(1))
    rep = t.clustering_report()
    assert rep["id"]["mean_overlap"] == 0.0  # perfectly clustered
    assert rep["v"]["mean_overlap"] == 3.0  # every file overlaps all others
    assert t.suggest_clustering(top_n=1) == ["v"]
    # re-cluster on the advisor's suggestion: v becomes prunable
    t.optimize(zorder_by=t.suggest_clustering(top_n=1), target_file_rows=100)
    rep2 = t.clustering_report()
    assert rep2["v"]["mean_overlap"] < 3.0
    pruned = t.read(predicate="v = 7")
    assert len(pruned.inputFiles()) < len(t._replay().files)
    assert pruned.count() == 8  # 2 per original file


# ---------------------------------------------------------------------------
# Merge-on-read deletion vectors
# ---------------------------------------------------------------------------
def test_dv_delete_no_rewrite(spark, lake):
    t = LakeTable(spark, lake + "/dv")
    t.append(_df(spark, [(i, f"n{i}") for i in range(100)], "id long, name string").coalesce(1))
    files_before = t._replay().files
    res = t.delete_where("id = 7", deletion_vectors=True)
    assert res["rows_deleted"] == 1 and res["files_with_dv"] == 1
    # no data file rewritten: same physical files, rows subtracted at read
    assert t._replay().files == files_before
    assert t.read().count() == 99
    assert t.read().where("id = 7").count() == 0
    # second DV delete merges into the existing vector
    res2 = t.delete_where("id >= 90", deletion_vectors=True)
    assert res2["rows_deleted"] == 10
    assert t.read().count() == 89
    # deleting already-deleted rows is a no-op
    res3 = t.delete_where("id = 7", deletion_vectors=True)
    assert res3["rows_deleted"] == 0
    assert t.read().count() == 89


def test_dv_time_travel_and_txn(spark, lake):
    t = LakeTable(spark, lake + "/dvtt")
    t.append(_df(spark, [(i,) for i in range(10)], "id long").coalesce(1))
    t.delete_where("id < 3", deletion_vectors=True, txn=("del", 1))
    assert t.read().count() == 7
    assert t.read(version_as_of=0).count() == 10  # pre-delete snapshot
    # replayed txn is exactly-once
    r = t.delete_where("id < 3", deletion_vectors=True, txn=("del", 1))
    assert r["skipped"] and t.read().count() == 7


def test_optimize_compacts_deletion_vectors(spark, lake):
    t = LakeTable(spark, lake + "/dvopt")
    t.append(_df(spark, [(i,) for i in range(50)], "id long").coalesce(1))
    t.delete_where("id % 5 = 0", deletion_vectors=True)
    assert t.read().count() == 40
    assert t._replay().file_dvs  # vector present
    res = t.optimize()
    snap = t._replay()
    assert not snap.file_dvs  # applied + cleared
    assert t.read().count() == 40
    assert t.read().where("id % 5 = 0").count() == 0


def test_dv_survives_checkpoint(spark, lake):
    t = LakeTable(spark, lake + "/dvckpt")
    t.append(_df(spark, [(i,) for i in range(20)], "id long").coalesce(1))
    t.delete_where("id = 1", deletion_vectors=True)
    for i in range(10):  # cross the checkpoint interval
        t.append(_df(spark, [(100 + i,)], "id long").coalesce(1))
    assert t.version() >= 10
    assert t.read().count() == 29
    assert t.read().where("id = 1").count() == 0


def test_dv_then_cow_delete_consistent(spark, lake):
    t = LakeTable(spark, lake + "/dvcow")
    t.append(_df(spark, [(i,) for i in range(30)], "id long").coalesce(1))
    t.delete_where("id < 5", deletion_vectors=True)
    # copy-on-write delete reads through the DV, so the rewrite keeps both
    # deletions and drops the file's vector with the file
    t.delete_where("id >= 25")
    assert t.read().count() == 20
    assert not t._replay().file_dvs


def test_advisor_weights_by_observed_predicates(spark, lake):
    t = LakeTable(spark, lake + "/advw")
    # two equally-unclustered columns (both span the full range per file)
    for _ in range(3):
        rows = [(i % 50, i % 40) for i in range(100)]
        t.append(_df(spark, rows, "a long, b long").coalesce(1))
    rep = t.clustering_report()
    assert rep["a"]["mean_overlap"] == 2.0 and rep["b"]["mean_overlap"] == 2.0
    # the workload filters on b — the advisor should prefer it
    for _ in range(5):
        t.read(predicate="b = 3").count()
    assert t.suggest_clustering(top_n=1) == ["b"]
    # without workload weighting, ties resolve by overlap only
    assert set(t.suggest_clustering(top_n=2, weight_by_queries=False)) == {"a", "b"}


def test_pruned_read_always_equals_unpruned(spark, lake):
    """Exhaustive predicate sweep: for every operator and boundary value
    (file edges, in-range, out-of-range, string literals, AND-combos), a
    pruned read returns exactly the rows of an unpruned filtered read —
    data skipping is an optimization, never a semantics change."""
    t = LakeTable(spark, lake + "/sweep")
    for lo in (0, 100, 200, 300):
        rows = [(lo + i, f"s{lo + i:04d}", (lo + i) % 7) for i in range(100)]
        t.append(
            _df(spark, rows, "id long, name string, m long").coalesce(1)
        )
    base = t.read()
    preds = []
    for val in (0, 99, 100, 150, 399, 400, -5, 1000):
        for op in ("=", "<", "<=", ">", ">="):
            preds.append(f"id {op} {val}")
    preds += [
        "name = 's0150'",
        "name >= 's0350'",
        "name < 's0100'",
        "id >= 150 AND id < 250",
        "id > 50 AND id <= 120 AND m = 3",
        "id = 150 AND name = 's0150'",
        "id = 150 AND name = 'wrong'",
        "m = 3",           # unclustered column: stats admit everything
        "id % 100 = 7",    # unparseable for pruning: full scan, exact
        "id = 10 OR id = 310",  # OR disables pruning
    ]
    for pred in preds:
        expect = base.where(pred).count()
        got = t.read(predicate=pred).count()
        assert got == expect, f"{pred!r}: pruned {got} != unpruned {expect}"


# ---------------------------------------------------------------------------
# Partition evolution
# ---------------------------------------------------------------------------
def test_layout_change_on_append_refused(spark, lake):
    t = LakeTable(spark, lake + "/layout")
    t.append(
        _df(spark, [(1, "a"), (2, "b")], "id long, d string"),
        partition_by=["d"],
    )
    # silent mixed-layout data loss is refused loudly
    with pytest.raises(ValueError, match="partition layout change"):
        t.append(
            _df(spark, [(3, "c")], "id long, d string"), partition_by=[]
        )
    assert t.read().count() == 2


def test_repartition_table_atomic_rewrite(spark, lake):
    t = LakeTable(spark, lake + "/repart")
    t.append(
        _df(
            spark,
            [(i, f"d{i % 3}") for i in range(30)],
            "id long, d string",
        ),
        partition_by=[],
    )
    res = t.repartition_table(["d"])
    assert res["rows"] == 30 and not res["skipped"]
    assert t.read().count() == 30
    # new layout prunes as a real hive partition
    out = t.read().where(F.col("d") == "d1")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and out.count() == 10
    # appends follow the new layout; the old snapshot is still readable
    t.append(_df(spark, [(100, "d0")], "id long, d string"))
    assert t.read().count() == 31
    assert t.read(version_as_of=0).count() == 30
    # idempotent via txn; no-op when the layout already matches
    assert t.repartition_table(["d"])["skipped"]
    with pytest.raises(ValueError, match="not in schema"):
        t.repartition_table(["nope"])


def test_dv_read_plan_uses_broadcast_anti_join(spark, lake):
    t = LakeTable(spark, lake + "/dvplan")
    t.append(_df(spark, [(i,) for i in range(100)], "id long").coalesce(1))
    t.delete_where("id = 1", deletion_vectors=True)
    df = t.read()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # tombstone subtraction must be a broadcast anti-join, never a
    # sort-merge shuffle of the data side
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_dv_with_conflicting_column_names(spark, lake):
    """User columns named __path/__idx must survive a DV read untouched."""
    t = LakeTable(spark, lake + "/dvname")
    t.append(
        _df(
            spark,
            [(i, f"p{i}", i * 10) for i in range(20)],
            "id long, __path string, __idx long",
        ).coalesce(1)
    )
    t.delete_where("id = 3", deletion_vectors=True)
    rows = {r["id"]: (r["__path"], r["__idx"]) for r in t.read().collect()}
    assert len(rows) == 19 and 3 not in rows
    assert rows[5] == ("p5", 50)


def test_bloom_filter_property_applied(spark, lake):
    """`bloom.filter.columns` table property writes parquet bloom filters:
    random UUID-like keys get row-group point-lookup skipping that min/max
    stats cannot provide. Verified by the footer growth the bloom adds."""
    import os

    rows = [(f"{i:08x}-feed-beef", i) for i in range(5000)]

    plain = LakeTable(spark, lake + "/nobloom")
    plain.append(_df(spark, rows, "k string, v long").coalesce(1))

    bloomed = LakeTable(spark, lake + "/bloom")
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    bloomed.create_if_not_exists(
        StructType([StructField("k", StringType()), StructField("v", LongType())])
    )
    bloomed.set_properties({"bloom.filter.columns": "k"})
    bloomed.append(_df(spark, rows, "k string, v long").coalesce(1))

    def total_size(t):
        return sum(
            os.path.getsize(os.path.join(t.root, f)) for f in t._replay().files
        )

    assert total_size(bloomed) > total_size(plain)
    # reads (incl. point lookups) unchanged semantically
    got = bloomed.read(predicate="k = '00000abc-feed-beef'").collect()
    assert len(got) == 1 and got[0]["v"] == 0xABC


def test_metadata_only_count(spark, lake):
    t = LakeTable(spark, lake + "/cnt")
    t.append(_df(spark, [(i,) for i in range(500)], "id long"))
    t.append(_df(spark, [(i,) for i in range(100)], "id long"))
    assert t.count() == 600 == t.read().count()
    # DV rows subtract without a scan
    t.delete_where("id < 10", deletion_vectors=True)
    assert t.count() == t.read().count() == 580
    # time travel counts too
    assert t.count(version_as_of=0) == 500
    # copy-on-write delete keeps it consistent
    t.delete_where("id >= 95 AND id < 100")
    assert t.count() == t.read().count() == 570
    # a stats-less ACTIVE file (legacy commit) forces the scan fallback
    import json as _json
    import os

    log = sorted(
        f
        for f in os.listdir(os.path.join(t.root, "_log"))
        if f.endswith(".json") and f[:-5].isdigit()
    )
    stripped = False
    for name in reversed(log):  # newest first: their adds are active
        p = os.path.join(t.root, "_log", name)
        c = _json.load(open(p))
        if c.get("add"):
            for a in c["add"]:
                a.pop("stats", None)
            _json.dump(c, open(p, "w"))
            stripped = True
            break
    assert stripped
    assert t.count() == t.read().count() == 570


class TestMetadataMinMax:
    def test_min_max_from_stats_no_scan(self, spark, lake):
        t = LakeTable(spark, lake + "/mm")
        t.append(_df(spark, [(5, "e"), (1, "a")], "id long, v string"))
        t.append(_df(spark, [(9, "z"), (3, "c")], "id long, v string"))
        assert t.min_max("id") == (1, 9)
        assert t.min_max("v") == ("a", "z")
        # agrees with a real scan
        row = t.read().agg(F.min("id"), F.max("id")).first()
        assert (row[0], row[1]) == (1, 9)

    def test_min_max_falls_back_under_deletion_vectors(self, spark, lake):
        t = LakeTable(spark, lake + "/mmdv")
        t.append(_df(spark, [(i,) for i in range(10)], "id long"))
        t.delete_where("id = 9", deletion_vectors=True)
        # footer says max=9 but row 9 is tombstoned: must report 8
        assert t.min_max("id") == (0, 8)

    def test_min_max_time_travel_and_missing_column(self, spark, lake):
        t = LakeTable(spark, lake + "/mmtt")
        t.append(_df(spark, [(1,)], "id long"))
        v0 = t.version()
        t.append(_df(spark, [(100,)], "id long"))
        assert t.min_max("id", version_as_of=v0) == (1, 1)
        assert t.min_max("id") == (1, 100)
        import pytest as _pt

        with _pt.raises(ValueError, match="no such column"):
            t.min_max("nope")


def test_dv_wide_delete_collects_per_file_not_per_row(spark, lake, monkeypatch):
    # r7 (r6 verdict finding #2): a wide predicate DELETE must never
    # funnel one driver Row per deleted row through collect() — the
    # positions aggregate per file executor-side and the driver sees
    # one row per touched file. 4 files x 2,000 rows, delete 75%.
    t = LakeTable(spark, lake + "/dvwide")
    rows = [(i, i % 4) for i in range(8000)]
    t.append(
        _df(spark, rows, "id long, bucket long").repartition(4, "bucket")
    )
    n_files = len(t._replay().files)
    assert n_files >= 2

    # Spark 4: the session returns pyspark.sql.classic DataFrames whose
    # collect() overrides the base class — patch the concrete class
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover - older pyspark
        from pyspark.sql import DataFrame

    collected_sizes: list[int] = []
    real_collect = DataFrame.collect

    def spy_collect(self):
        out = real_collect(self)
        collected_sizes.append(len(out))
        return out

    monkeypatch.setattr(DataFrame, "collect", spy_collect)
    res = t.delete_where("id % 4 != 0", deletion_vectors=True)
    monkeypatch.undo()

    assert res["rows_deleted"] == 6000
    assert collected_sizes, "DV path must go through collect()"
    assert max(collected_sizes) <= n_files, (
        f"driver collected {max(collected_sizes)} rows for "
        f"{n_files} files — positions are not aggregating per file"
    )
    assert t.read().count() == 2000
    assert t.read().where("id % 4 != 0").count() == 0
    # merge with an existing vector still exact after the rewrite
    res2 = t.delete_where("id % 8 = 0", deletion_vectors=True)
    assert res2["rows_deleted"] == 1000
    assert t.read().count() == 1000
