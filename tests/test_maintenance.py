"""Policy-driven auto-maintenance over the commit log (no data scans)."""

from __future__ import annotations

import pytest

from mongodb_cdc_delta_spark.sinks import LakeTable
from mongodb_cdc_delta_spark.sinks.maintenance import (
    auto_maintain,
    maintenance_plan,
)

# deep storage-layer e2e: excluded from the fast lane (see pytest.ini)
pytestmark = pytest.mark.slow


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_small_file_accumulation_triggers_compaction(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    for i in range(9):  # 9 tiny files > default count threshold of 8
        t.append(_df(spark, [(i,)], "id long").coalesce(1))
    plan = maintenance_plan(t)
    assert plan["optimize"] and plan["partitions"] == ["."]
    res = auto_maintain(t, retention_hours=0.0)
    assert res["optimize"]["partitions_compacted"] == 1
    assert t.file_count() == 1
    assert res["vacuum"]["files_deleted"] >= 9
    assert t.read().count() == 9
    # healthy table: nothing further to do
    assert not maintenance_plan(t)["optimize"]


def test_auto_maintain_binpacks_with_plan_threshold(spark, tmp_path):
    """auto_maintain passes its small_file_bytes to optimize, so the act
    matches the diagnosis: the big file the plan did NOT count as small
    is not rewritten (per-tick cost tracks new data, not table size)."""
    import os

    t = LakeTable(spark, str(tmp_path / "bp"))
    t.append(_df(spark, [(i,) for i in range(50_000)], "id long").coalesce(1))
    big = t._replay().files[0]
    big_bytes = os.path.getsize(os.path.join(t.root, big))
    for i in range(9):
        t.append(_df(spark, [(100_000 + i,)], "id long").coalesce(1))
    res = auto_maintain(
        t,
        small_file_bytes=big_bytes,  # big file is not "small"
        run_vacuum=False,
        auto_recluster=False,
    )
    assert res["optimize"]["rows_rewritten"] == 9
    assert big in t._replay().files
    assert t.file_count() == 2
    assert t.read().count() == 50_009


def test_dv_density_triggers_rewrite(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "dv"))
    t.append(_df(spark, [(i,) for i in range(100)], "id long").coalesce(1))
    t.delete_where("id < 20", deletion_vectors=True)  # 20% dead rows
    plan = maintenance_plan(t)
    assert plan["dv_rows"] == 20 and plan["dv_share"] >= 0.10
    assert plan["optimize"]
    auto_maintain(t, run_vacuum=False)
    snap = t._replay()
    assert not snap.file_dvs  # vectors applied + cleared
    assert t.read().count() == 80
    # below threshold: a couple of tombstones don't justify a rewrite
    t.delete_where("id = 50", deletion_vectors=True)
    assert not maintenance_plan(t)["optimize"]


def test_auto_recluster_follows_query_predicates(spark, tmp_path):
    """Interleaved appends make every file's [min,max] on `k` span the whole
    domain; once predicate reads show the workload filters on k,
    auto_maintain upgrades compaction to a clustering rewrite and file
    overlap on k collapses."""
    from mongodb_cdc_delta_spark.sinks.maintenance import recluster_candidates

    t = LakeTable(spark, str(tmp_path / "rc"))
    for i in range(4):  # each file holds k in {0..99}: total overlap
        t.append(
            _df(spark, [(k, i) for k in range(100)], "k long, fid long")
            .coalesce(1)
        )
    assert t.clustering_report()["k"]["mean_overlap"] == 3.0
    # no workload history yet → no recluster, even though layout is bad
    assert recluster_candidates(t) == []
    for _ in range(3):
        t.read(predicate="k = 17").count()
    assert recluster_candidates(t) == ["k"]
    res = auto_maintain(t, run_vacuum=False)
    assert res["plan"]["recluster_by"] == ["k"]
    assert "optimize" in res
    assert t.read().count() == 400
    # rewritten layout: k ranges now near-disjoint across files
    rep = t.clustering_report()
    assert "k" not in rep or rep["k"]["mean_overlap"] < 1.0


def test_auto_recluster_string_column_uses_linear_sort(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "rcs"))
    keys = [f"k{i:03d}" for i in range(100)]
    for i in range(4):
        t.append(
            _df(spark, [(k, i) for k in keys], "k string, fid long")
            .coalesce(1)
        )
    for _ in range(3):
        t.read(predicate="k = 'k017'").count()
    res = auto_maintain(t, run_vacuum=False)
    assert res["plan"]["recluster_by"] == ["k"]
    assert t.read().count() == 400
    rep = t.clustering_report()
    assert "k" not in rep or rep["k"]["mean_overlap"] < 1.0
