"""Policy-driven auto-maintenance over the commit log (no data scans)."""

from __future__ import annotations

from mongodb_cdc_delta_spark.sinks import LakeTable
from mongodb_cdc_delta_spark.sinks.maintenance import (
    auto_maintain,
    maintenance_plan,
)


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
