"""Scheduled maintenance loop: cron-driven MV refresh off the change feed
plus policy table maintenance, with misfire coalescing and failure
isolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.sinks import LakeTable
from mongodb_cdc_delta_spark.streaming.aggregates import IncrementalAggregate
from mongodb_cdc_delta_spark.streaming.maintenance_loop import (
    MaintenanceJob,
    MaintenanceLoop,
)

import pytest

# deep storage-layer e2e: excluded from the fast lane (see pytest.ini)
pytestmark = pytest.mark.slow

T0 = 1_700_000_000  # fixed epoch; minute-aligned enough for cron math


def _mk(spark, tmp_path):
    src = LakeTable(spark, str(tmp_path / "src"))
    mv = IncrementalAggregate(
        LakeTable(spark, str(tmp_path / "mv")), ["user"], {"total": "amount"}
    )
    loop = MaintenanceLoop(clock=lambda: T0)
    return src, mv, loop


def _mv_state(mv):
    return {
        r["user"]: (r["n_rows"], r["total"]) for r in mv.read().collect()
    }


def test_mv_refresh_tracks_table_mutations(spark, tmp_path):
    src, mv, loop = _mk(spark, tmp_path)
    loop.add_mv_refresh("mv", src, mv, cron="*/5 * * * *")

    src.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "a", 5.0), (3, "b", 1.0)],
            "id long, user string, amount double",
        )
    )
    acts = loop.tick(now=T0 + 301)
    assert [a["action"] for a in acts] == ["ran"]
    assert _mv_state(mv) == {"a": (2, 15.0), "b": (1, 1.0)}

    # further mutations: append + delete fold incrementally
    src.append(
        spark.createDataFrame(
            [(4, "a", 2.0)], "id long, user string, amount double"
        )
    )
    src.delete_where("id = 3")
    loop.tick(now=T0 + 601)
    assert _mv_state(mv) == {"a": (3, 17.0), "b": (0, 0.0)}

    # caught up: tick runs but processes zero versions
    acts = loop.tick(now=T0 + 901)
    assert acts[0]["result"]["versions_processed"] == 0


def test_cron_gating_and_misfire_coalescing(spark, tmp_path):
    src, mv, loop = _mk(spark, tmp_path)
    loop.add_mv_refresh("mv", src, mv, cron="*/5 * * * *")
    src.append(
        spark.createDataFrame(
            [(1, "a", 1.0)], "id long, user string, amount double"
        )
    )
    # before the first matching minute: nothing fires
    assert loop.tick(now=T0 + 10) == []
    # three missed fires coalesce into ONE run
    acts = loop.tick(now=T0 + 3 * 300 + 1)
    assert len(acts) == 1
    assert loop.jobs["mv"].runs == 1
    assert _mv_state(mv) == {"a": (1, 1.0)}


def test_failures_are_isolated_and_counted(spark, tmp_path):
    src, mv, loop = _mk(spark, tmp_path)

    def boom() -> dict:
        raise RuntimeError("maintenance exploded")

    loop.add(MaintenanceJob("bad", "* * * * *", boom))
    loop.add_mv_refresh("mv", src, mv, cron="* * * * *")
    src.append(
        spark.createDataFrame(
            [(1, "a", 1.0)], "id long, user string, amount double"
        )
    )
    acts = loop.tick(now=T0 + 61)
    by_id = {a["job_id"]: a for a in acts}
    assert by_id["bad"]["action"] == "failed"
    assert "maintenance exploded" in by_id["bad"]["error"]
    # the failing job did not stop the MV refresh
    assert by_id["mv"]["action"] == "ran"
    assert loop.jobs["bad"].failures == 1
    st = {s["job_id"]: s for s in loop.status()}
    assert st["bad"]["last_error"] is not None


def test_table_maintenance_job_compacts_small_files(spark, tmp_path):
    src = LakeTable(spark, str(tmp_path / "t"))
    for i in range(9):  # 9 tiny files → small-file threshold (8) trips
        src.append(
            spark.createDataFrame([(i, "x")], "id long, v string").coalesce(1)
        )
    loop = MaintenanceLoop(clock=lambda: T0)
    loop.add_table_maintenance(
        "maint", src, cron="* * * * *", run_vacuum=False,
        auto_recluster=False,
    )
    acts = loop.tick(now=T0 + 61)
    assert acts[0]["action"] == "ran"
    assert acts[0]["result"]["plan"]["optimize"] is True
    assert "optimize" in acts[0]["result"]  # the rewrite actually ran
    # data intact after compaction
    assert src.read().count() == 9


def test_delta_export_job_keeps_external_surface_fresh(spark, tmp_path):
    # first fire = full export; later fires append one Delta commit with
    # only the changed files; an unchanged tick is a recorded no-op
    from mongodb_cdc_delta_spark.sinks.delta_export import replay_delta_log

    src = LakeTable(spark, str(tmp_path / "src"))
    src.append(
        spark.range(10).select(F.col("id"), F.lit("a").alias("v")),
        partition_by=[],
    )
    dest = str(tmp_path / "delta")
    clock = {"t": T0}
    loop = MaintenanceLoop(clock=lambda: clock["t"])
    loop.add_delta_export("export", src, dest, cron="* * * * *")

    clock["t"] = T0 + 60
    [a1] = loop.tick()
    assert a1["action"] == "ran" and a1["result"]["delta_version"] == 0
    assert replay_delta_log(dest)["version"] == 0

    # no table change → sync no-ops, no new Delta commit
    clock["t"] = T0 + 120
    [a2] = loop.tick()
    assert a2["result"]["noop"] is True
    assert replay_delta_log(dest)["version"] == 0

    # table advances → exactly one new Delta commit with only new files
    src.append(spark.range(10, 15).select(F.col("id"), F.lit("b").alias("v")))
    clock["t"] = T0 + 180
    [a3] = loop.tick()
    assert a3["result"]["noop"] is False and a3["result"]["removed"] == 0
    state = replay_delta_log(dest)
    assert state["version"] == 1
    assert state["txns"]["lake-export"] == src.version()
