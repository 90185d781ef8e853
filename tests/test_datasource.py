"""Python DataSource connector: spark.read.format('laketable') batch +
append-tail streaming source."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.sinks import LakeTable
from mongodb_cdc_delta_spark.sinks.datasource import (

    LakeTableBatchReader,
    register_lake_source,
)

# deep storage-layer e2e: excluded from the fast lane (see pytest.ini)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_lake_source(spark)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_batch_read_matches_native(spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable(spark, root)
    t.append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 5.0), (3, "c", 1.0)],
            "id long, v string, x double",
        )
    )
    t.append(
        spark.createDataFrame([(4, "d", 7.0)], "id long, v string, x double")
    )
    got = spark.read.format("laketable").option("path", root).load()
    assert _rows(got) == _rows(t.read())


def test_batch_read_respects_dv_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t2")
    t = LakeTable(spark, root)
    t.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, v string"
        )
    )
    t.delete_where("id >= 7", deletion_vectors=True)
    got = spark.read.format("laketable").option("path", root).load()
    assert _rows(got) == _rows(t.read())
    assert got.count() == 7
    # time travel to the pre-delete version
    v0 = spark.read.format("laketable").option("path", root).option(
        "version_as_of", "0"
    ).load()
    assert v0.count() == 10


def test_stats_skip_files_but_never_rows(spark, tmp_path):
    root = str(tmp_path / "t3")
    t = LakeTable(spark, root)
    # two files with disjoint id ranges → stats can skip one whole file
    t.append(
        spark.createDataFrame(
            [(i, "lo") for i in range(5)], "id long, tag string"
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [(i, "hi") for i in range(100, 105)], "id long, tag string"
        ).coalesce(1)
    )

    reader = LakeTableBatchReader({"path": root}, t.schema())
    from pyspark.sql.datasource import GreaterThan

    reader._filters = [GreaterThan(("id",), 50)]
    assert len(reader.partitions()) == 1  # lo file skipped via stats

    got = (
        spark.read.format("laketable")
        .option("path", root)
        .load()
        .where("id > 50")
    )
    assert got.count() == 5
    assert {r.tag for r in got.collect()} == {"hi"}


def test_streaming_tail_picks_up_appends(spark, tmp_path):
    root = str(tmp_path / "t4")
    ckpt = str(tmp_path / "ckpt")
    t = LakeTable(spark, root)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))

    def drain():
        collected = []
        q = (
            spark.readStream.format("laketable")
            .option("path", root)
            .load()
            .writeStream.foreachBatch(
                lambda df, _b: collected.extend(df.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted((r.id, r.v) for r in collected)

    assert drain() == [(1, "a"), (2, "b")]
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    # second run resumes from the checkpointed version offset: only new rows
    assert drain() == [(3, "c")]
    # caught up: nothing
    assert drain() == []


def test_streaming_rejects_rewrite_commits(spark, tmp_path):
    root = str(tmp_path / "t5")
    t = LakeTable(spark, root)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    t.update_where("id = 2", {"v": "'B'"})  # COW rewrite

    q = (
        spark.readStream.format("laketable")
        .option("path", root)
        .load()
        .writeStream.format("memory")
        .queryName("lt_reject")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="append-only"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()


def test_streaming_watermark_window_through_source(spark, tmp_path):
    """Event-time semantics compose through the custom source: watermarked
    tumbling-window counts over rows streamed from the lake table."""
    import datetime as dt

    root = str(tmp_path / "t6")
    ckpt = str(tmp_path / "ckpt6")
    t = LakeTable(spark, root)

    def ts(minute):
        return dt.datetime(2024, 1, 1, 0, minute, 0)

    t.append(
        spark.createDataFrame(
            [(1, ts(1)), (2, ts(2)), (3, ts(11)), (4, ts(12)), (5, ts(21))],
            "id long, ts timestamp",
        )
    )
    collected = []
    q = (
        spark.readStream.format("laketable")
        .option("path", root)
        .load()
        .withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("start"), "n")
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, _b: collected.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.start.minute: r.n for r in collected}
    assert got == {0: 2, 10: 2, 20: 1}
