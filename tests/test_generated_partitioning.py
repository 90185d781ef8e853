"""Generated-column partitioning: partition by date(ts)/year(ts) without the
writer materializing the column, and prune partitions from predicates on the
SOURCE column (Delta's generated-column partition pruning). Also covers the
new partition-dir pruning for explicit partition-column predicates."""

from __future__ import annotations

from mongodb_cdc_delta_spark.sinks import LakeTable
from mongodb_cdc_delta_spark.sinks.table import (
    _partition_admit,
    _partition_values,
)
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("ts", TimestampType()),
    ]
)


import pytest  # noqa: E402  (fast-tier marker below)

# r11 fast-tier: moved to the slow (full-battery) lane in r11 so the default fast tier stays <15 min; this surface remains covered by the full battery and by the oracle-parity/plan-gate suites that stay in the fast lane
pytestmark = pytest.mark.slow

def _day_df(spark, day: str, ids):
    return spark.createDataFrame(
        [(i, f"2024-01-{day} 0{i % 10}:30:00") for i in ids],
        "id long, ts string",
    ).select("id", F.to_timestamp("ts").alias("ts"))


def _make_table(spark, tmp_path, generated):
    t = LakeTable(spark, str(tmp_path / "t"))
    pcol = list(generated)[0]
    t.create_if_not_exists(SCHEMA, partition_by=[pcol], generated=generated)
    for day in ("01", "02", "03"):
        t.append(_day_df(spark, day, range(5)))
    return t


def test_generated_column_materialized_on_append(spark, tmp_path):
    t = _make_table(spark, tmp_path, {"p_date": "date(ts)"})
    df = t.read()
    assert set(df.columns) == {"id", "ts", "p_date"}
    days = {str(r["p_date"]) for r in df.select("p_date").distinct().collect()}
    assert days == {"2024-01-01", "2024-01-02", "2024-01-03"}
    # hive layout on disk
    assert any("p_date=2024-01-02" in f for f in t._replay().files)


def test_source_predicate_prunes_date_partitions(spark, tmp_path):
    t = _make_table(spark, tmp_path, {"p_date": "date(ts)"})
    full = len(t.read().inputFiles())
    pruned = t.read(predicate="ts >= '2024-01-03 00:00:00'")
    assert len(pruned.inputFiles()) < full
    assert all("p_date=2024-01-03" in f for f in pruned.inputFiles())
    assert pruned.count() == 5  # pruning never drops matching rows


def test_source_equality_maps_to_partition_equality(spark, tmp_path):
    t = _make_table(spark, tmp_path, {"p_date": "date(ts)"})
    pruned = t.read(predicate="ts = '2024-01-02 01:30:00'")
    assert all("p_date=2024-01-02" in f for f in pruned.inputFiles())
    assert pruned.count() == 1


def test_year_generator_prunes(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "y"))
    t.create_if_not_exists(
        SCHEMA, partition_by=["p_year"], generated={"p_year": "year(ts)"}
    )
    for y in ("2023", "2024"):
        t.append(
            spark.createDataFrame(
                [(1, f"{y}-06-01 12:00:00")], "id long, ts string"
            ).select("id", F.to_timestamp("ts").alias("ts"))
        )
    pruned = t.read(predicate="ts >= '2024-01-01 00:00:00'")
    assert all("p_year=2024" in f for f in pruned.inputFiles())
    assert pruned.count() == 1


def test_explicit_partition_predicate_prunes_dirs(spark, tmp_path):
    # no generator needed: predicates naming the partition column itself
    # prune via the hive path (footer stats never cover partition columns)
    t = _make_table(spark, tmp_path, {"p_date": "date(ts)"})
    pruned = t.read(predicate="p_date = '2024-01-02'")
    assert all("p_date=2024-01-02" in f for f in pruned.inputFiles())
    assert pruned.count() == 5


def test_pruned_results_equal_unpruned(spark, tmp_path):
    t = _make_table(spark, tmp_path, {"p_date": "date(ts)"})
    for pred in (
        "ts >= '2024-01-02 00:00:00'",
        "ts > '2024-01-02 03:30:00'",
        "ts <= '2024-01-01 23:59:59'",
        "ts < '2024-01-03 00:00:00' AND ts >= '2024-01-02 00:00:00'",
        "ts = '2024-01-01 01:30:00'",
    ):
        got = sorted(
            (r["id"], str(r["ts"])) for r in t.read(predicate=pred).collect()
        )
        want = sorted(
            (r["id"], str(r["ts"]))
            for r in t.read().where(pred).collect()
        )
        assert got == want, pred


def test_delete_through_generated_partition(spark, tmp_path):
    t = _make_table(spark, tmp_path, {"p_date": "date(ts)"})
    res = t.delete_where("ts >= '2024-01-03 00:00:00'")
    assert t.read().count() == 10
    assert t.read(predicate="ts >= '2024-01-03 00:00:00'").count() == 0
    assert res["files_rewritten"] >= 1


def test_partition_value_helpers(spark):
    assert _partition_values("p_date=2024-01-02/part-0.parquet") == {
        "p_date": "2024-01-02"
    }
    assert _partition_values("part-0.parquet") == {}
    # int coercion
    assert _partition_admit("p_year=2024/f.parquet", "p_year", "=", 2024)
    assert not _partition_admit("p_year=2024/f.parquet", "p_year", "<", 2024)
    # unknown column admits
    assert _partition_admit("p_year=2024/f.parquet", "other", "=", 1)
