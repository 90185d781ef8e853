"""Oracle-checkable reconciliation queries.

The engine proper (engine.py) uses xxhash64 checksums — fast, JVM-side, but
not reproducible in DuckDB. For the oracle gate we run the same *plans* with
a portable polynomial hash so both engines compute identical checksums.

Scenario (FIXTURES.md §8): source = `events`; target = events with
- rows where event_id % 97 == 0 dropped        (missing_in_target)
- rows where event_id % 89 == 0 get value+1.0  (field_mismatch)
- rows where event_id % 101 == 0 duplicated with shifted ids (extra_in_target)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import load, register
from .engine import count_compare, record_diff

_TARGET_SQL = """
    SELECT event_id, user_id, event_type,
           CASE WHEN event_id % 89 = 0 THEN value + 1.0 ELSE value END AS value
    FROM events WHERE event_id % 97 <> 0
    UNION ALL
    SELECT event_id + 100000000 AS event_id, user_id, event_type, value
    FROM events WHERE event_id % 101 = 0
"""


def _target(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    kept = e.where(F.col("event_id") % 97 != 0).withColumn(
        "value",
        F.when(F.col("event_id") % 89 == 0, F.col("value") + 1.0).otherwise(
            F.col("value")
        ),
    )
    extras = e.where(F.col("event_id") % 101 == 0).withColumn(
        "event_id", F.col("event_id") + 100000000
    )
    return kept.unionByName(extras)


def _source(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "events").select(
        "event_id", "user_id", "event_type", "value"
    )


@register(
    "reconcile_counts",
    oracle=f"""
    WITH target AS ({_TARGET_SQL}),
    s AS (SELECT event_id % 16 AS bucket, count(*) AS src_count
          FROM events GROUP BY 1),
    t AS (SELECT event_id % 16 AS bucket, count(*) AS tgt_count
          FROM target GROUP BY 1)
    SELECT coalesce(s.bucket, t.bucket) AS bucket,
           coalesce(src_count, 0) AS src_count,
           coalesce(tgt_count, 0) AS tgt_count,
           coalesce(src_count, 0) - coalesce(tgt_count, 0) AS count_diff
    FROM s FULL OUTER JOIN t ON s.bucket = t.bucket
    """,
    description="reconciliation C1: per-bucket count compare source vs target "
    "(one partial-aggregated scan per side, no wide shuffle)",
    tags=("reconcile",),
)
def reconcile_counts(spark: SparkSession, sf: str) -> DataFrame:
    # same plan as engine.count_compare but with the portable bucket fn
    s = (
        _source(spark, sf)
        .groupBy((F.col("event_id") % 16).alias("bucket"))
        .agg(F.count("*").alias("src_count"))
    )
    t = (
        _target(spark, sf)
        .groupBy((F.col("event_id") % 16).alias("bucket"))
        .agg(F.count("*").alias("tgt_count"))
    )
    return (
        s.join(t, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("src_count", F.lit(0)).alias("src_count"),
            F.coalesce("tgt_count", F.lit(0)).alias("tgt_count"),
        )
        .withColumn("count_diff", F.col("src_count") - F.col("tgt_count"))
    )


# portable per-row "hash": exact integer arithmetic, identical in any engine
_ROWHASH_SQL = "event_id * 1000003 + user_id * 31 + length(event_type)"


def _rowhash_col():
    return (
        F.col("event_id") * 1000003
        + F.col("user_id") * 31
        + F.length("event_type")
    )


@register(
    "reconcile_hash_buckets",
    oracle=f"""
    WITH target AS ({_TARGET_SQL}),
    s AS (SELECT event_id % 16 AS bucket,
                 CAST(sum({_ROWHASH_SQL}) AS BIGINT) AS src_hash,
                 count(*) AS src_count
          FROM events GROUP BY 1),
    t AS (SELECT event_id % 16 AS bucket,
                 CAST(sum({_ROWHASH_SQL}) AS BIGINT) AS tgt_hash,
                 count(*) AS tgt_count
          FROM target GROUP BY 1)
    SELECT s.bucket,
           src_hash, tgt_hash,
           (src_hash = tgt_hash AND src_count = tgt_count) AS match
    FROM s JOIN t ON s.bucket = t.bucket
    """,
    description="reconciliation C3: order-insensitive per-bucket checksum "
    "(SUM of row hashes — commutative, so map-side combinable)",
    tags=("reconcile",),
)
def reconcile_hash_buckets(spark: SparkSession, sf: str) -> DataFrame:
    def side(df: DataFrame, label: str) -> DataFrame:
        return df.groupBy((F.col("event_id") % 16).alias("bucket")).agg(
            F.sum(_rowhash_col()).alias(f"{label}_hash"),
            F.count("*").alias(f"{label}_count"),
        )

    return (
        side(_source(spark, sf), "src")
        .join(side(_target(spark, sf), "tgt"), "bucket", "inner")
        .select(
            "bucket",
            "src_hash",
            "tgt_hash",
            (
                (F.col("src_hash") == F.col("tgt_hash"))
                & (F.col("src_count") == F.col("tgt_count"))
            ).alias("match"),
        )
    )


@register(
    "reconcile_record_diff",
    oracle=f"""
    WITH target AS ({_TARGET_SQL})
    SELECT coalesce(e.event_id, t.event_id) AS event_id,
           CASE WHEN t.event_id IS NULL THEN 'missing_in_target'
                WHEN e.event_id IS NULL THEN 'extra_in_target'
                WHEN e.value <> t.value THEN 'field_mismatch'
                ELSE 'match' END AS status
    FROM events e FULL OUTER JOIN target t ON e.event_id = t.event_id
    WHERE CASE WHEN t.event_id IS NULL THEN 'missing_in_target'
               WHEN e.event_id IS NULL THEN 'extra_in_target'
               WHEN e.value <> t.value THEN 'field_mismatch'
               ELSE 'match' END <> 'match'
    """,
    description="reconciliation C4: record-level diff via full outer join — "
    "classifies missing/extra/mismatch (uses engine.record_diff)",
    tags=("reconcile", "join"),
)
def reconcile_record_diff(spark: SparkSession, sf: str) -> DataFrame:
    diff = record_diff(
        _source(spark, sf),
        _target(spark, sf),
        key="event_id",
        compare_cols=["value"],
    )
    # the engine's row-hash catches any column drift; the oracle compares the
    # single mutated column directly — same classification on this scenario
    return diff.select("event_id", "status")
