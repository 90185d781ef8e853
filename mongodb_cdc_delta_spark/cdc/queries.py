"""Relational formulations of the CDC pipeline's core semantics, runnable on
the driver's `events` table so they are oracle-checkable.

The streaming pipeline applies these same column expressions inside
foreachBatch (see cdc/transform.py); registering them here proves the
semantics against DuckDB independently of Kafka plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries import load, register

# event_type → CDC operation class, mirroring the reference's op mapping
# (reference: delta-writer/src/consumer/event_handler.py:102-124 —
# c/r→insert, u→update, d→delete, unknown→dropped)
_OP_CASE_SQL = """
    CASE WHEN event_type IN ('signup') THEN 'insert'
         WHEN event_type IN ('click', 'view', 'purchase') THEN 'update'
         WHEN event_type = 'error' THEN 'delete'
         ELSE NULL END
"""


def _op_col():
    return (
        F.when(F.col("event_type").isin("signup"), F.lit("insert"))
        .when(F.col("event_type").isin("click", "view", "purchase"), F.lit("update"))
        .when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit(None))
    )


@register(
    "cdc_op_classify",
    oracle=f"""
    SELECT {_OP_CASE_SQL} AS _cdc_operation, count(*) AS n
    FROM events
    WHERE {_OP_CASE_SQL} IS NOT NULL
    GROUP BY 1
    """,
    description="operation classifier (P2): op→insert/update/delete, "
    "unknown ops dropped",
    tags=("cdc",),
)
def cdc_op_classify(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .withColumn("_cdc_operation", _op_col())
        .where(F.col("_cdc_operation").isNotNull())
        .groupBy("_cdc_operation")
        .agg(F.count("*").alias("n"))
    )


@register(
    "cdc_metadata_projection",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d') AS _ingestion_date,
           epoch_us(ts) // 1000000 AS _cdc_timestamp_s,
           'events' AS _source_collection
    FROM events WHERE event_id < 1000
    """,
    description="CDC metadata projection (P5): _ingestion_date partition key "
    "+ epoch-second _cdc_timestamp, as pure column expressions",
    tags=("cdc",),
)
def cdc_metadata_projection(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .where(F.col("event_id") < 1000)
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd").alias("_ingestion_date"),
            F.floor(F.unix_micros("ts") / 1_000_000).alias("_cdc_timestamp_s"),
            F.lit("events").alias("_source_collection"),
        )
    )


@register(
    "cdc_latest_state",
    oracle="""
    SELECT user_id, event_id, event_type, value FROM (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
    description="current-state materialization from an append log (C8): "
    "latest row per key via row_number — the standard Spark CDC compaction",
    tags=("cdc", "window"),
)
def cdc_latest_state(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        load(spark, sf, "events")
        .select(
            "user_id",
            "event_id",
            "event_type",
            "value",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "cdc_stale_split",
    oracle="""
    SELECT CASE WHEN ts < TIMESTAMP '2024-01-24 00:00:00' - INTERVAL 7 DAY
                THEN 'stale_event' ELSE 'fresh' END AS status,
           count(*) AS n
    FROM events GROUP BY 1
    """,
    description="stale-event policy (P8): events older than 7 days vs a "
    "reference 'now' are DLQ-flagged stale_event (spec FR-024)",
    tags=("cdc", "dlq"),
)
def cdc_stale_split(spark: SparkSession, sf: str) -> DataFrame:
    # fixed reference instant (2024-01-24) keeps the query deterministic;
    # the streaming path uses current_timestamp() instead.
    cutoff = F.to_timestamp(F.lit("2024-01-24 00:00:00")) - F.expr(
        "INTERVAL 7 DAYS"
    )
    return (
        load(spark, sf, "events")
        .select(
            F.when(F.col("ts") < cutoff, F.lit("stale_event"))
            .otherwise(F.lit("fresh"))
            .alias("status")
        )
        .groupBy("status")
        .agg(F.count("*").alias("n"))
    )


@register(
    "cdc_type_drift_report",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN json_extract_string(props, '$.k')
                         IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS k_wire_nonnull,
           CAST(sum(CASE WHEN json_extract_string(props, '$.k')
                              IS NOT NULL
                          AND NOT regexp_matches(
                                 json_extract_string(props, '$.k'),
                                 '^-?[0-9]+$')
                         THEN 1 ELSE 0 END) AS BIGINT) AS k_type_drift,
           CAST(sum(CASE WHEN json_extract_string(props, '$.u')
                         IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS u_missing
    FROM events
    GROUP BY event_type
    """,
    description="the LOCKED-merge-mode observability query (ADVICE r6): "
    "against a pinned envelope schema {k: BIGINT, u: VARCHAR}, per "
    "collection (event_type), the rows whose wire value for a pinned "
    "field is present but would silently parse to NULL under the "
    "pinned type (value-level type drift — the data loss LOCKED mode "
    "otherwise ships without a signal) and the rows missing a pinned "
    "field entirely. Drift detection compares the RAW wire token "
    "against the pinned type's full lexical form (anchored "
    "'^-?[0-9]+$' — r7 ADVICE: catches in-character-class garbage "
    "like '1-2', '-', '--3'), not a parse result, so the count is "
    "deterministic cross-engine; out-of-int64-range digit strings "
    "are lexically valid and NOT counted here, so this approximates "
    "the streaming pipeline's parse-level "
    "IngestStats.type_drift_rows probe (which does count them). "
    "Scale: one scan, one map-side-combined groupBy(event_type)",
    tags=("cdc", "quality", "report"),
)
def cdc_type_drift_report(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    raw_k = F.get_json_object("props", "$.k")
    raw_u = F.get_json_object("props", "$.u")
    k_drift = raw_k.isNotNull() & ~raw_k.rlike("^-?[0-9]+$")
    return ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(raw_k.isNotNull().cast("int"))
        .cast("bigint")
        .alias("k_wire_nonnull"),
        F.sum(k_drift.cast("int")).cast("bigint").alias("k_type_drift"),
        F.sum(raw_u.isNull().cast("int"))
        .cast("bigint")
        .alias("u_missing"),
    )
