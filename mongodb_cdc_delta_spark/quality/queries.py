"""Oracle-checkable formulations of the quality/transformation rules
(spec FR-057/FR-059), run on the driver's tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import load, register
from .rules import (
    DateConversion,
    FieldRename,
    MaskRule,
    ValidationRule,
    apply_transformations,
    validate_split,
)


@register(
    "quality_validation_split",
    oracle="""
    SELECT CASE
             WHEN c_acctbal IS NULL OR c_acctbal < -900 THEN 'acctbal_range'
             WHEN c_name IS NULL OR length(c_name) = 0 THEN 'name_required'
             ELSE 'valid' END AS bucket,
           count(*) AS n
    FROM customer GROUP BY 1
    """,
    description="validation rules on critical fields (FR-057 T1): failing "
    "rows quarantined with the first failed rule name",
    tags=("quality",),
)
def quality_validation_split(spark: SparkSession, sf: str) -> DataFrame:
    rules = [
        ValidationRule("acctbal_range", "c_acctbal IS NOT NULL AND c_acctbal >= -900"),
        ValidationRule("name_required", "c_name IS NOT NULL AND length(c_name) > 0"),
    ]
    valid, invalid = validate_split(load(spark, sf, "customer"), rules)
    v = valid.select(F.lit("valid").alias("bucket"))
    i = invalid.select(F.col("_failed_rules")[0].alias("bucket"))
    return v.union(i).groupBy("bucket").agg(F.count("*").alias("n"))


@register(
    "quality_pii_mask",
    oracle="""
    SELECT c_custkey,
           sha256(c_name) AS c_name,
           '***' AS c_mktsegment,
           repeat('*', greatest(length(CAST(c_acctbal AS VARCHAR)) - 4, 0))
             || right(CAST(c_acctbal AS VARCHAR), 4) AS c_acctbal
    FROM customer WHERE c_custkey <= 100
    """,
    description="PII masking (FR-059 T4): hash / redact / partial "
    "strategies as sha2 + string expressions (reference crypto.py HMAC "
    "pseudonymization kept deterministic for joins)",
    tags=("quality",),
)
def quality_pii_mask(spark: SparkSession, sf: str) -> DataFrame:
    df = load(spark, sf, "customer").where(F.col("c_custkey") <= 100)
    out = apply_transformations(
        df,
        mask_rules=[
            MaskRule("c_name", "hash"),
            MaskRule("c_mktsegment", "redact"),
            MaskRule("c_acctbal", "partial", keep_last=4),
        ],
    )
    return out.select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


@register(
    "quality_encrypt_roundtrip",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer WHERE c_custkey <= 100
    """,
    description="reversible PII masking (FR-059 T4 / reference "
    "crypto.py:40-100): AES-GCM encrypt then decrypt inside the query — "
    "the oracle checks the round trip restores the plaintext exactly",
    tags=("quality", "crypto"),
)
def quality_encrypt_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    from .rules import mask_columns, unmask_columns

    rules = [
        MaskRule("c_name", "encrypt", key="0123456789abcdef"),
        MaskRule(
            "c_mktsegment",
            "encrypt",
            key="0123456789abcdef0123456789abcdef",
            iv_hex="000102030405060708090a0b",  # deterministic variant
        ),
    ]
    df = load(spark, sf, "customer").where(F.col("c_custkey") <= 100)
    masked = mask_columns(df, rules)
    return unmask_columns(masked, rules).select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "quality_rename_dateconvert",
    oracle="""
    SELECT event_id,
           epoch_us(ts) // 1000000 AS event_epoch,
           strftime(ts, '%Y-%m-%dT%H:%M:%S') AS event_iso
    FROM events WHERE event_id < 2000
    """,
    description="field renaming + ISO8601/Unix date conversion (FR-059 "
    "T2/T3) as pure projections",
    tags=("quality",),
)
def quality_rename_dateconvert(spark: SparkSession, sf: str) -> DataFrame:
    df = load(spark, sf, "events").where(F.col("event_id") < 2000)
    df = df.withColumn("ts2", F.col("ts"))
    out = apply_transformations(
        df,
        renames=[FieldRename("ts", "event_epoch"), FieldRename("ts2", "event_iso")],
        date_rules=[
            DateConversion("event_epoch", to="unix"),
            DateConversion("event_iso", to="iso"),
        ],
    )
    return out.select("event_id", "event_epoch", "event_iso")


@register(
    "quality_constraint_suite",
    oracle="""
    WITH n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM orders)
    SELECT 'completeness' AS constraint, 'o_custkey' AS column,
           round(CAST(count(o_custkey) AS DOUBLE) / (SELECT n FROM n), 6)
             AS metric,
           CAST(1.0 AS DOUBLE) AS threshold,
           CASE WHEN count(o_custkey) = count(*) THEN 'pass' ELSE 'fail'
             END AS status
    FROM orders
    UNION ALL
    SELECT 'uniqueness', 'o_orderkey',
           round(CAST(count(DISTINCT o_orderkey) AS DOUBLE)
                 / (SELECT n FROM n), 6),
           CAST(1.0 AS DOUBLE),
           CASE WHEN count(DISTINCT o_orderkey) = count(*)
                THEN 'pass' ELSE 'fail' END
    FROM orders
    UNION ALL
    SELECT 'min_value', 'o_totalprice',
           round(CAST(min(o_totalprice) AS DOUBLE), 6),
           CAST(0.0 AS DOUBLE),
           CASE WHEN min(o_totalprice) >= 0 THEN 'pass' ELSE 'fail' END
    FROM orders
    UNION ALL
    SELECT 'in_set', 'o_orderstatus',
           round(CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P')
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / (SELECT n FROM n), 6),
           CAST(1.0 AS DOUBLE),
           CASE WHEN sum(CASE WHEN o_orderstatus IN ('O','F','P')
                              THEN 1 ELSE 0 END) = count(*)
                THEN 'pass' ELSE 'fail' END
    FROM orders
    UNION ALL
    SELECT 'ref_integrity', 'o_custkey',
           round(1.0 - CAST((SELECT count(*) FROM orders o
                             WHERE o.o_custkey IS NOT NULL
                               AND NOT EXISTS (SELECT 1 FROM customer c
                                               WHERE c.c_custkey = o.o_custkey))
                            AS DOUBLE) / (SELECT n FROM n), 6),
           CAST(1.0 AS DOUBLE),
           CASE WHEN (SELECT count(*) FROM orders o
                      WHERE o.o_custkey IS NOT NULL
                        AND NOT EXISTS (SELECT 1 FROM customer c
                                        WHERE c.c_custkey = o.o_custkey)) = 0
                THEN 'pass' ELSE 'fail' END
    """,
    description="Deequ-style declarative constraint suite verified in ONE "
    "aggregation pass (completeness, uniqueness, range, set membership) "
    "plus one anti-join per referential-integrity check — table-level QA "
    "that costs one scan at 100 TB, not one scan per constraint",
    tags=("quality", "constraints"),
)
def quality_constraint_suite(spark: SparkSession, sf: str) -> DataFrame:
    from .expectations import Constraint, verify_suite

    orders = load(spark, sf, "orders")
    customer = load(spark, sf, "customer").select("c_custkey")
    return verify_suite(
        orders,
        [
            Constraint("completeness", "o_custkey"),
            Constraint("uniqueness", "o_orderkey"),
            Constraint("min_value", "o_totalprice", value=0.0),
            Constraint("in_set", "o_orderstatus", value=("O", "F", "P")),
            Constraint("ref_integrity", "o_custkey"),
        ],
        refs={"o_custkey": customer},
    )
