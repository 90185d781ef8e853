"""UDF/UDAF surface + remaining SQL-surface extensions (SURVEY §2.7 gap
list): GROUPING SETS, vectorized scalar pandas_udf, grouped-map
applyInPandas, exact + approximate percentiles.

The reference exposes none of these (its query surface is delegated to
DuckDB); they are the engine-completeness extensions the rebuild claims.
UDF design rule: Arrow-vectorized (pandas_udf / applyInPandas) only — a
row-at-a-time Python UDF is never the right answer at 100 TB.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..queries import load, register


@register(
    "grouping_sets_agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority))
    """,
    description="GROUP BY GROUPING SETS: three explicit grouping "
    "combinations in one pass (partial aggregation shared across sets)",
    tags=("agg", "grouping-sets"),
)
def grouping_sets_agg(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    view = "orders_gs_tmp"
    o.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM {view}
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        """
    )


@register(
    "pandas_udf_scalar",
    oracle="""
    SELECT event_id, value * 2.0 + CAST(event_id % 7 AS DOUBLE) AS scored
    FROM events WHERE event_id < 5000
    """,
    description="vectorized scalar pandas_udf (Arrow batches, no per-row "
    "Python): the sanctioned UDF path when built-ins can't express logic",
    tags=("udf",),
)
def pandas_udf_scalar(spark: SparkSession, sf: str) -> DataFrame:
    @pandas_udf("double")
    def score(value: pd.Series, event_id: pd.Series) -> pd.Series:
        # *2 is exponent-exact; + small int rounds once — bit-stable vs SQL
        return value * 2.0 + (event_id % 7).astype("float64")

    return (
        load(spark, sf, "events")
        .where(F.col("event_id") < 5000)
        .select("event_id", score("value", "event_id").alias("scored"))
    )


@register(
    "grouped_map_normalize",
    oracle="""
    SELECT event_id, event_type,
           CASE WHEN mx = mn THEN 0.5
                ELSE (value - mn) / (mx - mn) END AS norm
    FROM (SELECT event_id, event_type, value,
                 min(value) OVER (PARTITION BY event_type) AS mn,
                 max(value) OVER (PARTITION BY event_type) AS mx
          FROM events) t
    """,
    description="grouped-map applyInPandas (UDAF-style per-group kernel): "
    "min-max normalization per event_type; min/max are order-exact so the "
    "pandas kernel matches the SQL window formulation bitwise",
    tags=("udf", "grouped-map"),
)
def grouped_map_normalize(spark: SparkSession, sf: str) -> DataFrame:
    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        mn, mx = pdf["value"].min(), pdf["value"].max()
        if mx == mn:
            norm = pd.Series(0.5, index=pdf.index)
        else:
            norm = (pdf["value"] - mn) / (mx - mn)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "norm": norm,
            }
        )

    return (
        load(spark, sf, "events")
        .select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(normalize, "event_id long, event_type string, norm double")
    )


@register(
    "exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.50) AS p50,
           quantile_cont(l_quantity, 0.90) AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
    description="exact percentiles (sort-based, linear interpolation) — "
    "l_quantity is integral so the lerp is bit-stable across engines",
    tags=("agg", "percentile"),
)
def exact_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("p25"),
        F.percentile("l_quantity", F.lit(0.50)).alias("p50"),
        F.percentile("l_quantity", F.lit(0.90)).alias("p90"),
    )


@register(
    "approx_percentiles",
    oracle=None,  # sketch-based (GK/t-digest differ per engine) — rows-only
    description="approx_percentile (Greenwald-Khanna sketch): the scale "
    "path — mergeable partial sketches, no global sort",
    tags=("agg", "percentile", "approx"),
)
def approx_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    # scalar columns (not the array form): the driver's pandas canonicalizer
    # cannot hash list cells
    return l.groupBy("l_returnflag").agg(
        F.approx_percentile(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(1000)
        ).alias("p")
    ).select(
        "l_returnflag",
        F.element_at("p", 1).alias("p50"),
        F.element_at("p", 2).alias("p95"),
    )


@register(
    "approx_percentiles_accuracy",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.50) AS p50_exact,
           quantile_cont(l_quantity, 0.90) AS p90_exact,
           true AS within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
    description="driver-checkable accuracy row for approx_percentiles "
    "(r9 verdict #4): exact percentile of l_quantity (integral, lerp "
    "bit-stable across engines) + a 5% tolerance verdict on the GK "
    "sketch (accuracy=1000 → rank error ≤ 0.1%, value error ≤ 1 on the "
    "1..50 quantity domain). Oracle computes the exact side + literal "
    "true; a sketch regression flips the boolean.",
    tags=("agg", "percentile", "approx", "accuracy"),
)
def approx_percentiles_accuracy(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.50)).alias("p50_exact"),
        F.percentile("l_quantity", F.lit(0.90)).alias("p90_exact"),
        F.approx_percentile(
            "l_quantity", F.array(F.lit(0.5), F.lit(0.9)), F.lit(1000)
        ).alias("ap"),
    )
    within = (
        F.abs(F.element_at("ap", 1) - F.col("p50_exact"))
        <= 0.05 * F.col("p50_exact")
    ) & (
        F.abs(F.element_at("ap", 2) - F.col("p90_exact"))
        <= 0.05 * F.col("p90_exact")
    )
    return agg.select(
        "l_returnflag", "p50_exact", "p90_exact", within.alias("within_5pct")
    )


@register(
    "frequent_items",
    oracle=None,  # sketch-based (possible false positives) — rows-only
    description="heavy hitters via freqItems (count-sketch family): "
    "single-pass mergeable approximate frequent-value detection — the "
    "scale path for corpus vocabulary / hot-key discovery",
    tags=("agg", "approx", "sketch"),
)
def frequent_items(spark: SparkSession, sf: str) -> DataFrame:
    # items appearing in >= 10% of events; exact verification joins the
    # candidates back against true counts (standard sketch-then-verify)
    ev = load(spark, sf, "events")
    cand = ev.freqItems(["event_type"], support=0.1)
    items = cand.select(
        F.explode("event_type_freqItems").alias("event_type")
    )
    total = ev.count()
    return (
        ev.join(F.broadcast(items), "event_type", "left_semi")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= 0.1 * total)
        .orderBy("event_type")
    )


@register(
    "frequent_items_accuracy",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_exact,
           true AS found_by_sketch
    FROM events GROUP BY event_type
    HAVING count(*) >= 0.1 * (SELECT count(*) FROM events)
    ORDER BY event_type
    """,
    description="driver-checkable accuracy row for frequent_items (r9 "
    "verdict #4): the TRUE >=10% heavy hitters (exact counts, oracle-"
    "computable) each flagged with whether the count-sketch candidate "
    "set contained them — freqItems guarantees no false negatives at "
    "the support threshold, so the boolean is deterministically true "
    "unless the sketch path regresses.",
    tags=("agg", "approx", "sketch", "accuracy"),
)
def frequent_items_accuracy(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    cand = ev.freqItems(["event_type"], support=0.1)
    items = cand.select(
        F.explode("event_type_freqItems").alias("event_type"),
        F.lit(True).alias("found_by_sketch"),
    )
    total = ev.count()
    exact = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n_exact"))
        .where(F.col("n_exact") >= 0.1 * total)
    )
    return (
        exact.join(F.broadcast(items), "event_type", "left")
        .select(
            "event_type",
            F.col("n_exact").cast("long"),
            F.coalesce("found_by_sketch", F.lit(False)).alias(
                "found_by_sketch"
            ),
        )
        .orderBy("event_type")
    )
