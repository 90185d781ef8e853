"""Declared analytical query surface (SURVEY.md §2.7 Q1-Q8) plus the §2.7
gap-list extensions (windows, rollup/cube, set ops, semi/anti/as-of/range
joins, distinct aggregates, JSON extraction).

The reference delegates this entire surface to DuckDB over its Delta tables
(reference: specs/001-mongodb-cdc-delta/spec.md:307-312, research.md:576-634);
here each class is a first-class Spark DataFrame plan that Catalyst optimizes
(pushdown, pruning, broadcast joins, whole-stage codegen).

Determinism contract (see queries/__init__.py): aggregated doubles go through
DECIMAL(18,4) per row; averages are exact-decimal-sum → double / count; every
LIMIT has a unique total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load, register

DEC = "decimal(18,4)"


def _dec(col):
    """Per-row decimal cast so cross-engine sums are exact and order-free."""
    return col.cast(DEC)


# ---------------------------------------------------------------------------
# Q1 point query (spec.md:308 — equality filter on key)
# ---------------------------------------------------------------------------
@register(
    "point_lookup",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events WHERE event_id = 4242
    """,
    description="Q1 point query: key-equality filter; pushed to parquet scan",
    tags=("q1", "filter"),
)
def point_lookup(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .where(F.col("event_id") == 4242)
        .select("event_id", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# Q2 range query (spec.md:309 — BETWEEN on date column)
# ---------------------------------------------------------------------------
@register(
    "range_scan",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                          AND TIMESTAMP '1996-12-31 23:59:59'
    """,
    description="Q2 range query: date BETWEEN; min/max file skipping applies",
    tags=("q2", "filter"),
)
def range_scan(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .where(
            F.col("o_orderdate").between(
                F.to_timestamp(F.lit("1996-01-01 00:00:00")),
                F.to_timestamp(F.lit("1996-12-31 23:59:59")),
            )
        )
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Q3 aggregation (spec.md:310 — GROUP BY + COUNT/SUM)
# ---------------------------------------------------------------------------
@register(
    "group_agg",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_value
    FROM events
    GROUP BY event_type
    """,
    description="Q3 aggregation: hash agg with partial (map-side) combine",
    tags=("q3", "agg"),
)
def group_agg(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            # the sum itself is exact decimal arithmetic; only the emitted
            # column is cast (once) to double so both engines hand the driver
            # the same pandas dtype (DuckDB's decimal→pandas path is float64)
            F.sum(_dec(F.col("value"))).cast("double").alias("sum_value"),
        )
        .withColumn("avg_value", F.col("sum_value") / F.col("n_events"))
    )


# ---------------------------------------------------------------------------
# Q3 top-k (research.md:576-583 — the reference's own DuckDB example:
# GROUP BY customer ORDER BY count DESC LIMIT 10)
# ---------------------------------------------------------------------------
@register(
    "group_topk",
    oracle="""
    SELECT o_custkey, count(*) AS order_count
    FROM orders
    GROUP BY o_custkey
    ORDER BY order_count DESC, o_custkey ASC
    LIMIT 10
    """,
    description="Q3 top-k: agg + TakeOrderedAndProject (no full sort)",
    tags=("q3", "agg", "topk"),
)
def group_topk(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("order_count"))
        .orderBy(F.col("order_count").desc(), F.col("o_custkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q4 FK join (spec.md:311 — INNER JOIN on indexed FK)
# ---------------------------------------------------------------------------
@register(
    "fk_join_agg",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
    description="Q4 FK join: customer⋈orders; AQE picks broadcast vs SMJ",
    tags=("q4", "join", "agg"),
)
def fk_join_agg(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return (
        o.join(c, c.c_custkey == o.o_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec(F.col("o_totalprice"))).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q1-style pricing summary — the flagship scan+agg query
# ---------------------------------------------------------------------------
PRICING_SUMMARY_ORACLE = """
SELECT l_returnflag,
       l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "pricing_summary",
    oracle=PRICING_SUMMARY_ORACLE,
    description="TPC-H Q1-style scan-heavy aggregate (flagship)",
    tags=("q3", "agg", "flagship"),
)
def pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem").where(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-09-02 00:00:00"))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # charge carries ~6 conceptual decimals, so a double→decimal cast can land
    # on exact rounding midpoints where engines disagree (HALF_UP vs
    # HALF_EVEN). floor-scaling to a BIGINT is midpoint-free and exact.
    charge_scaled = F.floor(charge * 10000).cast("long")

    # Raw ≤4-decimal columns aggregate as round-scaled BIGINTs instead of
    # decimals: a long sum is ~2.5x cheaper per column than a decimal sum in
    # the hash aggregate (the hot loop of this scan-heavy query) and the
    # value is bit-identical — round(x*10000) recovers the conceptual
    # fixed-point integer exactly, and the post-agg /10000 decimal division
    # is exact. Verified equal to the decimal-sum formulation.
    def scaled(c):
        return F.round(c * 10000).cast("long")

    def unscale(name):
        # the scaled sum is an exact integer < 2^53, so double division by
        # 10000.0 is correctly rounded — identical to exact-decimal/10000
        # cast to double, and the dtype DuckDB's pandas path emits
        return F.col(name).cast("double") / 10000.0

    agg = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(scaled(F.col("l_quantity"))).alias("sq"),
        F.sum(scaled(F.col("l_extendedprice"))).alias("sb"),
        F.sum(_dec(disc_price)).cast("double").alias("sum_disc_price"),
        (F.sum(charge_scaled).cast("double") / 10000.0).alias("sum_charge"),
        F.sum(scaled(F.col("l_discount"))).alias("sd"),
        F.count("*").alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        unscale("sq").alias("sum_qty"),
        unscale("sb").alias("sum_base_price"),
        "sum_disc_price",
        "sum_charge",
        (F.col("sq").cast("double") / 10000.0 / F.col("count_order")).alias(
            "avg_qty"
        ),
        (F.col("sb").cast("double") / 10000.0 / F.col("count_order")).alias(
            "avg_price"
        ),
        (F.col("sd").cast("double") / 10000.0 / F.col("count_order")).alias(
            "avg_disc"
        ),
        "count_order",
    )


# ---------------------------------------------------------------------------
# TPC-H Q6-style: selective scan + single aggregate (pushdown showcase)
# ---------------------------------------------------------------------------
@register(
    "revenue_forecast",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    description="TPC-H Q6-style: all predicates pushed to the parquet scan",
    tags=("q5", "q6", "filter", "agg"),
)
def revenue_forecast(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q5-style star join: region⋈nation⋈customer⋈orders⋈lineitem⋈supplier
# ---------------------------------------------------------------------------
@register(
    "star_join_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    description="TPC-H Q5-style star join; dims broadcast, facts co-shuffled",
    tags=("q4", "join", "agg", "star"),
)
def star_join_revenue(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    )
    l = load(spark, sf, "lineitem")
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region").where(F.col("r_name").isin("ASIA", "EUROPE"))
    # Dimension tables are tiny at every SF — broadcast them explicitly so the
    # only shuffles are the two fact-fact joins (orders⋈lineitem on orderkey).
    joined = (
        o.join(c, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("double")
        .alias("revenue")
    )


# ---------------------------------------------------------------------------
# Window functions (gap-list: reference lacks these entirely)
# ---------------------------------------------------------------------------
@register(
    "window_running_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
    FROM events
    """,
    description="running per-user sum; single shuffle on the partition key",
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load(spark, sf, "events")
        .select(
            "event_id",
            "user_id",
            F.sum(_dec(F.col("value"))).over(w).cast("double").alias("run_sum"),
        )
    )


@register(
    "window_topn_per_group",
    oracle="""
    SELECT user_id, event_id, value, rn FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id ASC) AS rn
      FROM events WHERE event_type = 'purchase') t
    WHERE rn <= 3
    """,
    description="top-N per group via row_number (rank pushdown in AQE)",
    tags=("window", "topk"),
)
def window_topn_per_group(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        load(spark, sf, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id", "event_id", "value", F.row_number().over(w).alias("rn")
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "window_lag_delta",
    oracle="""
    SELECT event_id, user_id,
           value - lag(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS delta
    FROM events
    """,
    description="per-user lag delta (deterministic IEEE subtraction)",
    tags=("window",),
)
def window_lag_delta(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load(spark, sf, "events").select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@register(
    "sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, event_id,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    description="gap-based sessionization (30 min) via lag + cumulative sum",
    tags=("window", "session"),
)
def sessionize(spark: SparkSession, sf: str) -> DataFrame:
    # NOTE: the cumulative-sum window in the oracle orders by event_id; event
    # ids are assigned in ts order per user in this dataset only at the global
    # level, so we order by (ts, event_id) for the lag and event_id for the
    # running sum exactly as the oracle does.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = load(spark, sf, "events").select(
        "user_id",
        "event_id",
        F.when(
            (
                F.unix_micros(F.col("ts"))
                - F.lag(F.unix_micros(F.col("ts"))).over(w)
                > 1_800_000_000
            )
            | F.lag("ts").over(w).isNull(),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_session"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.select(
        "user_id",
        "event_id",
        F.sum("new_session").over(w2).alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events")
    )


# ---------------------------------------------------------------------------
# ROLLUP / CUBE (gap-list)
# ---------------------------------------------------------------------------
@register(
    "rollup_daily",
    oracle="""
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY ROLLUP(event_type, strftime(ts, '%Y-%m-%d'))
    """,
    description="hierarchical rollup (type → day → grand total)",
    tags=("agg", "rollup"),
)
def rollup_daily(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    return e.rollup("event_type", "day").agg(
        F.count("*").alias("n"),
        F.sum(_dec(F.col("value"))).cast("double").alias("sum_value"),
    )


@register(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    description="2-D cube over orders",
    tags=("agg", "cube"),
)
def cube_status_priority(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec(F.col("o_totalprice"))).cast("double").alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations (gap-list)
# ---------------------------------------------------------------------------
@register(
    "set_ops",
    oracle="""
    SELECT user_id FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      INTERSECT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ) buyers_who_click
    EXCEPT
    SELECT user_id FROM events WHERE event_type IN ('error', 'purchase')
    GROUP BY user_id
    HAVING count(CASE WHEN event_type = 'error' THEN 1 END)
         > count(CASE WHEN event_type = 'purchase' THEN 1 END)
    """,
    description="INTERSECT + EXCEPT composition: engaged buyers minus "
    "churn-risk users (more errors than purchases). The EXCEPT side is a "
    "data-relative predicate so every scale factor splits the user base "
    "(an absolute threshold goes vacuous as per-user volumes shift).",
    tags=("setop",),
)
def set_ops(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    clicks = e.where(F.col("event_type") == "click").select("user_id").distinct()
    buys = e.where(F.col("event_type") == "purchase").select("user_id").distinct()
    churny = (
        e.where(F.col("event_type").isin("error", "purchase"))
        .groupBy("user_id")
        .agg(
            F.count(F.when(F.col("event_type") == "error", 1)).alias("n_err"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_buy"),
        )
        .where(F.col("n_err") > F.col("n_buy"))
        .select("user_id")
    )
    return clicks.intersect(buys).exceptAll(churny)


# ---------------------------------------------------------------------------
# Semi / anti joins (gap-list)
# ---------------------------------------------------------------------------
@register(
    "semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                    AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
    """,
    description="left-semi join (EXISTS) — no row duplication, early out",
    tags=("join", "semi"),
)
def semi_join(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    """,
    description="left-anti join (NOT EXISTS): lapsed customers — no order "
    "since 1999. The recency predicate keeps the anti side non-empty at "
    "every scale factor (every custkey has SOME order in generated data, "
    "so an unfiltered NOT EXISTS is vacuously empty).",
    tags=("join", "anti"),
)
def anti_join(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").where(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("1999-01-01 00:00:00"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# Distinct aggregates
# ---------------------------------------------------------------------------
@register(
    "exact_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    description="exact COUNT(DISTINCT) — expands to two-phase agg",
    tags=("agg", "distinct"),
)
def exact_distinct(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "approx_distinct",
    oracle=None,  # HLL sketches differ per engine; driver does rows-only
    description="approx_count_distinct (HyperLogLog++) — scale path for "
    "COUNT(DISTINCT) at 100 TB; validated vs exact in tests",
    tags=("agg", "approx"),
)
def approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("approx_users"))
    )


@register(
    "approx_distinct_accuracy",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           true AS within_5pct
    FROM events GROUP BY event_type
    """,
    description="driver-checkable accuracy row for approx_distinct (r9 "
    "verdict #4): the sketch itself differs per engine, but the TOLERANCE "
    "VERDICT doesn't — Spark computes both sides and emits exact count + "
    "|HLL - exact| <= 5% (rsd=0.01, so ~2-3% expected); the oracle "
    "computes the exact side and a literal true. A sketch regression "
    "flips the boolean and fails the hash.",
    tags=("agg", "approx", "accuracy"),
)
def approx_distinct_accuracy(spark: SparkSession, sf: str) -> DataFrame:
    # r10 OPT (guide §2.3 "shuffle fewer bytes"; mechanism corrected per
    # the r10 verdict — there is no Expand in the before-plan): mixing an
    # exact COUNT(DISTINCT) with approx_count_distinct made the first
    # exchange carry the PARTIAL HLL SKETCH BUFFER per not-yet-deduped
    # (event_type, user_id) pair — a 1,641-column shuffle payload.
    # Pre-distinct the pairs with a map-side-combining groupBy, then
    # count + HLL over the deduped pairs (2-column shuffle): an HLL
    # sketch is a pure function of the value SET (duplicate inserts are
    # no-ops), so the estimate is bit-identical to sketching the raw
    # stream.
    return (
        load(spark, sf, "events")
        .select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(
            F.count("*").alias("exact"),
            F.approx_count_distinct("user_id", 0.01).alias("approx"),
        )
        .select(
            "event_type",
            F.col("exact").cast("long").alias("n_users_exact"),
            (
                F.abs(F.col("approx") - F.col("exact"))
                <= 0.05 * F.col("exact")
            ).alias("within_5pct"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join (gap-list; implemented scalably via union + carry-forward —
# no row explosion, one shuffle on the partition key)
# ---------------------------------------------------------------------------
@register(
    "asof_join",
    oracle="""
    SELECT e.event_id, e.user_id,
           epoch_us(e.ts) - (
             SELECT max(epoch_us(c.ts)) FROM events c
             WHERE c.event_type = 'click' AND c.user_id = e.user_id
               AND c.ts <= e.ts) AS gap_us
    FROM events e WHERE e.event_type = 'error'
    """,
    description="as-of join: last click at-or-before each error, per user. "
    "Union + last(ignorenulls) carry-forward: O(n log n) per key, no "
    "range-join explosion — the pattern that survives 100 TB",
    tags=("join", "asof"),
)
def asof_join(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id"),
        F.lit(0).alias("src"),
        F.col("ts").alias("click_ts"),
    )
    errors = e.where(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.col("event_id"),
        F.lit(1).alias("src"),
        F.lit(None).cast("timestamp").alias("click_ts"),
    )
    # at equal ts the click sorts first (src=0) so the error sees it — same
    # boundary semantics as the oracle's c.ts <= e.ts
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "src", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = clicks.unionByName(errors).withColumn(
        "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    return carried.where(F.col("src") == 1).select(
        "event_id",
        "user_id",
        (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_click_ts"))
        ).alias("gap_us"),
    )


# ---------------------------------------------------------------------------
# Range (interval) join
# ---------------------------------------------------------------------------
@register(
    "range_join",
    oracle="""
    SELECT e.event_id, count(c.event_id) AS n_recent_clicks
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id
     AND c.ts >= e.ts - INTERVAL 10 MINUTE
     AND c.ts <= e.ts
    GROUP BY e.event_id
    """,
    description="interval range join: clicks within 10 min before each error; "
    "equi-key on user bounds the search space",
    tags=("join", "range"),
)
def range_join(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    errors = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id").alias("err_user"),
        F.col("ts").alias("err_ts"),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    joined = errors.join(
        clicks,
        (F.col("err_user") == F.col("click_user"))
        & (F.col("click_ts") >= F.col("err_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("click_ts") <= F.col("err_ts")),
        "left",
    )
    return joined.groupBy(F.col("err_id").alias("event_id")).agg(
        F.count("click_id").alias("n_recent_clicks")
    )


# ---------------------------------------------------------------------------
# Semi-structured: JSON property extraction (Mongo-document analogue)
# ---------------------------------------------------------------------------
@register(
    "json_extract_agg",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           count(*) AS n
    FROM events
    GROUP BY 1
    """,
    description="JSON path extraction from a document column + aggregate "
    "(the schemaless-Mongo query pattern)",
    tags=("json", "agg"),
)
def json_extract_agg(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .select(
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_mod")
        )
        .groupBy("k_mod")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Pivot / unpivot (gap-list: reshaping ops)
# ---------------------------------------------------------------------------
@register(
    "pivot_segment_status",
    oracle="""
    SELECT c_mktsegment,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS f_orders,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS o_orders,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS p_orders
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c_mktsegment
    """,
    description="pivot: order-status counts spread into columns per market "
    "segment — groupBy().pivot() compiles to one agg with filtered counts",
    tags=("pivot", "agg"),
)
def pivot_segment_status(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    # explicit pivot values: skips the extra distinct-scan Spark otherwise
    # runs to discover them (and fixes the output schema at any scale)
    return (
        o.join(c, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "c_mktsegment",
            F.coalesce("F", F.lit(0)).alias("f_orders"),
            F.coalesce("O", F.lit(0)).alias("o_orders"),
            F.coalesce("P", F.lit(0)).alias("p_orders"),
        )
    )


@register(
    "unpivot_customer_metrics",
    oracle="""
    SELECT c_custkey, metric, value FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    ) WHERE c_custkey <= 500
    """,
    description="unpivot/melt: wide columns to (key, metric, value) rows — "
    "Spark's unpivot is a zero-shuffle generator expression",
    tags=("unpivot",),
)
def unpivot_customer_metrics(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "customer")
        .where(F.col("c_custkey") <= 500)
        .select(
            "c_custkey",
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_nationkey").cast("double").alias("nationkey"),
        )
        .unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "value")
    )


# ---------------------------------------------------------------------------
# Array aggregation (collect + sort for deterministic cross-engine compare)
# ---------------------------------------------------------------------------
@register(
    "array_agg_user_events",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',')
             AS event_types,
           count(DISTINCT event_type) AS n_types
    FROM events
    WHERE user_id < 200
    GROUP BY user_id
    """,
    description="array aggregation: distinct event types per user as a "
    "sorted array (collect_set + array_sort — deterministic regardless of "
    "shuffle order); emitted comma-joined so the driver's pandas "
    "canonicalizer (which cannot sort list cells) can value-hash it",
    tags=("agg", "array"),
)
def array_agg_user_events(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .where(F.col("user_id") < 200)
        .groupBy("user_id")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias(
                "event_types"
            ),
            F.count_distinct("event_type").alias("n_types"),
        )
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery (Catalyst decorrelates to a join — SURVEY §4)
# ---------------------------------------------------------------------------
@register(
    "correlated_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
                              FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
    """,
    description="correlated scalar subquery: orders above 2x their "
    "customer's average — Catalyst decorrelates into one aggregate + join "
    "(no per-row re-execution)",
    tags=("subquery", "join"),
)
def correlated_subquery(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    view = "orders_cs_tmp"
    o.createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM {view} o
        WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
                                  FROM {view} o2
                                  WHERE o2.o_custkey = o.o_custkey)
        """
    )


@register(
    "variant_extract_filter",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 AS k_bucket,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    GROUP BY 1
    """,
    description="VARIANT-native semi-structured access (Spark 4): "
    "try_parse_json once, typed try_variant_get extractions — the "
    "binary-encoded fast path the CDC parser uses, vs per-path "
    "get_json_object re-parsing in json_extract_agg",
    tags=("json", "variant", "agg"),
)
def variant_extract_filter(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "long")
    return (
        ev.select(k.alias("k"))
        .where(F.col("k") > 50)
        .groupBy((F.col("k") % 5).alias("k_bucket"))
        .agg(F.count("*").alias("n"), F.sum("k").alias("k_sum"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q2-style: multi-level correlated subquery (min-cost supplier per
# part, bridged through lineitem — this dataset has no partsupp table)
# ---------------------------------------------------------------------------
@register(
    "min_cost_supplier",
    oracle="""
    SELECT DISTINCT p.p_partkey, s.s_suppkey, s.s_name,
           l.l_extendedprice AS min_price
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE p.p_size = 15
      AND l.l_extendedprice = (SELECT min(l2.l_extendedprice)
                               FROM lineitem l2
                               WHERE l2.l_partkey = p.p_partkey)
    """,
    description="TPC-H Q2-style correlated-min lookup: supplier(s) offering "
    "each size-15 part at its global minimum price. Catalyst decorrelates "
    "the scalar subquery into one aggregate + join — no per-part rescans "
    "(SURVEY §4); parquet min/max skipping prunes the p_size filter",
    tags=("q4", "subquery", "join", "tpch"),
)
def min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "part").createOrReplaceTempView("part_q2_tmp")
    load(spark, sf, "lineitem").createOrReplaceTempView("lineitem_q2_tmp")
    load(spark, sf, "supplier").createOrReplaceTempView("supplier_q2_tmp")
    return spark.sql(
        """
        SELECT DISTINCT p.p_partkey, s.s_suppkey, s.s_name,
               l.l_extendedprice AS min_price
        FROM part_q2_tmp p
        JOIN lineitem_q2_tmp l ON l.l_partkey = p.p_partkey
        JOIN supplier_q2_tmp s ON s.s_suppkey = l.l_suppkey
        WHERE p.p_size = 15
          AND l.l_extendedprice = (SELECT min(l2.l_extendedprice)
                                   FROM lineitem_q2_tmp l2
                                   WHERE l2.l_partkey = p.p_partkey)
        """
    )


# ---------------------------------------------------------------------------
# TPC-H Q7-style: volume shipping between two nations, bucketed by year
# ---------------------------------------------------------------------------
@register(
    "volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
    description="TPC-H Q7-style date-bucketed trade volume between a nation "
    "pair: fact-fact joins shuffle on orderkey/custkey, the two nation dims "
    "broadcast; year() bucket is a codegen projection",
    tags=("q4", "join", "agg", "tpch"),
)
def volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    s = load(spark, sf, "supplier")
    l = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    )
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    n1 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("double")
        .alias("revenue")
    )


# ---------------------------------------------------------------------------
# TPC-H Q22-style: above-average-balance customers with no orders
# ---------------------------------------------------------------------------
@register(
    "dormant_customers",
    oracle="""
    SELECT c_nationkey,
           count(*) AS n_cust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4)))
                                   AS DOUBLE) / count(*)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
    description="TPC-H Q22-style: customers above the positive-balance "
    "average with no orders since 1999, per nation. The average is an "
    "exact decimal sum divided once (deterministic threshold across "
    "engines); NOT EXISTS compiles to a left-anti join",
    tags=("q4", "subquery", "anti", "agg", "tpch"),
)
def dormant_customers(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").where(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("1999-01-01 00:00:00"))
    )
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(_dec(F.col("c_acctbal"))).cast("double")
                / F.count("*")
            ).alias("t")
        )
        .first()["t"]
    )
    return (
        c.where(F.col("c_acctbal") > avg_bal)
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(_dec(F.col("c_acctbal"))).cast("double").alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q3-style: shipping-priority top-10 unshipped orders
# ---------------------------------------------------------------------------
@register(
    "shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
    description="TPC-H Q3-style: top-10 revenue among orders placed before "
    "but shipped after the cutoff, one market segment. Both date filters "
    "push to their scans; the ORDER BY+LIMIT is TakeOrderedAndProject "
    "(no full sort); unique orderkey tiebreak keeps the top-10 total",
    tags=("q4", "join", "agg", "topk", "tpch"),
)
def shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf, "orders").where(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1997-03-15 00:00:00"))
    )
    l = load(spark, sf, "lineitem").where(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1997-03-15 00:00:00"))
    )
    return (
        o.join(c, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q10-style: returned-item customer ranking
# ---------------------------------------------------------------------------
@register(
    "returned_item_ranking",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
    description="TPC-H Q10-style: top-20 customers by returned-item "
    "revenue in one quarter. returnflag + date window push down; nation "
    "broadcasts; TakeOrderedAndProject top-k",
    tags=("q4", "join", "agg", "topk", "tpch"),
)
def returned_item_ranking(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-10-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
    )
    l = load(spark, sf, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf, "nation")
    return (
        o.join(c, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q18-style: large-volume customers (aggregated IN-subquery)
# ---------------------------------------------------------------------------
@register(
    "large_volume_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey
                           HAVING sum(l_quantity) > 300)
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    """,
    description="TPC-H Q18-style: orders whose total quantity exceeds 300 "
    "with their customers. The IN-subquery is an aggregate + left-semi "
    "join (no correlated re-execution); HAVING runs map-side-partial first",
    tags=("q4", "join", "agg", "subquery", "tpch"),
)
def large_volume_customers(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    l = load(spark, sf, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(c, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum(_dec(F.col("l_quantity"))).cast("double").alias("total_qty"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q14-style: promotion revenue share (conditional-aggregate ratio)
# ---------------------------------------------------------------------------
@register(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
               THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4))
               END) AS DOUBLE)
           / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE)
           AS DOUBLE) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    description="TPC-H Q14-style: share of one month's revenue from promo "
    "parts — conditional aggregate over a broadcast part join; both sums "
    "exact decimal, one double division at the end",
    tags=("q4", "join", "agg", "tpch"),
)
def promo_revenue_share(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-09-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-10-01 00:00:00")))
    )
    p = load(spark, sf, "part")
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                100.0
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_pct")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q19-style: disjunctive multi-band predicate join
# ---------------------------------------------------------------------------
@register(
    "banded_discount_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 40)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
    description="TPC-H Q19-style: OR-of-ANDs band predicate over a "
    "broadcast part join — Catalyst keeps the disjunction as one join "
    "filter (no union-of-three-joins rewrite needed) and pushes the "
    "common p_partkey equi-key",
    tags=("q4", "join", "agg", "tpch"),
)
def banded_discount_revenue(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    p = load(spark, sf, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(band)
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# RANGE-frame window: time-interval moving aggregate (vs ROWS frames above)
# ---------------------------------------------------------------------------
@register(
    "moving_hour_stats",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS n_last_hour,
           CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
             AS sum_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    description="RANGE-frame window: per-user trailing-hour count and sum "
    "— a true time-interval frame (all rows within 1h), not a row-count "
    "frame; one shuffle on the partition key",
    tags=("window", "range-frame"),
)
def moving_hour_stats(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    view = "events_mh_tmp"
    ev.createOrReplaceTempView(view)
    # RANGE with interval bounds needs the SQL form (the Python Window API
    # exposes only numeric range bounds)
    return spark.sql(
        f"""
        SELECT event_id, user_id,
               count(*) OVER w AS n_last_hour,
               CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
                 AS sum_last_hour
        FROM {view}
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    )


# ---------------------------------------------------------------------------
# TPC-H Q12-style: late-shipment priority classification
# ---------------------------------------------------------------------------
@register(
    "late_shipment_priority",
    oracle="""
    SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 'high' ELSE 'low' END AS priority_class,
           count(*) AS n_late
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
    description="TPC-H Q12-style: line items shipped >90 days after order "
    "placement, classified by order priority — a cross-table date "
    "comparison as the join filter plus conditional classification",
    tags=("q4", "join", "agg", "tpch"),
)
def late_shipment_priority(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
    )
    l = load(spark, sf, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
                F.lit("high"),
            )
            .otherwise(F.lit("low"))
            .alias("priority_class")
        )
        .groupBy("priority_class")
        .agg(F.count("*").alias("n_late"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q13-style: customer order-count distribution (outer join + re-agg)
# ---------------------------------------------------------------------------
@register(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
    description="TPC-H Q13-style: histogram of customers by how many "
    "non-urgent orders they placed. The LEFT JOIN keeps order-less "
    "customers (count 0 bucket); the filter lives in the join condition, "
    "not WHERE, so it cannot turn the join inner; two cascading "
    "aggregations, the second over ≤ a few hundred distinct counts",
    tags=("q4", "join", "agg", "outer", "tpch"),
)
def customer_order_distribution(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# TPC-H Q17-style: small-quantity-order revenue (correlated avg subquery,
# SQL-API variant — Catalyst decorrelates it; the DataFrame-decorrelated
# sibling `small_qty_part_revenue` below targets a different brand)
# ---------------------------------------------------------------------------
@register(
    "small_qty_revenue_subquery_sql",
    oracle="""
    SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)))
                     AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11'
      AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    """,
    description="TPC-H Q17-style: revenue lost if sub-20%-of-average-"
    "quantity orders were dropped, one brand — written as the literal "
    "correlated scalar subquery through spark.sql so Catalyst's "
    "decorrelation is what gets exercised (the DataFrame sibling "
    "small_qty_part_revenue hand-decorrelates). Quantities are "
    "integer-valued doubles so the avg is exact (integer-sum in double) "
    "and the threshold compare is engine-independent",
    tags=("q4", "join", "agg", "subquery", "sql-api", "tpch"),
)
def small_qty_revenue_subquery_sql(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "lineitem").createOrReplaceTempView("lineitem_q17_tmp")
    load(spark, sf, "part").createOrReplaceTempView("part_q17_tmp")
    return spark.sql(
        """
        SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)))
                         AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
        FROM lineitem_q17_tmp l JOIN part_q17_tmp p
          ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#11'
          AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                              FROM lineitem_q17_tmp l2
                              WHERE l2.l_partkey = p.p_partkey)
        """
    )


# ---------------------------------------------------------------------------
# TPC-H Q21-style: suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------
@register(
    "waiting_suppliers",
    oracle="""
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate >
                            o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    """,
    description="TPC-H Q21-style: suppliers solely responsible for a late "
    "multi-supplier finalized order (ship >60d after placement — this "
    "dataset has no receipt/commit dates). EXISTS → left-semi, NOT EXISTS "
    "→ left-anti, both correlated on the outer order AND its date: the "
    "double-correlation decorrelation stress test",
    tags=("q4", "join", "agg", "subquery", "anti", "tpch"),
)
def waiting_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    load(spark, sf, "supplier").createOrReplaceTempView("supplier_q21_tmp")
    load(spark, sf, "lineitem").createOrReplaceTempView("lineitem_q21_tmp")
    load(spark, sf, "orders").createOrReplaceTempView("orders_q21_tmp")
    return spark.sql(
        """
        SELECT s.s_name, count(*) AS numwait
        FROM supplier_q21_tmp s
        JOIN lineitem_q21_tmp l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders_q21_tmp o    ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAYS
          AND EXISTS (SELECT /*+ MERGE(l2) */ 1
                      FROM lineitem_q21_tmp l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT /*+ MERGE(l3) */ 1
                          FROM lineitem_q21_tmp l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate >
                                o.o_orderdate + INTERVAL 60 DAYS)
        GROUP BY s.s_name
        """
        # MERGE hints on the EXISTS/NOT-EXISTS sides: both are LINEITEM
        # (the fact table) — a broadcast there only fits while the whole
        # fact fits in driver memory, which is exactly the assumption a
        # 100 TB deployment breaks (and a default-memory driver at sf0.1
        # breaks today: the estimate slips under the 64 MB threshold and
        # the build OOMs). Fact-fact semi/anti joins shuffle on the key.
    )


# ---------------------------------------------------------------------------
# TPC-H Q11-style: parts above a global revenue-share threshold
# ---------------------------------------------------------------------------
@register(
    "top_revenue_parts",
    oracle="""
    SELECT l_partkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
         > (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                        AS DOUBLE) * 0.0006
            FROM lineitem)
    """,
    description="TPC-H Q11-style: parts whose revenue exceeds 0.06% of "
    "total (no partsupp table in this dataset — lineitem revenue stands "
    "in for stock value). The HAVING threshold is a scalar subquery: one "
    "extra full-scan aggregate, broadcast as a literal; both sums exact "
    "decimal cast once to double so the compare is engine-independent",
    tags=("q4", "agg", "subquery", "tpch"),
)
def top_revenue_parts(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    total = l.agg(
        F.sum(_dec(F.col("l_extendedprice"))).cast("double").alias("t")
    ).first()["t"]
    return (
        l.groupBy("l_partkey")
        .agg(
            F.sum(_dec(F.col("l_extendedprice")))
            .cast("double")
            .alias("part_value")
        )
        .where(F.col("part_value") > total * 0.0006)
    )


# ---------------------------------------------------------------------------
# TPC-H Q20-style: suppliers of heavily-shipped promo-named parts
# (nested IN-subqueries → chained semi-joins)
# ---------------------------------------------------------------------------
@register(
    "promo_part_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small %')
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING sum(l.l_quantity) > 50
    )
    """,
    description="TPC-H Q20-style: suppliers who shipped >50 units of any "
    "'small'-named part in 1996 (no partsupp/availqty in this dataset). "
    "Nested IN-subqueries compile to chained left-semi joins — the part "
    "name filter broadcasts into the lineitem scan, no correlated "
    "re-execution; integer-valued quantities keep the HAVING exact",
    tags=("q4", "join", "subquery", "agg", "tpch"),
)
def promo_part_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    s = load(spark, sf, "supplier")
    p = load(spark, sf, "part").where(F.col("p_name").like("small %"))
    l = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01 00:00:00")))
    )
    heavy = (
        l.join(
            F.broadcast(p.select("p_partkey")),
            l.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return s.join(
        heavy.withColumnRenamed("l_suppkey", "s_suppkey"),
        "s_suppkey",
        "left_semi",
    ).select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# TPC-H Q5-style: regional revenue where supplier and customer share a nation
# ---------------------------------------------------------------------------
@register(
    "regional_revenue",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    description="TPC-H Q5-style local-supplier regional revenue: the "
    "supplier-nation = customer-nation equi-condition rides the suppkey "
    "join; nation+region broadcast; one shuffle per fact-fact join",
    tags=("q4", "join", "agg", "tpch"),
)
def regional_revenue(spark: SparkSession, sf: str) -> DataFrame:
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01 00:00:00")))
    )
    l = load(spark, sf, "lineitem")
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region").where(F.col("r_name") == "ASIA")
    joined = (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(
            s,
            (s.s_suppkey == l.l_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("double")
        .alias("revenue")
    )


# ---------------------------------------------------------------------------
# TPC-H Q8-style: one nation's market share inside a region, by year
# ---------------------------------------------------------------------------
@register(
    "market_share",
    oracle="""
    WITH base AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(18,4)) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    )
    SELECT o_year,
           CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_1'
                              THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END)
                     AS DOUBLE)
                / CAST(sum(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM base GROUP BY o_year
    """,
    description="TPC-H Q8-style national market share: conditional decimal "
    "sum over total decimal sum per year — one aggregation computes both "
    "(no second pass); dims broadcast, facts shuffle on join keys",
    tags=("q4", "join", "agg", "tpch"),
)
def market_share(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").where(F.col("p_type") == "ECONOMY")
    l = load(spark, sf, "lineitem")
    s = load(spark, sf, "supplier")
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    n1 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    r = load(spark, sf, "region").where(F.col("r_name") == "AMERICA")
    vol = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    base = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("n1_key") == c.c_nationkey)
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n1_region"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast(DEC)
    return base.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_1", F.col("volume"))
                .otherwise(zero)
            ).cast("double")
            / F.sum("volume").cast("double")
        )
        .cast("double")
        .alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# TPC-H Q9-style: profit by supplier nation and order year
# ---------------------------------------------------------------------------
@register(
    "product_profit",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))
                    - CAST(p.p_retailprice * l.l_quantity
                           AS DECIMAL(18,4))) AS DOUBLE) AS profit
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
    description="TPC-H Q9-style profit (revenue minus cost proxy) by "
    "supplier nation and year; part filter pushes into the scan, the "
    "filtered part key set broadcasts into the lineitem join. The part "
    "predicate is '%red%' because generated p_name values are "
    "'<adj> <noun>' with 'red' among the adjectives (TPC-H's 'green' "
    "matches nothing here and made the oracle check vacuous).",
    tags=("q4", "join", "agg", "tpch"),
)
def product_profit(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").where(F.col("p_name").like("%red%"))
    l = load(spark, sf, "lineitem")
    s = load(spark, sf, "supplier")
    o = load(spark, sf, "orders")
    n = load(spark, sf, "nation")
    profit = _dec(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ) - _dec(F.col("p_retailprice") * F.col("l_quantity"))
    return (
        l.join(
            F.broadcast(p.select("p_partkey", "p_retailprice")),
            l.l_partkey == F.col("p_partkey"),
        )
        .join(s, s.s_suppkey == l.l_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q15-style: suppliers achieving the maximum quarterly revenue
# ---------------------------------------------------------------------------
@register(
    "top_supplier_revenue",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    description="TPC-H Q15-style top supplier: the quarterly revenue CTE is "
    "computed once and reused for both the join and the max (Spark reuses "
    "the exchange; no view DDL needed)",
    tags=("q4", "join", "agg", "subquery", "tpch"),
)
def top_supplier_revenue(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01 00:00:00")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01 00:00:00")))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("double")
        .alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf, "supplier")
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .join(
            F.broadcast(top),
            F.col("total_revenue") == F.col("mx"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# TPC-H Q16-style: distinct supplier count per part attribute bucket
# ---------------------------------------------------------------------------
@register(
    "part_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_size IN (5, 15, 25, 35, 45)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    description="TPC-H Q16-style supplier diversity per (brand, type, "
    "size): count-distinct compiles to a two-stage partial/final aggregate "
    "after the broadcast part join — no per-group set materialization",
    tags=("q4", "join", "agg", "distinct", "tpch"),
)
def part_supplier_counts(spark: SparkSession, sf: str) -> DataFrame:
    p = load(spark, sf, "part").where(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_size").isin(5, 15, 25, 35, 45))
    )
    l = load(spark, sf, "lineitem")
    return (
        l.join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
            l.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Window ranking family: ntile / percent_rank / cume_dist in one pass
# ---------------------------------------------------------------------------
@register(
    "window_rank_family",
    oracle="""
    WITH r AS (
      SELECT c_custkey, c_nationkey,
             ntile(4) OVER w AS bal_quartile,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY c_nationkey) AS cnt
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey
                   ORDER BY c_acctbal ASC, c_custkey ASC)
    )
    SELECT c_custkey, c_nationkey, bal_quartile,
           CASE WHEN cnt = 1 THEN CAST(0 AS BIGINT)
                ELSE CAST((rn - 1) * 1000000 AS BIGINT) // (cnt - 1)
           END AS pct_rank_ppm,
           CAST(rn * 1000000 AS BIGINT) // cnt AS cume_ppm
    FROM r
    """,
    description="ranking-window family (ntile/percent_rank/cume_dist) "
    "sharing ONE window spec — a single sort within each partition "
    "computes all three. The custkey tiebreak makes the order TOTAL, so "
    "percent_rank == (rownum-1)/(n-1) and cume_dist == rownum/n exactly "
    "— emitted as integer ppm from rank/count windows because the raw "
    "doubles land on round-half midpoints (k/n = 0.0640625 at sf0.1) "
    "where Spark HALF_UP and DuckDB disagree in the 6th decimal",
    tags=("window", "rank"),
)
def window_rank_family(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    n = F.count("*").over(Window.partitionBy("c_nationkey"))
    rn = F.row_number().over(w)
    return (
        load(spark, sf, "customer")
        .select(
            "c_custkey",
            "c_nationkey",
            F.ntile(4).over(w).alias("bal_quartile"),
            rn.alias("rn"),
            n.alias("cnt"),
        )
        .select(
            "c_custkey",
            "c_nationkey",
            "bal_quartile",
            # cast rn BEFORE the multiply: row_number is int32, and
            # rn * 1000000 overflows at rn > 2147 (ANSI raises — found
            # live by the r7 10x scaling battery on 6k-row partitions)
            F.when(F.col("cnt") == 1, F.lit(0).cast("long"))
            .otherwise(
                F.expr(
                    "cast(rn - 1 as bigint) * 1000000 div (cnt - 1)"
                )
            )
            .alias("pct_rank_ppm"),
            F.expr("cast(rn as bigint) * 1000000 div cnt").alias(
                "cume_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Time-series: forward fill (last non-null carried forward per entity)
# ---------------------------------------------------------------------------
@register(
    "forward_fill_timeseries",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id
                   ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
    FROM events
    WHERE user_id < 100
    """,
    description="time-series forward fill: carry each user's last purchase "
    "value across subsequent events (IGNORE NULLS running last_value) — "
    "one partition-sort window, the gap-fill shape sensor/market data needs",
    tags=("window", "timeseries"),
)
def forward_fill_timeseries(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return (
        load(spark, sf, "events")
        .where(F.col("user_id") < 100)
        .select(
            "event_id",
            "user_id",
            F.last(purchase_val, ignorenulls=True)
            .over(w)
            .alias("last_purchase_value"),
        )
    )


# ---------------------------------------------------------------------------
# Time-series: rolling z-score anomaly flags
# ---------------------------------------------------------------------------
@register(
    "rolling_zscore_anomalies",
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, value,
             count(*)   OVER win AS n,
             sum(value) OVER win AS s,
             sum(value * value) OVER win AS sq
      FROM events
      WINDOW win AS (PARTITION BY user_id
                     ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id,
           round((value - s / n)
                 / sqrt((sq - s * s / n) / (n - 1)), 4) AS zscore
    FROM w
    WHERE n >= 10
      AND (sq - s * s / n) / (n - 1) > 1e-12
      AND abs((value - s / n)
              / sqrt((sq - s * s / n) / (n - 1))) > 3.0
    """,
    description="rolling z-score anomaly detection: mean/std over the "
    "trailing 20 events per user from explicit windowed sums (identical "
    "accumulation on both engines — no engine-specific variance kernel), "
    "flag |z| > 3. The metric-outlier shape for pipeline monitoring",
    tags=("window", "timeseries", "quality"),
)
def rolling_zscore_anomalies(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    win = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-19, -1)
    )
    n = F.count("*").over(win)
    s = F.sum("value").over(win)
    sq = F.sum(F.col("value") * F.col("value")).over(win)
    base = load(spark, sf, "events").select(
        "event_id",
        "user_id",
        "value",
        n.alias("n"),
        s.alias("s"),
        sq.alias("sq"),
    )
    var = (F.col("sq") - F.col("s") * F.col("s") / F.col("n")) / (
        F.col("n") - 1
    )
    z = (F.col("value") - F.col("s") / F.col("n")) / F.sqrt(var)
    return (
        base.where((F.col("n") >= 10) & (var > 1e-12) & (F.abs(z) > 3.0))
        .select("event_id", "user_id", F.round(z, 4).alias("zscore"))
    )


@register(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
      FROM events GROUP BY user_id
    ), c AS (
      SELECT e.user_id,
             min(CASE WHEN e.event_type = 'click' AND e.ts > v.t_view
                 THEN e.ts END) AS t_click,
             any_value(v.t_view) AS t_view
      FROM events e JOIN v ON e.user_id = v.user_id
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id,
             min(CASE WHEN e.event_type = 'purchase' AND e.ts > c.t_click
                 THEN e.ts END) AS t_purchase,
             any_value(c.t_view) AS t_view,
             any_value(c.t_click) AS t_click
      FROM events e JOIN c ON e.user_id = c.user_id
      GROUP BY e.user_id
    )
    SELECT CAST(count(t_view) AS BIGINT) AS stage_view,
           CAST(count(t_click) AS BIGINT) AS stage_click,
           CAST(count(t_purchase) AS BIGINT) AS stage_purchase,
           round(CAST(count(t_purchase) AS DOUBLE)
                 / nullif(count(t_view), 0), 6) AS view_to_purchase_rate
    FROM p
    """,
    description="ordered funnel view→click→purchase: first view, first "
    "click strictly after it, first purchase strictly after that — the "
    "product-analytics ordered-sequence count. Two user-keyed joins "
    "(AQE-sized); each stage is one conditional min aggregate, so the "
    "event table is scanned 3x but never self-joined row-to-row",
    tags=("events", "funnel"),
)
def funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    v = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        )
    )
    c = (
        ev.join(v, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).alias("t_click"),
            F.any_value("t_view").alias("t_view"),
        )
    )
    p = (
        ev.join(c, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).alias("t_purchase"),
            F.any_value("t_view").alias("t_view"),
            F.any_value("t_click").alias("t_click"),
        )
    )
    return p.agg(
        F.count("t_view").alias("stage_view"),
        F.count("t_click").alias("stage_click"),
        F.count("t_purchase").alias("stage_purchase"),
        F.round(
            F.count("t_purchase").cast("double")
            / F.nullif(F.count("t_view"), F.lit(0)),
            6,
        ).alias("view_to_purchase_rate"),
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort FROM events
      GROUP BY user_id
    ), user_days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', f.cohort, u.d) AS INT) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM user_days u JOIN firsts f ON u.user_id = f.user_id
    WHERE date_diff('day', f.cohort, u.d) <= 7
    GROUP BY 1, 2
    """,
    description="cohort retention: users grouped by first-activity day, "
    "distinct active users per (cohort, day-offset<=7). (user, day) is "
    "deduplicated BEFORE the cohort join, so the join and aggregate touch "
    "user-day granularity, not raw events",
    tags=("events", "retention"),
)
def retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort")
    )
    user_days = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    off = F.datediff(F.col("d"), F.col("cohort"))
    return (
        user_days.join(firsts, "user_id")
        .where(off <= 7)
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            off.cast("int").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "user_path_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(count(*) AS BIGINT) AS n
    FROM ordered WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
    description="behavioral path mining: per-user consecutive event-type "
    "transition counts (the Markov-chain edge table). One shuffle by user "
    "for the lead window, one aggregate; ordering ties broken by event_id "
    "so both engines see identical successor assignments",
    tags=("events", "window"),
)
def user_path_transitions(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        load(spark, sf, "events")
        .select(
            "user_id",
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )


@register(
    "events_ohlc_downsample",
    oracle="""
    WITH b AS (
      SELECT user_id, event_id, value, ts,
             CAST(floor(epoch(ts) / 21600) AS BIGINT) AS bucket
      FROM events
    ), rn AS (
      SELECT *,
             row_number() OVER (PARTITION BY user_id, bucket
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, bucket
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM b
    )
    SELECT user_id, bucket,
           round(max(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
           round(max(value), 4) AS high,
           round(min(value), 4) AS low,
           round(max(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
           CAST(count(*) AS BIGINT) AS n_events
    FROM rn GROUP BY user_id, bucket
    """,
    description="time-series OHLC downsampling: 6-hour buckets per user "
    "with open/high/low/close of the value series — one window pass for "
    "the first/last ranks (deterministic event_id tiebreak), one "
    "aggregate. The standard metric-downsample shape for long-retention "
    "storage",
    tags=("events", "timeseries"),
)
def events_ohlc_downsample(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select(
        "user_id",
        "event_id",
        "value",
        "ts",
        F.floor(F.unix_micros("ts") / F.lit(21_600_000_000)).alias(
            "bucket"
        ),
    )
    wa = Window.partitionBy("user_id", "bucket").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    wd = Window.partitionBy("user_id", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select(
            "user_id",
            "bucket",
            "value",
            F.row_number().over(wa).alias("rn_a"),
            F.row_number().over(wd).alias("rn_d"),
        )
        .groupBy("user_id", "bucket")
        .agg(
            F.round(
                F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 4
            ).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(
                F.max(F.when(F.col("rn_d") == 1, F.col("value"))), 4
            ).alias("close"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "segment_stats_profile",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS segment,
             CAST(c.c_acctbal AS DECIMAL(18,2)) AS x,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), sums AS (
      SELECT segment,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * x) AS DOUBLE) AS sxx,
             CAST(sum(y * y) AS DOUBLE) AS syy,
             CAST(sum(x * y) AS DOUBLE) AS sxy
      FROM j GROUP BY segment
    )
    SELECT segment, n,
           round((sxy - sx * sy / n) / (n - 1), 4) AS covar,
           round((sxy - sx * sy / n)
                 / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)),
                 6) AS corr,
           round(sqrt((sxx - sx * sx / n) / (n - 1)), 4) AS stddev_x,
           round(sqrt((syy - sy * sy / n) / (n - 1)), 4) AS stddev_y
    FROM sums
    """,
    description="statistical profile per market segment: covariance, "
    "correlation, stddevs of (account balance, order total) — computed "
    "from EXACT decimal sums (cast-then-multiply keeps products exact; "
    "only the final derived stats drop to double), so the result is "
    "bit-identical across engines and across partition orders, unlike "
    "built-in corr()/covar_samp() whose float accumulation is "
    "order-dependent. One join + one aggregate; all sums partial-agg",
    tags=("aggregation", "statistics"),
)
def segment_stats_profile(spark: SparkSession, sf: str) -> DataFrame:
    j = (
        load(spark, sf, "orders")
        .join(
            load(spark, sf, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_acctbal").cast("decimal(18,2)").alias("x"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
        )
    )
    sums = j.groupBy("segment").agg(
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov_num = sxy - sx * sy / n
    return sums.select(
        "segment",
        "n",
        F.round(cov_num / (n - 1), 4).alias("covar"),
        F.round(
            cov_num
            / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)),
            6,
        ).alias("corr"),
        F.round(F.sqrt((sxx - sx * sx / n) / (n - 1)), 4).alias(
            "stddev_x"
        ),
        F.round(F.sqrt((syy - sy * sy / n) / (n - 1)), 4).alias(
            "stddev_y"
        ),
    )


@register(
    "sql_api_orders_by_nation",
    oracle="""
    SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    description="the spark.sql() entry path: identical ANSI SQL text runs "
    "on temp views over the same tables (every other registry entry uses "
    "the DataFrame API; this one proves the SQL surface end to end — "
    "Catalyst plans both identically)",
    tags=("sql-api", "join"),
)
def sql_api_orders_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    for t in ("orders", "customer", "nation"):
        load(spark, sf, t).createOrReplaceTempView(f"sqldemo_{t}")
    return spark.sql(
        """
        SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_orders
        FROM sqldemo_orders o
        JOIN sqldemo_customer c ON o.o_custkey = c.c_custkey
        JOIN sqldemo_nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


@register(
    "small_qty_part_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
               / count(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.2 * pa.avg_qty
    """,
    description="TPC-H Q17-style: revenue lost to small-quantity orders of "
    "one brand's parts — the correlated per-part average decorrelates into "
    "one partial-aggregated groupBy whose (partkey, avg) table joins back "
    "by key; the brand filter broadcasts. Exact decimal sums, one double "
    "division at the end",
    tags=("q4", "join", "agg", "subquery", "tpch"),
)
def small_qty_part_revenue(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    p = load(spark, sf, "part").where(F.col("p_brand") == "Brand#1")
    # per-part averages only for the brand's parts (semi-join first): the
    # unfiltered groupBy would aggregate and ship ~50x more rows than the
    # join can ever use; non-brand rows never survive it, so the result —
    # and the oracle — are unchanged
    pa = (
        l.join(
            F.broadcast(p.select("p_partkey")),
            l.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(
            (
                F.sum(_dec(F.col("l_quantity"))).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty")
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(pa), "l_partkey")
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(_dec(F.col("l_extendedprice"))).cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "part_value_share",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             sum(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(18,4))) AS val
      FROM lineitem GROUP BY l_partkey
    ), tot AS (SELECT sum(val) AS t FROM pv)
    SELECT l_partkey AS partkey, CAST(val AS DOUBLE) AS part_value
    FROM pv, tot
    WHERE CAST(val AS DOUBLE) > 0.0006 * CAST(t AS DOUBLE)
    """,
    description="TPC-H Q11-style: parts whose revenue exceeds a fraction "
    "of TOTAL corpus revenue — the global-total scalar subquery becomes a "
    "one-row broadcast cross join against the per-part aggregate (which "
    "Spark computes once; the total folds the same shuffle output)",
    tags=("q4", "agg", "subquery", "tpch"),
)
def part_value_share(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    pv = l.groupBy("l_partkey").agg(
        F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "val"
        )
    )
    tot = pv.agg(F.sum("val").alias("t"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .where(
            F.col("val").cast("double") > 0.0006 * F.col("t").cast("double")
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("val").cast("double").alias("part_value"),
        )
    )


@register(
    "disjunctive_predicate_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_type = 'PROMO' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 45)
    """,
    description="TPC-H Q19-style: revenue under a 3-arm disjunction mixing "
    "both join sides — the part-only conjuncts cannot pre-filter either "
    "side alone, so the disjunction evaluates post-join on a broadcast "
    "hash join (never a cartesian); exact decimal sum emitted as double",
    tags=("q4", "join", "agg", "tpch"),
)
def disjunctive_predicate_revenue(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    p = load(spark, sf, "part")
    q = F.col("l_quantity")
    arm1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & q.between(1, 20)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & q.between(10, 30)
    )
    arm3 = (
        (F.col("p_type") == "PROMO")
        & F.col("p_size").between(20, 50)
        & q.between(20, 45)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .where(arm1 | arm2 | arm3)
        .agg(
            F.sum(
                _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "concurrent_intervals_sweep",
    oracle="""
    WITH iv AS (
      SELECT event_type, ts AS s, ts + INTERVAL 300 SECOND AS e FROM events
    ), pts AS (
      SELECT event_type, s AS t, 1 AS d FROM iv
      UNION ALL SELECT event_type, e AS t, -1 AS d FROM iv
    ), byt AS (
      SELECT event_type, t, sum(d) AS d FROM pts GROUP BY event_type, t
    ), run AS (
      SELECT event_type, t,
             sum(d) OVER (PARTITION BY event_type ORDER BY t) AS conc
      FROM byt
    ), mx AS (
      SELECT event_type, max(conc) AS peak FROM run GROUP BY event_type
    )
    SELECT r.event_type, CAST(m.peak AS BIGINT) AS peak_concurrency,
           CAST(epoch_us(min(r.t)) AS BIGINT) AS first_peak_us
    FROM run r JOIN mx m ON m.event_type = r.event_type AND r.conc = m.peak
    GROUP BY r.event_type, m.peak
    """,
    description="interval-overlap sweep: treat each event as a 5-minute "
    "active interval and find per-type peak concurrency (and when it "
    "first occurs) via the +1/-1 boundary-point sweep — boundaries "
    "pre-aggregated per timestamp so the running sum is over UNIQUE "
    "(type, t) keys (deterministic under any partition order), one "
    "shuffle for the window, one for the peak join. The sweep scales as "
    "one pass over 2n boundary points; no interval self-join ever "
    "materializes.",
    tags=("window", "events", "interval"),
)
def concurrent_intervals_sweep(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf, "events").select(
        "event_type",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 300 SECONDS")).alias("e"),
    )
    pts = ev.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("d")
    ).unionByName(
        ev.select("event_type", F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    byt = pts.groupBy("event_type", "t").agg(F.sum("d").alias("d"))
    run = byt.withColumn(
        "conc",
        F.sum("d").over(Window.partitionBy("event_type").orderBy("t")),
    )
    mx = run.groupBy("event_type").agg(F.max("conc").alias("peak"))
    return (
        run.join(mx, "event_type")
        .where(F.col("conc") == F.col("peak"))
        .groupBy("event_type", "peak")
        .agg(F.unix_micros(F.min("t")).alias("first_peak_us"))
        .select(
            "event_type",
            F.col("peak").cast("long").alias("peak_concurrency"),
            F.col("first_peak_us").cast("long"),
        )
    )


@register(
    "purchase_attribution_last_touch",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
             CASE WHEN event_type <> 'purchase' THEN event_type END
               AS channel,
             CASE WHEN event_type <> 'purchase' THEN epoch_us(ts) END
               AS ch_us,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(value AS DECIMAL(18,4)) END AS rev
      FROM events
    ), carried AS (
      SELECT user_id, ts, event_id, is_p, rev,
             last_value(channel IGNORE NULLS) OVER w AS last_channel,
             last_value(ch_us IGNORE NULLS) OVER w AS last_ch_us
      FROM tagged
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY ts, is_p, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT coalesce(CASE WHEN epoch_us(ts) - last_ch_us
                              <= CAST(3600000000 AS BIGINT)
                         THEN last_channel END, 'direct')
             AS attributed_channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(rev) AS DOUBLE) AS attributed_revenue
    FROM carried WHERE is_p = 1
    GROUP BY 1
    """,
    description="last-touch purchase attribution: each purchase credits "
    "the user's most recent non-purchase event within a 1-hour lookback "
    "('direct' when none) — the marketing-attribution primitive. "
    "Scale-safe shape: ONE user-keyed window over the unioned event "
    "stream with last(ignorenulls) carry-forward (no per-purchase "
    "subquery, no self-join, no row explosion); same-instant channel "
    "events sort before the purchase so a click at the purchase "
    "timestamp gets credit in both engines (is_p tiebreak, then "
    "event_id).",
    tags=("events", "window", "attribution"),
)
def purchase_attribution_last_touch(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    is_p = (F.col("event_type") == "purchase").cast("int")
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        is_p.alias("is_p"),
        F.when(
            F.col("event_type") != "purchase", F.col("event_type")
        ).alias("channel"),
        F.when(
            F.col("event_type") != "purchase", F.unix_micros("ts")
        ).alias("ch_us"),
        F.when(
            F.col("event_type") == "purchase", _dec(F.col("value"))
        ).alias("rev"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.select(
        "user_id",
        "ts",
        "is_p",
        "rev",
        F.last("channel", ignorenulls=True).over(w).alias("last_channel"),
        F.last("ch_us", ignorenulls=True).over(w).alias("last_ch_us"),
    )
    attributed = F.coalesce(
        F.when(
            F.unix_micros("ts") - F.col("last_ch_us")
            <= 3600 * 1_000_000,
            F.col("last_channel"),
        ),
        F.lit("direct"),
    )
    return (
        carried.where(F.col("is_p") == 1)
        .groupBy(attributed.alias("attributed_channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("rev").cast("double").alias("attributed_revenue"),
        )
    )


@register(
    "rolling_active_users",
    oracle="""
    WITH user_days AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ), span AS (
      SELECT date_trunc('day', min(ts)) AS d0,
             date_trunc('day', max(ts)) AS d1 FROM events
    ), days AS (
      SELECT t AS day FROM span,
             LATERAL unnest(generate_series(d0, d1, INTERVAL 1 DAY)) g(t)
    )
    SELECT strftime(days.day, '%Y-%m-%d') AS day,
           CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
    FROM days JOIN user_days u
      ON u.d <= days.day AND u.d >= days.day - INTERVAL 6 DAY
    GROUP BY days.day
    """,
    description="rolling 7-day active users (WAU) per day — EXACT "
    "sliding-window distinct, which no window frame can express "
    "(count(distinct) over a range frame is unsupported and sketch "
    "merges are approximate). Shape: events collapse to distinct "
    "(user, day) FIRST, the day spine comes from a one-row min/max "
    "aggregate and broadcasts, and the band join expands each user-day "
    "into at most 7 spine rows — cost is 7x user-days, never 7x events.",
    tags=("events", "timeseries", "window"),
)
def rolling_active_users(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    user_days = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    span = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    days = span.select(
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    joined = user_days.join(
        F.broadcast(days),
        (F.col("d") <= F.col("day"))
        & (F.col("d") >= F.col("day") - F.expr("INTERVAL 6 DAYS")),
    )
    return (
        joined.groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("wau"))
    )


@register(
    "supplier_concentration_hhi",
    oracle="""
    WITH rev AS (
      SELECT n.n_regionkey, n.n_name,
             sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(18,4))) AS nation_rev
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY n.n_regionkey, n.n_name
    ), tot AS (
      SELECT n_regionkey, sum(nation_rev) AS region_rev FROM rev
      GROUP BY n_regionkey
    ), shares AS (
      -- floor() before every decimal->BIGINT cast: Spark CAST truncates
      -- toward zero while DuckDB rounds half-up, so an unfloored cast
      -- can differ by 1 at quantization boundaries
      SELECT r.n_regionkey,
             CAST(CAST(floor(r.nation_rev * 1000000) AS BIGINT)
                  // CAST(floor(t.region_rev) AS BIGINT) AS BIGINT)
               AS share_ppm
      FROM rev r JOIN tot t USING (n_regionkey)
    )
    SELECT reg.r_name AS region,
           CAST(count(*) AS BIGINT) AS n_nations,
           round(CAST(sum(share_ppm * share_ppm) AS DOUBLE) / 1e12, 6)
             AS hhi,
           round(CAST(max(share_ppm) AS DOUBLE) / 1e6, 6) AS top_share
    FROM shares JOIN region reg ON reg.r_regionkey = shares.n_regionkey
    GROUP BY reg.r_name
    """,
    description="supply-concentration risk: Herfindahl-Hirschman index "
    "of nation revenue shares within each region (1/n = perfectly "
    "spread, 1.0 = single-source) plus the largest single share — the "
    "procurement-risk dashboard. Shares quantize to integer parts-per-"
    "million BEFORE squaring, so the HHI sum is exact integer "
    "arithmetic in both engines (a float share^2 reduction would be "
    "partition-order-dependent); revenue itself aggregates as exact "
    "decimals. Two small shuffles (nation agg, region rollup), dims "
    "broadcast.",
    tags=("agg", "join", "tpch"),
)
def supplier_concentration_hhi(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    s = load(spark, sf, "supplier")
    n = load(spark, sf, "nation")
    reg = load(spark, sf, "region")
    rev = (
        l.join(s, s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy("n_regionkey", "n_name")
        .agg(
            F.sum(
                _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("nation_rev")
        )
    )
    tot = rev.groupBy("n_regionkey").agg(
        F.sum("nation_rev").alias("region_rev")
    )
    # floor() before BIGINT casts mirrors the oracle: both engines then
    # truncate identically (Spark CAST truncates, DuckDB rounds half-up)
    shares = rev.join(tot, "n_regionkey").select(
        "n_regionkey",
        F.expr(
            "CAST(CAST(floor(nation_rev * 1000000) AS BIGINT)"
            " div CAST(floor(region_rev) AS BIGINT) AS BIGINT)"
        ).alias("share_ppm"),
    )
    return (
        shares.join(
            F.broadcast(reg),
            reg.r_regionkey == shares.n_regionkey,
        )
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.round(
                F.sum(F.col("share_ppm") * F.col("share_ppm")).cast(
                    "double"
                )
                / 1e12,
                6,
            ).alias("hhi"),
            F.round(F.max("share_ppm").cast("double") / 1e6, 6).alias(
                "top_share"
            ),
        )
    )


@register(
    "fulfillment_latency_profile",
    oracle="""
    WITH lat AS (
      SELECT o.o_orderpriority,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS delay_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY delay_days) AS p50,
           percentile_cont(0.9) WITHIN GROUP (ORDER BY delay_days) AS p90,
           percentile_cont(0.99) WITHIN GROUP (ORDER BY delay_days) AS p99,
           CAST(max(delay_days) AS BIGINT) AS worst
    FROM lat GROUP BY o_orderpriority
    """,
    description="fulfillment-latency SLO profile: exact p50/p90/p99/max "
    "order-to-ship delay in days per order priority — the operations "
    "dashboard for 'are urgent orders actually shipping faster'. One FK "
    "join + one grouped exact-percentile aggregate (Spark percentile() "
    "matches percentile_cont bit-for-bit on integer day deltas); "
    "per-priority groups are huge but the aggregate state is the sorted "
    "digest Spark maintains per group, and the cardinality is 5.",
    tags=("agg", "join", "tpch", "percentile"),
)
def fulfillment_latency_profile(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    lat = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").alias("delay_days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.expr("percentile(delay_days, 0.5)").alias("p50"),
        F.expr("percentile(delay_days, 0.9)").alias("p90"),
        F.expr("percentile(delay_days, 0.99)").alias("p99"),
        F.max("delay_days").cast("long").alias("worst"),
    )


@register(
    "basket_part_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2,
             count(*) AS support
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ), freq AS (
      SELECT l_partkey, count(*) AS n FROM items GROUP BY l_partkey
    ), totals AS (
      SELECT count(DISTINCT l_orderkey) AS n_orders FROM items
    )
    SELECT p.p1, p.p2, CAST(p.support AS BIGINT) AS support,
           round(CAST(p.support AS DOUBLE) * t.n_orders
                 / (CAST(f1.n AS DOUBLE) * CAST(f2.n AS DOUBLE)), 6)
             AS lift
    FROM pairs p
    JOIN freq f1 ON f1.l_partkey = p.p1
    JOIN freq f2 ON f2.l_partkey = p.p2
    CROSS JOIN totals t
    ORDER BY p.support DESC, p.p1 ASC, p.p2 ASC
    LIMIT 50
    """,
    description="market-basket affinity: co-purchased part pairs within "
    "an order with support counts and lift (observed co-occurrence over "
    "the independence expectation) — the association-mining primitive "
    "behind 'frequently bought together'. The self-join keys on "
    "l_orderkey, so pair expansion is bounded by items-per-order squared "
    "(single digits in order data), never all-parts x all-parts; the "
    "top-50 is orderBy+limit (TakeOrdered). Lift arithmetic is one "
    "double expression written identically in both engines.",
    tags=("join", "agg", "tpch", "basket"),
)
def basket_part_pairs(spark: SparkSession, sf: str) -> DataFrame:
    li = (
        load(spark, sf, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("p2")
    )
    pairs = (
        a.join(
            b,
            (F.col("ok") == F.col("ok2")) & (F.col("p1") < F.col("p2")),
        )
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    freq = li.groupBy(F.col("l_partkey")).agg(F.count(F.lit(1)).alias("n"))
    totals = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    f1 = freq.select(F.col("l_partkey").alias("p1"), F.col("n").alias("n1"))
    f2 = freq.select(F.col("l_partkey").alias("p2"), F.col("n").alias("n2"))
    return (
        pairs.join(f1, "p1")
        .join(f2, "p2")
        .crossJoin(F.broadcast(totals))
        .select(
            "p1",
            "p2",
            F.col("support").cast("long"),
            F.round(
                F.col("support").cast("double")
                * F.col("n_orders")
                / (F.col("n1").cast("double") * F.col("n2").cast("double")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("support").desc(), F.col("p1").asc(), F.col("p2").asc())
        .limit(50)
    )


@register(
    "cohort_ltv_curve",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             min(year(o_orderdate) * 12 + month(o_orderdate)) AS m0
      FROM orders GROUP BY o_custkey
    ), tagged AS (
      SELECT o.o_custkey,
             f.m0,
             (year(o.o_orderdate) * 12 + month(o.o_orderdate)) - f.m0
               AS month_offset,
             CAST(o.o_totalprice AS DECIMAL(18,4)) AS rev
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    ), per_cell AS (
      SELECT m0, month_offset,
             count(DISTINCT o_custkey) AS active_customers,
             sum(rev) AS revenue
      FROM tagged GROUP BY m0, month_offset
    )
    SELECT concat(CAST((m0 - 1) // 12 AS VARCHAR), '-',
                  lpad(CAST((m0 - 1) % 12 + 1 AS VARCHAR), 2, '0'))
             AS cohort_month,
           CAST(month_offset AS INT) AS month_offset,
           CAST(active_customers AS BIGINT) AS active_customers,
           CAST(revenue AS DOUBLE) AS revenue,
           CAST(sum(revenue) OVER (PARTITION BY m0 ORDER BY month_offset
                                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             AS cum_revenue
    FROM per_cell
    """,
    description="cohort lifetime-value curves: customers grouped by "
    "first-order month, exact-decimal revenue per (cohort, months-since-"
    "first) cell plus the cumulative LTV running sum — the retention-"
    "economics table growth teams plot. Month arithmetic is integer "
    "(year*12+month), so offsets are engine-exact; the cumulative "
    "window runs over per-cohort CELLS (cohorts x offsets, thousands "
    "at most), not orders, and the cell aggregate is the only "
    "order-scale shuffle.",
    tags=("agg", "window", "cohort", "tpch"),
)
def cohort_ltv_curve(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders")
    mcol = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    firsts = o.groupBy("o_custkey").agg(F.min(mcol).alias("m0"))
    tagged = o.join(firsts, "o_custkey").select(
        "o_custkey",
        "m0",
        (mcol - F.col("m0")).alias("month_offset"),
        _dec(F.col("o_totalprice")).alias("rev"),
    )
    per_cell = tagged.groupBy("m0", "month_offset").agg(
        F.countDistinct("o_custkey").alias("active_customers"),
        F.sum("rev").alias("revenue"),
    )
    wc = (
        Window.partitionBy("m0")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cohort_label = F.concat(
        ((F.col("m0") - 1) / 12).cast("int").cast("string"),
        F.lit("-"),
        F.lpad(
            ((F.col("m0") - 1) % 12 + 1).cast("int").cast("string"), 2, "0"
        ),
    )
    return per_cell.select(
        cohort_label.alias("cohort_month"),
        F.col("month_offset").cast("int"),
        F.col("active_customers").cast("long"),
        F.col("revenue").cast("double"),
        F.sum("revenue").over(wc).cast("double").alias("cum_revenue"),
    )


@register(
    "dau_wau_stickiness",
    oracle="""
    WITH user_days AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ), span AS (
      SELECT date_trunc('day', min(ts)) AS d0,
             date_trunc('day', max(ts)) AS d1 FROM events
    ), days AS (
      SELECT t AS day FROM span,
             LATERAL unnest(generate_series(d0, d1, INTERVAL 1 DAY)) g(t)
    ), wau AS (
      SELECT days.day, count(DISTINCT u.user_id) AS wau
      FROM days JOIN user_days u
        ON u.d <= days.day AND u.d >= days.day - INTERVAL 6 DAY
      GROUP BY days.day
    ), dau AS (
      SELECT d AS day, count(*) AS dau FROM user_days GROUP BY d
    )
    SELECT strftime(w.day, '%Y-%m-%d') AS day,
           CAST(coalesce(d.dau, 0) AS BIGINT) AS dau,
           CAST(w.wau AS BIGINT) AS wau,
           round(CAST(coalesce(d.dau, 0) AS DOUBLE) / w.wau, 6)
             AS stickiness
    FROM wau w LEFT JOIN dau d ON d.day = w.day
    """,
    description="DAU/WAU stickiness per day — the engagement-intensity "
    "ratio product teams track (what fraction of the weekly audience "
    "shows up daily). DAU is one aggregate over distinct (user, day); "
    "WAU reuses the 7-day band-join shape (cost 7x user-days); the "
    "ratio join is day-keyed and tiny. Days with zero activity still "
    "appear (dau=0) whenever a neighbor keeps their WAU window "
    "non-empty.",
    tags=("events", "timeseries", "window"),
)
def dau_wau_stickiness(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    user_days = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    span = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    days = span.select(
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    wau = (
        user_days.join(
            F.broadcast(days),
            (F.col("d") <= F.col("day"))
            & (F.col("d") >= F.col("day") - F.expr("INTERVAL 6 DAYS")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = user_days.groupBy(F.col("d").alias("day")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    return (
        wau.join(dau, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
            F.col("wau").cast("long"),
            F.round(
                F.coalesce("dau", F.lit(0)).cast("double") / F.col("wau"),
                6,
            ).alias("stickiness"),
        )
    )


@register(
    "purchase_attribution_linear",
    oracle="""
    WITH ch AS (
      SELECT user_id, event_type AS channel, epoch_us(ts) AS ch_us
      FROM events WHERE event_type <> 'purchase'
    ), pu AS (
      SELECT user_id, event_id, epoch_us(ts) AS p_us,
             CAST(CAST(value AS DECIMAL(18,4)) * 1000000 AS BIGINT)
               AS rev_micros
      FROM events WHERE event_type = 'purchase'
    ), touches AS (
      SELECT pu.user_id, pu.event_id, pu.rev_micros, ch.channel
      FROM pu JOIN ch
        ON ch.user_id = pu.user_id
       AND ch.ch_us <= pu.p_us
       AND ch.ch_us >= pu.p_us - CAST(3600000000 AS BIGINT)
    ), sized AS (
      SELECT *, count(*) OVER (PARTITION BY user_id, event_id) AS n
      FROM touches
    ), credited AS (
      SELECT channel, rev_micros // n AS credit_micros, user_id, event_id
      FROM sized
      UNION ALL
      SELECT 'direct' AS channel, rev_micros AS credit_micros,
             user_id, event_id
      FROM pu
      WHERE NOT EXISTS (SELECT 1 FROM touches t
                        WHERE t.user_id = pu.user_id
                          AND t.event_id = pu.event_id)
    )
    SELECT channel,
           CAST(count(DISTINCT (user_id, event_id)) AS BIGINT)
             AS n_purchases,
           round(CAST(sum(credit_micros) AS DOUBLE) / 1000000.0, 4)
             AS attributed_revenue
    FROM credited GROUP BY channel
    """,
    description="linear multi-touch attribution: every purchase splits "
    "its revenue EQUALLY across all channel events in its 1-hour "
    "lookback (purchases with none credit 'direct'). Credit arithmetic "
    "is exact integer micro-units (rev·1e6 integer-divided by the touch "
    "count), so sums are partition-order-independent in both engines — "
    "a double division would make the rollup a float reduction whose "
    "last-ulp depends on aggregation order. The per-user range join is "
    "bounded by activity density per hour (user-keyed equi-join plus a "
    "time band, never a cartesian).",
    tags=("events", "attribution", "join"),
)
def purchase_attribution_linear(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    # both sides derive from the same scan: rename the join key on the
    # channel side so the condition references two distinct attributes
    # (a bare ch.user_id == pu.user_id self-join predicate relies on
    # Spark's dataset-id disambiguation and warns)
    ch = ev.where(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("ch_user_id"),
        F.col("event_type").alias("channel"),
        F.unix_micros("ts").alias("ch_us"),
    )
    pu = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("p_us"),
        (_dec(F.col("value")) * 1_000_000)
        .cast("long")
        .alias("rev_micros"),
    )
    touches = pu.join(
        ch,
        (F.col("ch_user_id") == F.col("user_id"))
        & (F.col("ch_us") <= F.col("p_us"))
        & (F.col("ch_us") >= F.col("p_us") - F.lit(3_600_000_000)),
    ).select("user_id", "event_id", "rev_micros", "channel")
    sized = touches.withColumn(
        "n",
        F.count(F.lit(1)).over(
            Window.partitionBy("user_id", "event_id")
        ),
    )
    credited = sized.select(
        "channel",
        F.expr("rev_micros div n").alias("credit_micros"),
        "user_id",
        "event_id",
    ).unionByName(
        pu.join(
            touches.select("user_id", "event_id").distinct(),
            ["user_id", "event_id"],
            "left_anti",
        ).select(
            F.lit("direct").alias("channel"),
            F.col("rev_micros").alias("credit_micros"),
            "user_id",
            "event_id",
        )
    )
    return credited.groupBy("channel").agg(
        F.countDistinct("user_id", "event_id").alias("n_purchases"),
        F.round(
            F.sum("credit_micros").cast("double") / 1_000_000.0, 4
        ).alias("attributed_revenue"),
    )


@register(
    "purchase_attribution_u_shaped",
    oracle="""
    WITH ch AS (
      SELECT user_id AS ch_user_id, event_id AS ch_event_id,
             event_type AS channel, epoch_us(ts) AS ch_us
      FROM events WHERE event_type <> 'purchase'
    ), pu AS (
      SELECT user_id, event_id, epoch_us(ts) AS p_us,
             CAST(CAST(value AS DECIMAL(18,4)) * 1000000 AS BIGINT)
               AS rev_micros
      FROM events WHERE event_type = 'purchase'
    ), touches AS (
      SELECT pu.user_id, pu.event_id, pu.rev_micros, ch.channel,
             row_number() OVER (PARTITION BY pu.user_id, pu.event_id
                                ORDER BY ch.ch_us, ch.ch_event_id)
               AS rn,
             count(*) OVER (PARTITION BY pu.user_id, pu.event_id) AS n
      FROM pu JOIN ch
        ON ch.ch_user_id = pu.user_id
       AND ch.ch_us <= pu.p_us
       AND ch.ch_us >= pu.p_us - CAST(3600000000 AS BIGINT)
    ), credited AS (
      SELECT channel, user_id, event_id,
             CASE
               WHEN n = 1 THEN rev_micros
               WHEN n = 2 THEN rev_micros // 2
               WHEN rn = 1 OR rn = n THEN (rev_micros * 2) // 5
               ELSE (rev_micros - 2 * ((rev_micros * 2) // 5)) // (n - 2)
             END AS credit_micros
      FROM touches
      UNION ALL
      SELECT 'direct', user_id, event_id, rev_micros
      FROM pu
      WHERE NOT EXISTS (SELECT 1 FROM touches t
                        WHERE t.user_id = pu.user_id
                          AND t.event_id = pu.event_id)
    )
    SELECT channel,
           CAST(count(DISTINCT (user_id, event_id)) AS BIGINT)
             AS n_purchases,
           round(CAST(sum(credit_micros) AS DOUBLE) / 1000000.0, 4)
             AS attributed_revenue
    FROM credited GROUP BY channel
    """,
    description="U-shaped (position-based) attribution: first and last "
    "touch in the 1-hour lookback each take 40%, the middles split the "
    "remaining 20% (1 touch takes all, 2 split evenly) — the standard "
    "position-weighted model between last-touch and linear. Positions "
    "are tiebroken by channel event_id so equal-timestamp touches rank "
    "identically cross-engine, and every split is exact integer "
    "micro-unit arithmetic (floor), so the rollup never depends on "
    "float aggregation order.",
    tags=("events", "attribution", "join", "window"),
)
def purchase_attribution_u_shaped(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    ch = ev.where(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("ch_user_id"),
        F.col("event_id").alias("ch_event_id"),
        F.col("event_type").alias("channel"),
        F.unix_micros("ts").alias("ch_us"),
    )
    pu = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("p_us"),
        (_dec(F.col("value")) * 1_000_000)
        .cast("long")
        .alias("rev_micros"),
    )
    wt = Window.partitionBy("user_id", "event_id")
    touches = (
        pu.join(
            ch,
            (F.col("ch_user_id") == F.col("user_id"))
            & (F.col("ch_us") <= F.col("p_us"))
            & (F.col("ch_us") >= F.col("p_us") - F.lit(3_600_000_000)),
        )
        .select(
            "user_id", "event_id", "rev_micros", "channel",
            "ch_us", "ch_event_id",
        )
        .withColumn(
            "rn",
            F.row_number().over(wt.orderBy("ch_us", "ch_event_id")),
        )
        .withColumn("n", F.count(F.lit(1)).over(wt))
    )
    fl = F.expr("(rev_micros * 2) div 5")
    credit = (
        F.when(F.col("n") == 1, F.col("rev_micros"))
        .when(F.col("n") == 2, F.expr("rev_micros div 2"))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), fl)
        .otherwise(
            F.expr(
                "(rev_micros - 2 * ((rev_micros * 2) div 5)) div (n - 2)"
            )
        )
    )
    credited = touches.select(
        "channel", "user_id", "event_id", credit.alias("credit_micros")
    ).unionByName(
        pu.join(
            touches.select("user_id", "event_id").distinct(),
            ["user_id", "event_id"],
            "left_anti",
        ).select(
            F.lit("direct").alias("channel"),
            "user_id",
            "event_id",
            F.col("rev_micros").alias("credit_micros"),
        )
    )
    return credited.groupBy("channel").agg(
        F.countDistinct("user_id", "event_id").alias("n_purchases"),
        F.round(
            F.sum("credit_micros").cast("double") / 1_000_000.0, 4
        ).alias("attributed_revenue"),
    )


@register(
    "purchase_attribution_time_decay",
    oracle="""
    WITH ch AS (
      SELECT user_id AS ch_user_id, event_type AS channel,
             epoch_us(ts) AS ch_us
      FROM events WHERE event_type <> 'purchase'
    ), pu AS (
      SELECT user_id, event_id, epoch_us(ts) AS p_us,
             CAST(CAST(value AS DECIMAL(18,4)) * 1000000 AS BIGINT)
               AS rev_micros
      FROM events WHERE event_type = 'purchase'
    ), touches AS (
      SELECT pu.user_id, pu.event_id, pu.rev_micros, ch.channel,
             CASE (pu.p_us - ch.ch_us) // CAST(900000000 AS BIGINT)
               WHEN 0 THEN 16 WHEN 1 THEN 8 WHEN 2 THEN 4
               WHEN 3 THEN 2 ELSE 1
             END AS w
      FROM pu JOIN ch
        ON ch.ch_user_id = pu.user_id
       AND ch.ch_us <= pu.p_us
       AND ch.ch_us >= pu.p_us - CAST(3600000000 AS BIGINT)
    ), weighted AS (
      SELECT *, sum(w) OVER (PARTITION BY user_id, event_id) AS sum_w
      FROM touches
    ), credited AS (
      SELECT channel, user_id, event_id,
             (rev_micros * w) // sum_w AS credit_micros
      FROM weighted
      UNION ALL
      SELECT 'direct', user_id, event_id, rev_micros
      FROM pu
      WHERE NOT EXISTS (SELECT 1 FROM touches t
                        WHERE t.user_id = pu.user_id
                          AND t.event_id = pu.event_id)
    )
    SELECT channel,
           CAST(count(DISTINCT (user_id, event_id)) AS BIGINT)
             AS n_purchases,
           round(CAST(sum(credit_micros) AS DOUBLE) / 1000000.0, 4)
             AS attributed_revenue
    FROM credited GROUP BY channel
    """,
    description="time-decay attribution: touches in the 1-hour lookback "
    "weighted by recency with a 15-minute half-life — the standard "
    "recency-biased model completing the last/linear/U-shaped family. "
    "Decay is stepped per 15-min bucket with exact dyadic weights "
    "(16/8/4/2/1), so shares are integer micro-unit arithmetic end to "
    "end: no pow()/exp() whose last ulp differs across engines, and "
    "rollups never depend on float aggregation order. Same single "
    "user-keyed band join + one (user,purchase) window as the rest of "
    "the family — no self-join amplification, bounded by touches per "
    "purchase-hour.",
    tags=("events", "attribution", "join", "window"),
)
def purchase_attribution_time_decay(
    spark: SparkSession, sf: str
) -> DataFrame:
    ev = load(spark, sf, "events")
    ch = ev.where(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("ch_user_id"),
        F.col("event_type").alias("channel"),
        F.unix_micros("ts").alias("ch_us"),
    )
    pu = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("p_us"),
        (_dec(F.col("value")) * 1_000_000)
        .cast("long")
        .alias("rev_micros"),
    )
    bucket = F.expr("(p_us - ch_us) div 900000000")
    w = (
        F.when(bucket == 0, 16)
        .when(bucket == 1, 8)
        .when(bucket == 2, 4)
        .when(bucket == 3, 2)
        .otherwise(1)
        .cast("long")
    )
    touches = pu.join(
        ch,
        (F.col("ch_user_id") == F.col("user_id"))
        & (F.col("ch_us") <= F.col("p_us"))
        & (F.col("ch_us") >= F.col("p_us") - F.lit(3_600_000_000)),
    ).select("user_id", "event_id", "rev_micros", "channel", w.alias("w"))
    weighted = touches.withColumn(
        "sum_w",
        F.sum("w").over(Window.partitionBy("user_id", "event_id")),
    )
    credited = weighted.select(
        "channel",
        "user_id",
        "event_id",
        F.expr("(rev_micros * w) div sum_w").alias("credit_micros"),
    ).unionByName(
        pu.join(
            touches.select("user_id", "event_id").distinct(),
            ["user_id", "event_id"],
            "left_anti",
        ).select(
            F.lit("direct").alias("channel"),
            "user_id",
            "event_id",
            F.col("rev_micros").alias("credit_micros"),
        )
    )
    return credited.groupBy("channel").agg(
        F.countDistinct("user_id", "event_id").alias("n_purchases"),
        F.round(
            F.sum("credit_micros").cast("double") / 1_000_000.0, 4
        ).alias("attributed_revenue"),
    )


@register(
    "session_first_touch_attribution",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(value AS DECIMAL(18,4)) END AS rev,
             CASE WHEN epoch_us(ts)
                       - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                       > CAST(1800000000 AS BIGINT)
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING)
                  AS session_id
      FROM ordered
    ), entry AS (
      SELECT *, first_value(event_type) OVER (
               PARTITION BY user_id, session_id
               ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS entry_type
      FROM sessions
    )
    SELECT entry_type AS entry_channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(rev) AS DOUBLE) AS attributed_revenue
    FROM entry WHERE event_type = 'purchase'
    GROUP BY entry_type
    """,
    description="session first-touch attribution: every purchase credits "
    "the ENTRY event type of its own session (30-min inactivity gaps) — "
    "the first-touch companion to last-touch lookback attribution, and "
    "fully deterministic cross-engine because every window carries "
    "(ts, event_id) tiebreaks (a min_by-over-range formulation would "
    "tie-break arbitrarily on equal timestamps). One user-keyed shuffle "
    "shared by all three windows; purchases entering their own session "
    "self-attribute as 'purchase' (direct).",
    tags=("events", "window", "attribution", "session"),
)
def session_first_touch_attribution(
    spark: SparkSession, sf: str
) -> DataFrame:
    ev = load(spark, sf, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wu))
    new_session = (
        F.when(
            F.lag("ts").over(wu).isNull()
            | (gap_us > F.lit(1_800_000_000)),
            1,
        ).otherwise(0)
    )
    sessions = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.col("event_type") == "purchase", _dec(F.col("value"))
        ).alias("rev"),
        new_session.alias("new_session"),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    entry = sessions.withColumn(
        "entry_type", F.first("event_type").over(ws)
    )
    return (
        entry.where(F.col("event_type") == "purchase")
        .groupBy(F.col("entry_type").alias("entry_channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("rev").cast("double").alias("attributed_revenue"),
        )
    )


@register(
    "time_series_cv_splits",
    oracle="""
    WITH d0 AS (
      SELECT date_trunc('day', min(ts)) AS d0 FROM events
    ), daily AS (
      SELECT CAST(date_diff('day', d0.d0, date_trunc('day', ts)) AS INT)
               AS day_idx,
             count(*) AS n,
             sum(CAST(value AS DECIMAL(18,4))) AS v
      FROM events, d0
      GROUP BY 1
    ), folds AS (
      SELECT unnest(generate_series(0, 3)) AS fold
    ), assigned AS (
      SELECT f.fold, d.day_idx, d.n, d.v,
             CASE WHEN d.day_idx < 6 * (f.fold + 1) THEN 'train'
                  WHEN d.day_idx < 6 * (f.fold + 2) THEN 'test'
                  END AS split
      FROM daily d, folds f
    )
    SELECT CAST(fold AS INT) AS fold, split,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(sum(v) AS DOUBLE) AS total_value,
           CAST(min(day_idx) AS INT) AS first_day,
           CAST(max(day_idx) AS INT) AS last_day
    FROM assigned WHERE split IS NOT NULL
    GROUP BY fold, split
    """,
    description="expanding-window time-series cross-validation splits "
    "(forecast-model backtesting without leakage): fold i trains on days "
    "[0, 6(i+1)) and tests on [6(i+1), 6(i+2)) — every test window is "
    "strictly after its training window, later folds absorb earlier test "
    "windows, and the fold boundaries derive from the corpus' own first "
    "day. Scale shape: the raw scan collapses to <=span-days daily rows "
    "FIRST; the fold expansion (x4) happens on that tiny aggregate, "
    "never on raw events.",
    tags=("events", "timeseries", "sampling"),
)
def time_series_cv_splits(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    d0 = ev.agg(F.date_trunc("day", F.min("ts")).alias("d0"))
    daily = (
        ev.crossJoin(F.broadcast(d0))
        .groupBy(
            F.datediff(F.date_trunc("day", "ts"), F.col("d0"))
            .cast("int")
            .alias("day_idx")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec(F.col("value"))).alias("v"),
        )
    )
    folds = spark.range(4).select(F.col("id").cast("int").alias("fold"))
    split = (
        F.when(F.col("day_idx") < 6 * (F.col("fold") + 1), "train")
        .when(F.col("day_idx") < 6 * (F.col("fold") + 2), "test")
    )
    assigned = daily.crossJoin(F.broadcast(folds)).select(
        "fold", "day_idx", "n", "v", split.alias("split")
    )
    return (
        assigned.where(F.col("split").isNotNull())
        .groupBy("fold", "split")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.sum("v").cast("double").alias("total_value"),
            F.min("day_idx").cast("int").alias("first_day"),
            F.max("day_idx").cast("int").alias("last_day"),
        )
    )


@register(
    "hierarchical_time_rollup",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             count(*) AS n,
             sum(CAST(value AS DECIMAL(18,4))) AS v
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), daily AS (
      SELECT event_type, date_trunc('day', h) AS d,
             sum(n) AS n, sum(v) AS v, count(*) AS n_hours
      FROM hourly GROUP BY event_type, date_trunc('day', h)
    ), monthly AS (
      SELECT event_type, date_trunc('month', d) AS m,
             sum(n) AS n, sum(v) AS v,
             sum(n_hours) AS n_hours, count(*) AS n_days
      FROM daily GROUP BY event_type, date_trunc('month', d)
    )
    SELECT event_type, strftime(m, '%Y-%m') AS month,
           CAST(n AS BIGINT) AS n_events,
           CAST(v AS DOUBLE) AS total_value,
           CAST(n_hours AS BIGINT) AS n_hours,
           CAST(n_days AS BIGINT) AS n_days
    FROM monthly
    """,
    description="hypertable-style hierarchical rollup: hour buckets "
    "aggregate from raw events ONCE, then day aggregates from hour and "
    "month from day — each coarser level reads the previous aggregate, "
    "never the raw table (the continuous-aggregate refresh shape: at "
    "100 TB the raw scan happens exactly once and every level above is "
    "bounded by bucket counts). Decimal value sums stay exact through "
    "every level; one double emission at the end.",
    tags=("agg", "rollup", "timeseries"),
)
def hierarchical_time_rollup(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec(F.col("value"))).alias("v"),
    )
    daily = hourly.groupBy(
        "event_type", F.date_trunc("day", "h").alias("d")
    ).agg(
        F.sum("n").alias("n"),
        F.sum("v").alias("v"),
        F.count(F.lit(1)).alias("n_hours"),
    )
    monthly = daily.groupBy(
        "event_type", F.date_trunc("month", "d").alias("m")
    ).agg(
        F.sum("n").alias("n"),
        F.sum("v").alias("v"),
        F.sum("n_hours").alias("n_hours"),
        F.count(F.lit(1)).alias("n_days"),
    )
    return monthly.select(
        "event_type",
        F.date_format("m", "yyyy-MM").alias("month"),
        F.col("n").cast("long").alias("n_events"),
        F.col("v").cast("double").alias("total_value"),
        F.col("n_hours").cast("long"),
        F.col("n_days").cast("long"),
    )


@register(
    "user_value_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT user_id,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
      FROM events GROUP BY user_id
    ), dev AS (
      SELECT e.user_id, m.med, abs(e.value - m.med) AS d
      FROM events e JOIN med m USING (user_id)
    ), mad AS (
      SELECT user_id,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY d) AS mad
      FROM dev GROUP BY user_id
    )
    SELECT d.user_id,
           round(max(d.med), 6) AS med,
           round(max(mad.mad), 6) AS mad,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN d.d > 3 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad USING (user_id)
    GROUP BY d.user_id
    """,
    description="robust per-user outlier screen: median + median absolute "
    "deviation (exact interpolated percentiles — identical IEEE semantics "
    "to percentile_cont), events beyond 3 MAD counted. MAD tolerates the "
    "heavy tails that wreck mean/stddev z-scores. Two grouped exact "
    "percentiles + key joins; at 100 TB swap percentile() for "
    "approx_percentile (t-digest) — the composition is unchanged.",
    tags=("agg", "robust-stats", "events"),
)
def user_value_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select("user_id", "value")
    med = ev.groupBy("user_id").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(med, "user_id").select(
        "user_id", "med", F.abs(F.col("value") - F.col("med")).alias("d")
    )
    mad = dev.groupBy("user_id").agg(
        F.expr("percentile(d, 0.5)").alias("mad")
    )
    return (
        dev.join(mad, "user_id")
        .groupBy("user_id")
        .agg(
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (F.col("d") > 3 * F.col("mad")).cast("int")
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )


@register(
    "value_histogram",
    oracle="""
    WITH b AS (
      SELECT min(value) AS lo, max(value) AS hi FROM events
    ), bucketed AS (
      SELECT CASE WHEN hi = lo THEN 0
                  ELSE least(CAST(floor((value - lo)
                                        / ((hi - lo) / 10.0)) AS INT), 9)
             END AS bucket,
             lo, hi
      FROM events, b
    )
    SELECT bucket,
           round(min(lo) + bucket * ((min(hi) - min(lo)) / 10.0), 6)
             AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n
    FROM bucketed GROUP BY bucket
    """,
    description="equi-width histogram (10 buckets) over a measure: the "
    "range scalar broadcasts from a one-row min/max aggregate, bucketing "
    "is a pure projection, one shuffle for the counts — the profile "
    "primitive behind optimizer NDV/range stats and data-quality drift "
    "checks. The top bucket is closed (least(...,9)) so hi lands in "
    "bucket 9 on both engines.",
    tags=("agg", "histogram", "profile"),
)
def value_histogram(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select("value")
    rng = ev.agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / 10.0
    # hi == lo guard: 0/0 is NaN in Spark but NULL in DuckDB (and
    # least() treats them differently) — a constant column is exactly
    # what a profiler meets, so pin it to bucket 0 on both engines
    bucket = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("value") - F.col("lo")) / width).cast("int"),
            F.lit(9),
        )
    )
    return (
        ev.crossJoin(F.broadcast(rng))
        .select(bucket.alias("bucket"), "lo", "hi")
        .groupBy("bucket")
        .agg(
            F.round(
                F.min("lo")
                + F.col("bucket") * ((F.min("hi") - F.min("lo")) / 10.0),
                6,
            ).alias("bucket_lo"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "top_event_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS trigram,
           CAST(count(*) AS BIGINT) AS n
    FROM seq
    WHERE event_type IS NOT NULL AND e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, trigram ASC
    LIMIT 20
    """,
    description="sequential pattern mining: top-20 three-step event-type "
    "sequences per user timeline (lead windows over a unique (ts, "
    "event_id) order, so results are deterministic under any "
    "parallelism). One window shuffle on user_id + one count shuffle; "
    "n-gram mining over billions of events stays two shuffles at any "
    "scale.",
    tags=("window", "events", "sequence"),
)
def top_event_trigrams(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load(spark, sf, "events").select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.where(
            F.col("event_type").isNotNull()
            & F.col("e2").isNotNull()
            & F.col("e3").isNotNull()
        )
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("trigram")
        )
        .groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("trigram").asc())
        .limit(20)
    )


@register(
    "event_gap_days",
    oracle="""
    WITH span AS (
      SELECT date_trunc('day', min(ts)) AS d0,
             date_trunc('day', max(ts)) AS d1
      FROM events
    ), bucket_users AS (
      SELECT DISTINCT user_id FROM events WHERE user_id % 29 = 3
    ), spine AS (
      SELECT u.user_id, t AS day
      FROM span,
           LATERAL unnest(generate_series(d0, d1,
                                          INTERVAL 1 DAY)) AS g(t),
           bucket_users u
    ), actual AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    )
    SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day
    FROM spine s LEFT JOIN actual a
      ON a.user_id = s.user_id AND a.day = s.day
    WHERE a.day IS NULL
    """,
    description="date-spine gap detection: generate the full (user x day) "
    "grid between the corpus' first and last day for a hash bucket of "
    "users and anti-join the observed activity days — per-entity "
    "silent-outage detection. The spine comes from a one-row min/max "
    "aggregate (sequence + explode, no stored calendar table) crossed "
    "with the audited user bucket, so spine size is bounded by (bucket "
    "users x span days) at any corpus scale; the bucket predicate keeps "
    "the audit a fixed fraction of users. Per-user gaps exist at every "
    "scale factor (events-per-user is scale-invariant in the generated "
    "data, unlike the global type x day grid which is gap-free).",
    tags=("events", "timeseries", "quality"),
)
def event_gap_days(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    span = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    days = span.select(
        F.explode(
            F.sequence(
                F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY")
            )
        ).alias("day")
    )
    bucket_users = (
        ev.where(F.col("user_id") % 29 == 3).select("user_id").distinct()
    )
    spine = days.crossJoin(bucket_users)
    actual = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    return (
        spine.join(actual, ["user_id", "day"], "left_anti")
        .select(
            "user_id", F.date_format("day", "yyyy-MM-dd").alias("day")
        )
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             sum(CAST(o_totalprice AS DECIMAL(18,4))) AS monetary
      FROM orders GROUP BY o_custkey
    ), q AS (
      SELECT
        percentile_cont(0.25) WITHIN GROUP
          (ORDER BY epoch_us(last_order)) AS r25,
        percentile_cont(0.50) WITHIN GROUP
          (ORDER BY epoch_us(last_order)) AS r50,
        percentile_cont(0.75) WITHIN GROUP
          (ORDER BY epoch_us(last_order)) AS r75,
        percentile_cont(0.25) WITHIN GROUP (ORDER BY frequency) AS f25,
        percentile_cont(0.50) WITHIN GROUP (ORDER BY frequency) AS f50,
        percentile_cont(0.75) WITHIN GROUP (ORDER BY frequency) AS f75,
        percentile_cont(0.25) WITHIN GROUP
          (ORDER BY CAST(monetary AS DOUBLE)) AS m25,
        percentile_cont(0.50) WITHIN GROUP
          (ORDER BY CAST(monetary AS DOUBLE)) AS m50,
        percentile_cont(0.75) WITHIN GROUP
          (ORDER BY CAST(monetary AS DOUBLE)) AS m75
      FROM rfm
    ), scored AS (
      SELECT custkey, frequency,
             CAST(monetary AS DOUBLE) AS monetary_d, monetary,
             CAST(CASE WHEN epoch_us(last_order) > r75 THEN 4
                       WHEN epoch_us(last_order) > r50 THEN 3
                       WHEN epoch_us(last_order) > r25 THEN 2
                       ELSE 1 END AS INT) AS r,
             CAST(CASE WHEN frequency > f75 THEN 4
                       WHEN frequency > f50 THEN 3
                       WHEN frequency > f25 THEN 2
                       ELSE 1 END AS INT) AS f,
             CAST(CASE WHEN CAST(monetary AS DOUBLE) > m75 THEN 4
                       WHEN CAST(monetary AS DOUBLE) > m50 THEN 3
                       WHEN CAST(monetary AS DOUBLE) > m25 THEN 2
                       ELSE 1 END AS INT) AS m
      FROM rfm, q
    )
    SELECT r, f, m,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(CAST(monetary AS DECIMAL(18,4))) AS DOUBLE), 4)
             AS segment_revenue
    FROM scored GROUP BY r, f, m
    """,
    description="RFM segmentation: per-customer recency/frequency/monetary "
    "quartile bands via exact percentile THRESHOLDS (one 9-value aggregate "
    "broadcast back, band by value comparison) rolled up to the 4x4x4 "
    "segment grid with exact-decimal revenue. Threshold banding replaces "
    "ntile — three global single-partition window sorts become one "
    "all-reduce aggregate, so the plan scales to any customer count. "
    "Semantics: band k means the value is above the (k-1) quartile "
    "threshold (ties at a boundary fall to the lower band — deterministic "
    "cross-engine because Spark percentile() matches percentile_cont "
    "bit-for-bit on these inputs); unlike ntile, equal values always land "
    "in the same band, at the cost of not forcing exactly-equal band "
    "populations under heavy ties.",
    tags=("window", "agg", "segmentation"),
)
def customer_rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    rfm = (
        load(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(_dec(F.col("o_totalprice"))).alias("monetary"),
        )
    )
    rfm = rfm.withColumn("rec_us", F.unix_micros("last_order"))
    qs = rfm.agg(
        F.expr("percentile(rec_us, 0.25)").alias("r25"),
        F.expr("percentile(rec_us, 0.50)").alias("r50"),
        F.expr("percentile(rec_us, 0.75)").alias("r75"),
        F.expr("percentile(frequency, 0.25)").alias("f25"),
        F.expr("percentile(frequency, 0.50)").alias("f50"),
        F.expr("percentile(frequency, 0.75)").alias("f75"),
        F.expr("percentile(CAST(monetary AS DOUBLE), 0.25)").alias("m25"),
        F.expr("percentile(CAST(monetary AS DOUBLE), 0.50)").alias("m50"),
        F.expr("percentile(CAST(monetary AS DOUBLE), 0.75)").alias("m75"),
    )

    def _band(v, q25, q50, q75):
        return (
            F.when(v > F.col(q75), 4)
            .when(v > F.col(q50), 3)
            .when(v > F.col(q25), 2)
            .otherwise(1)
            .cast("int")
        )

    # banding compares the DOUBLE projection (thresholds are doubles),
    # but revenue sums the EXACT decimal — a decimal→double→decimal
    # roundtrip would diverge from the oracle once per-customer monetary
    # exceeds double's 15-16 significant digits
    scored = rfm.crossJoin(F.broadcast(qs)).select(
        "custkey",
        "frequency",
        F.col("monetary"),
        _band(F.col("rec_us"), "r25", "r50", "r75").alias("r"),
        _band(F.col("frequency"), "f25", "f50", "f75").alias("f"),
        _band(F.col("monetary").cast("double"), "m25", "m50", "m75").alias(
            "m"
        ),
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.sum("monetary").cast("double"), 4
            ).alias("segment_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# key-skew diagnostics: the "should this join be salted?" report
# ---------------------------------------------------------------------------
_SKEW_SQL_BLOCK = """
      SELECT '{name}' AS key_name,
             CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(CAST(max(cnt) AS HUGEINT) * 1000000 // sum(cnt)
                  AS BIGINT) AS top1_share_ppm,
             CAST((SELECT CAST(sum(t.cnt) AS HUGEINT) FROM
                    (SELECT count(*) AS cnt FROM lineitem
                     GROUP BY {col}
                     ORDER BY cnt DESC, {col} ASC LIMIT 10) t)
                  * 1000000 // sum(cnt) AS BIGINT) AS top10_share_ppm,
             CAST(sum(CAST(cnt AS HUGEINT) * cnt) * 1000000000
                  // (CAST(sum(cnt) AS HUGEINT) * sum(cnt))
                  AS BIGINT) AS hhi_ppb
      FROM (SELECT {col}, count(*) AS cnt
            FROM lineitem GROUP BY {col})
"""


@register(
    "key_skew_report",
    oracle=" UNION ALL ".join(
        _SKEW_SQL_BLOCK.format(name=c, col=c)
        for c in ("l_orderkey", "l_partkey", "l_suppkey")
    ),
    description="join-key skew diagnostics over the fact table: per key "
    "column, the distinct-key count, the hottest key's row share, the "
    "top-10 keys' combined share, and the Herfindahl concentration of "
    "the key distribution — the numbers that decide whether a join on "
    "that key needs salting or AQE skew handling before it ships at "
    "scale. Every share is an integer cross-multiplication (ppm/ppb "
    "floor division) computed with decimal(38,0) headroom so the HHI "
    "numerator cannot wrap int64 at any row count (mirrored HUGEINT "
    "casts in the oracle), no float ratios. Scale: one map-side-"
    "combined groupBy per key column; top1/n_keys/hhi are plain "
    "aggregates over the per-key counts and top10 is a distributed "
    "TakeOrdered(10) whose 10-row sum broadcast-crosses the one-row "
    "stats aggregate — ZERO windows, nothing single-partition ever "
    "sees more than numPartitions*10 rows (the r6 verdict's "
    "unpartitioned rank window over all distinct keys is gone)",
    tags=("agg", "report", "skew"),
)
def key_skew_report(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    parts = []
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        cnts = li.groupBy(col).agg(F.count("*").alias("cnt"))
        # distributed top-k: per-partition top-10 then a bounded merge
        # of numPartitions*10 rows (TakeOrderedAndProject), never a
        # global sort or an unpartitioned window
        top10 = (
            cnts.orderBy(F.col("cnt").desc(), F.col(col).asc())
            .limit(10)
            .agg(
                F.sum("cnt").cast("decimal(19,0)").alias("top10_cnt")
            )
        )
        stats = cnts.agg(
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.count("*").cast("bigint").alias("n_keys"),
            F.max("cnt").cast("bigint").alias("top1_cnt"),
            # decimal(19,0)^2 -> decimal(38,0): sum cannot wrap int64
            # the way sum(cnt*cnt) would (ADVICE r6: ~3.6e18 at sf1)
            F.sum(
                F.col("cnt").cast("decimal(19,0)")
                * F.col("cnt").cast("decimal(19,0)")
            ).alias("sq_sum"),
        )
        parts.append(
            stats.crossJoin(F.broadcast(top10)).select(
                F.lit(col).alias("key_name"),
                "n_rows",
                "n_keys",
                F.expr(
                    "cast(cast(top1_cnt as decimal(19,0)) * 1000000"
                    " div n_rows as bigint)"
                ).alias("top1_share_ppm"),
                F.expr(
                    "cast(top10_cnt * 1000000 div n_rows as bigint)"
                ).alias("top10_share_ppm"),
                F.expr(
                    "cast(sq_sum * 1000000000"
                    " div (cast(n_rows as decimal(19,0))"
                    " * cast(n_rows as decimal(19,0))) as bigint)"
                ).alias("hhi_ppb"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_SALT_SQL_BLOCK = """
      SELECT '{name}' AS key_name,
             CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(cnt) AS BIGINT) AS top1_cnt,
             CAST(least(
               (CAST(max(cnt) AS HUGEINT) * 200 + sum(cnt) - 1)
                 // sum(cnt),
               200) AS BIGINT) AS salt_factor,
             CAST(CASE WHEN (CAST(max(cnt) AS HUGEINT) * 200
                             + sum(cnt) - 1) // sum(cnt) >= 2
                       THEN 1 ELSE 0 END AS BIGINT) AS needs_salt
      FROM (SELECT {col}, count(*) AS cnt
            FROM lineitem GROUP BY {col})
"""


@register(
    "salt_plan_report",
    oracle=" UNION ALL ".join(
        _SALT_SQL_BLOCK.format(name=c, col=c)
        for c in ("l_orderkey", "l_partkey", "l_suppkey")
    ),
    description="the actionable companion to key_skew_report: per fact "
    "join key, the recommended salt factor = ceil(top1_cnt * P / "
    "n_rows) capped at P (P=200, a conventional shuffle-partition "
    "budget) — the number of sub-tasks the hottest key needs so no "
    "single reducer processes more than an even 1/P share — and a "
    "needs_salt flag (factor >= 2). All integer ceil-division via "
    "cross-multiplication with decimal headroom (top1*200 wraps int64 "
    "around 4.6e16 rows otherwise). Scale: one map-side-combined "
    "groupBy per key column feeding a plain scalar aggregate — no "
    "window, no sort, nothing single-partition beyond one row",
    tags=("agg", "report", "skew"),
)
def salt_plan_report(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    parts = []
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        cnts = li.groupBy(col).agg(F.count("*").alias("cnt"))
        parts.append(
            cnts.agg(
                F.lit(col).alias("key_name"),
                F.sum("cnt").cast("bigint").alias("n_rows"),
                F.count("*").cast("bigint").alias("n_keys"),
                F.max("cnt").cast("bigint").alias("top1_cnt"),
                F.expr(
                    "cast(least((cast(max(cnt) as decimal(19,0)) * 200"
                    " + sum(cnt) - 1) div sum(cnt), 200) as bigint)"
                ).alias("salt_factor"),
                F.expr(
                    "cast(case when (cast(max(cnt) as decimal(19,0))"
                    " * 200 + sum(cnt) - 1) div sum(cnt) >= 2"
                    " then 1 else 0 end as bigint)"
                ).alias("needs_salt"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# M4+ : table statistics collection as queries (ANALYZE-equivalent; the
# numbers a cost-based optimizer and a maintenance planner consume)
# ---------------------------------------------------------------------------
_STATS_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "analyze_column_stats",
    oracle="""
    SELECT key_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nulls,
           CAST(count(DISTINCT v) AS BIGINT) AS ndv,
           min(v) AS min_val,
           max(v) AS max_val
    FROM (
      SELECT 'l_quantity' AS key_name, l_quantity AS v FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT 'l_tax', l_tax FROM lineitem
    )
    GROUP BY key_name
    """,
    description="ANALYZE TABLE-equivalent column statistics over the fact "
    "table's measure columns: row/null counts, exact NDV, min/max — the "
    "inputs a cost-based optimizer's cardinality estimates and this "
    "engine's own stats-based pruning (sinks/table.py file stats) feed "
    "on. Unpivoted to one row per column so new columns are rows, not "
    "schema changes. Scale: one scan unpivoted 4x; count(distinct) per "
    "column is the honest exact form (the HLL variant for sketch-"
    "tolerant callers is approx_distinct).",
    tags=("stats", "agg", "report"),
)
def analyze_column_stats(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    stack_expr = "stack({}, {}) AS (key_name, v)".format(
        len(_STATS_COLS),
        ", ".join(f"'{c}', {c}" for c in _STATS_COLS),
    )
    return (
        l.select(F.expr(stack_expr))
        .groupBy("key_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("v").isNull().cast("int"))
            .cast("long")
            .alias("n_nulls"),
            F.countDistinct("v").cast("long").alias("ndv"),
            F.min("v").alias("min_val"),
            F.max("v").alias("max_val"),
        )
    )


@register(
    "column_equiwidth_histogram",
    oracle="""
    WITH bounds AS (
      SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
      FROM lineitem
    ),
    binned AS (
      SELECT least(CAST(floor((l_extendedprice - lo) * 8.0 / (hi - lo))
                        AS BIGINT), 7) AS bin,
             lo, hi
      FROM lineitem, bounds
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(lo + bin * ((hi - lo) / 8.0)) AS bin_lo
    FROM binned
    GROUP BY bin
    """,
    description="8-bin equi-width histogram of l_extendedprice — the "
    "optimizer-statistics shape for range-selectivity estimation and "
    "the skew diagnostic for range partitioning. The bin expression "
    "((v - lo) * 8 / (hi - lo), floored, clamped to 7) is written "
    "identically on both engines so IEEE double arithmetic matches "
    "bit-for-bit. Scale: one min/max aggregate broadcast back over one "
    "scan — two passes, no shuffle wider than the 8-row result.",
    tags=("stats", "agg", "report"),
)
def column_equiwidth_histogram(spark: SparkSession, sf: str) -> DataFrame:
    l = load(spark, sf, "lineitem")
    bounds = l.agg(
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    binned = l.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor(
                (F.col("l_extendedprice") - F.col("lo"))
                * 8.0
                / (F.col("hi") - F.col("lo"))
            ).cast("long"),
            F.lit(7).cast("long"),
        ).alias("bin"),
        "lo",
        "hi",
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min(
            F.col("lo") + F.col("bin") * ((F.col("hi") - F.col("lo")) / 8.0)
        ).alias("bin_lo"),
    )
