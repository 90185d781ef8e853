"""Data-governance reports: k-anonymity audit and distribution drift.

Two monitoring surfaces a production data platform runs on every
release of a derived dataset:

- k-anonymity: after choosing the quasi-identifier (QI) columns a
  downstream consumer could join on, how many rows sit in equivalence
  classes smaller than k (re-identifiable at that k)? Exact integer
  arithmetic throughout — class sizes and ppm fractions, never floats.
- PSI (population stability index), the standard drift score between a
  reference window and the current window per segment: counts are exact
  integers with a +1 Laplace floor (zero-proof), the ln-sum is rounded
  to 6 decimals (the repo's standard absorption of float add-order
  drift), and the drift band is derived FROM the rounded value so both
  engines band identical inputs.

Reference parity: the reference has no governance surface (it is a CDC
writer); these extend the engine toward the release-gating checks a
training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import load, register

#: k thresholds audited (classes smaller than k are re-identifiable)
_KS = (2, 5, 10, 20)
_KS_SQL = "[" + ", ".join(str(k) for k in _KS) + "]"


@register(
    "k_anonymity_report",
    oracle=f"""
    WITH released AS (
      -- day-of-week via epoch days, NOT the engines' dayofweek(): Spark
      -- numbers Sun..Sat as 1..7, DuckDB as 0..6 — today the shift is
      -- bijective (classes identical), but any extension surfacing dow
      -- would silently diverge. (epoch_day + 4) % 7 with Sunday = 0 is
      -- engine-neutral (1970-01-01 was a Thursday = 4).
      SELECT event_type,
             (CAST(floor(epoch(ts) / 86400) AS BIGINT) + 4) % 7 AS dow,
             CAST(floor(value / 50) AS BIGINT) AS value_band
      FROM events
    ), classes AS (
      SELECT event_type, dow, value_band, count(*) AS class_size
      FROM released GROUP BY 1, 2, 3
    ), ks AS (
      SELECT CAST(unnest({_KS_SQL}) AS INT) AS k
    )
    SELECT ks.k,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(class_size) AS BIGINT) AS n_rows,
           CAST(min(class_size) AS BIGINT) AS min_class_size,
           CAST(sum(CASE WHEN class_size < ks.k
                         THEN class_size ELSE 0 END) AS BIGINT)
             AS rows_below_k,
           CAST(sum(CASE WHEN class_size < ks.k
                         THEN class_size ELSE 0 END) * 1000000 AS BIGINT)
             // CAST(sum(class_size) AS BIGINT) AS rows_below_k_ppm
    FROM ks CROSS JOIN classes
    GROUP BY ks.k
    """,
    description="k-anonymity audit of a released view of events: "
    "quasi-identifiers (event_type, day-of-week, value band) define "
    "equivalence classes; for each k in 2/5/10/20, how many rows sit in "
    "classes smaller than k (re-identifiable at that k) — exact integer "
    "counts and ppm. One class aggregate (map-side combined) replicated "
    "across the 4 constant thresholds; the class table is "
    "QI-cardinality-sized, so the cross join is bounded by construction.",
    tags=("governance", "privacy", "report"),
)
def k_anonymity_report(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    classes = (
        ev.select(
            "event_type",
            # engine-neutral dow — see the oracle comment
            (
                (F.floor(F.unix_micros("ts") / 86_400_000_000) + 4) % 7
            ).cast("long").alias("dow"),
            F.floor(F.col("value") / 50).cast("long").alias("value_band"),
        )
        .groupBy("event_type", "dow", "value_band")
        .agg(F.count("*").alias("class_size"))
    )
    ks = spark.createDataFrame([(k,) for k in _KS], "k int")
    below = F.sum(
        F.when(F.col("class_size") < F.col("k"), F.col("class_size"))
        .otherwise(F.lit(0))
    )
    return (
        ks.crossJoin(classes)
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_classes"),
            F.sum("class_size").cast("long").alias("n_rows"),
            F.min("class_size").cast("long").alias("min_class_size"),
            below.cast("long").alias("rows_below_k"),
            F.expr(
                "cast(sum(case when class_size < k then class_size"
                " else 0 end) * 1000000 as bigint)"
                " div cast(sum(class_size) as bigint)"
            ).alias("rows_below_k_ppm"),
        )
    )


#: fixed-width value buckets for PSI (value spans ~0-500 in the corpus;
#: fixed edges keep the bucketing engine-exact — quantile edges would
#: reintroduce cross-engine interpolation drift)
_PSI_BUCKET_W = 50
_PSI_NBUCKETS = 10
_PSI_SPLIT = "2024-01-16"


@register(
    "psi_drift_report",
    oracle=f"""
    WITH bucketed AS (
      SELECT event_type,
             CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}'
                  THEN 'ref' ELSE 'cur' END AS window_half,
             least({_PSI_NBUCKETS - 1},
                   CAST(floor(value / {_PSI_BUCKET_W}) AS BIGINT))
               AS bucket
      FROM events
    ), counts AS (
      SELECT event_type, bucket,
             sum(CASE WHEN window_half = 'ref' THEN 1 ELSE 0 END) + 1
               AS ref_n,
             sum(CASE WHEN window_half = 'cur' THEN 1 ELSE 0 END) + 1
               AS cur_n
      FROM bucketed GROUP BY 1, 2
    ), totals AS (
      SELECT event_type,
             CAST(sum(ref_n) AS DOUBLE) AS ref_t,
             CAST(sum(cur_n) AS DOUBLE) AS cur_t
      FROM counts GROUP BY 1
    ), psi AS (
      SELECT c.event_type,
             round(sum((c.cur_n / t.cur_t - c.ref_n / t.ref_t)
                       * ln((c.cur_n / t.cur_t)
                            / (c.ref_n / t.ref_t))), 6) AS psi
      FROM counts c JOIN totals t USING (event_type)
      GROUP BY c.event_type
    )
    SELECT event_type, psi,
           CASE WHEN psi < 0.1 THEN 'stable'
                WHEN psi < 0.25 THEN 'moderate'
                ELSE 'major' END AS drift_band
    FROM psi
    """,
    description="population stability index per event segment between "
    "the first and second half of the window (the standard drift score "
    "release gates alert on): fixed-width value buckets (engine-exact — "
    "quantile edges would reintroduce interpolation drift), +1 Laplace "
    "floor so empty buckets are zero-proof, exact integer counts into "
    "one ln-sum rounded to 6 decimals; the stable/moderate/major band "
    "derives from the ROUNDED value so both engines band identical "
    "inputs. One scan, two tiny aggregates.",
    tags=("governance", "drift", "report"),
)
def psi_drift_report(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    bucketed = ev.select(
        "event_type",
        F.when(
            F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp"), "ref"
        ).otherwise("cur").alias("window_half"),
        F.least(
            F.lit(_PSI_NBUCKETS - 1),
            F.floor(F.col("value") / _PSI_BUCKET_W).cast("long"),
        ).alias("bucket"),
    )
    counts = bucketed.groupBy("event_type", "bucket").agg(
        (
            F.sum(F.when(F.col("window_half") == "ref", 1).otherwise(0))
            + 1
        ).alias("ref_n"),
        (
            F.sum(F.when(F.col("window_half") == "cur", 1).otherwise(0))
            + 1
        ).alias("cur_n"),
    )
    totals = counts.groupBy("event_type").agg(
        F.sum("ref_n").cast("double").alias("ref_t"),
        F.sum("cur_n").cast("double").alias("cur_t"),
    )
    p = F.col("cur_n") / F.col("cur_t")
    q = F.col("ref_n") / F.col("ref_t")
    psi = (
        counts.join(totals, "event_type")
        .groupBy("event_type")
        .agg(F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"))
    )
    return psi.select(
        "event_type",
        "psi",
        F.when(F.col("psi") < 0.1, "stable")
        .when(F.col("psi") < 0.25, "moderate")
        .otherwise("major")
        .alias("drift_band"),
    )
