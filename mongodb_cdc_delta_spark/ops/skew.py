"""Skew-resistant join: key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains the tool when one side's hot keys are
known and the other side can be replicated — e.g. joining a 100 TB event
log against per-key dimensions where a handful of keys carry 100x median
volume. This is the standard explode-replicate pattern:

    fact side:  salt = hash(row) % n_salts          (splits each hot key)
    dim side:   replicate every row n_salts times   (one copy per salt)
    join on (key, salt)                              (shuffle is uniform)

Cost model: dim side grows n_salts-fold — only salt joins whose dim side
is small relative to the skew being removed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join fact⋈dim on ``key`` with the fact side salted ``n_salts`` ways.

    Result equals ``fact.join(dim, key, how)`` for inner/left joins (the
    replicated dim rows are de-duplicated by the salt equality)."""
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in fact.columns])) % n_salts)
    f = fact.withColumn("__salt", salt.cast("int"))
    d = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    out = f.join(d, [key, "__salt"], how)
    return out.drop("__salt")


from ..queries import load, register  # noqa: E402


@register(
    "skew_salted_join_agg",
    oracle="""
    SELECT e.event_type, count(*) AS n,
           CAST(sum(CAST(e.value * c.c_nationkey AS DECIMAL(18,4)))
                AS DOUBLE) AS weighted
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY e.event_type
    """,
    description="salted fact⋈dim join under hot-key skew: the fact side "
    "salts 16 ways and the dim replicates per salt, so the join shuffle "
    "is uniform even when one user carries 100x median volume. The oracle "
    "is the PLAIN join — salting must be result-invisible",
    tags=("join", "skew"),
)
def skew_salted_join_agg(spark, sf: str):
    events = load(spark, sf, "events")
    cust = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    joined = salted_join(
        events.withColumnRenamed("user_id", "c_custkey"),
        cust,
        key="c_custkey",
        n_salts=16,
    )
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum((F.col("value") * F.col("c_nationkey")).cast("decimal(18,4)"))
        .cast("double")
        .alias("weighted"),
    )
