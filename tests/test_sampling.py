"""Deterministic sampling operators (training-data pipeline surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.ops.sampling import (
    deterministic_sample,
    sample_bucket,
    stratified_sample,
)


def test_sample_is_reproducible_and_uniform(spark):
    df = spark.range(0, 5000).select(F.col("id").alias("k"))
    s1 = deterministic_sample(df, "k", 0.10)
    s2 = deterministic_sample(df, "k", 0.10)
    ids1 = sorted(r["k"] for r in s1.collect())
    ids2 = sorted(r["k"] for r in s2.collect())
    assert ids1 == ids2  # same rows every run
    assert 0.08 <= len(ids1) / 5000 <= 0.12  # near the requested fraction
    # nested property: a 5% sample is a subset of the 10% sample
    ids5 = sorted(r["k"] for r in deterministic_sample(df, "k", 0.05).collect())
    assert set(ids5) <= set(ids1)


def test_stratified_quotas(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(4000)]
    df = spark.createDataFrame(rows, "k long, lang string")
    out = stratified_sample(
        df, key="k", strata="lang", fractions={"en": 0.5, "de": 0.1}
    )
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert 0.4 <= counts["en"] / 2000 <= 0.6
    assert 0.05 <= counts["de"] / 2000 <= 0.15
    # absent strata are dropped entirely
    df2 = df.withColumn("lang", F.lit("fr"))
    assert (
        stratified_sample(
            df2, key="k", strata="lang", fractions={"en": 0.5}
        ).count()
        == 0
    )


def test_bucket_range(spark):
    df = spark.range(0, 1000).select(sample_bucket(F.col("id")).alias("b"))
    row = df.agg(F.min("b").alias("lo"), F.max("b").alias("hi")).first()
    assert 0 <= row["lo"] and row["hi"] < 10000


class TestThreeWaySplit:
    def test_partition_is_exhaustive_and_stable(self, spark):
        from mongodb_cdc_delta_spark.ops.sampling import three_way_split
        from mongodb_cdc_delta_spark.queries import load

        docs = load(spark, "/root/testdata/sf0.01", "documents")
        a = three_way_split(docs, "doc_id").select("doc_id", "split")
        counts = {r["split"]: r["n"] for r in
                  a.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert set(counts) == {"train", "val", "test"}
        assert sum(counts.values()) == docs.count()
        # ~90/5/5 within tolerance at 500 docs
        assert counts["train"] > counts["val"] + counts["test"]
        # stable: identical assignment on recompute
        b = three_way_split(docs, "doc_id").select("doc_id", "split")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
