"""Deterministic sampling operators (training-data pipeline surface)."""

from __future__ import annotations

import pytest
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


class TestPackSequencesGuard:
    def test_unsharded_call_is_rejected(self, spark):
        # repo policy: no code path may build Window.partitionBy() over an
        # unbounded input via a default argument (round-4 verdict item 4)
        from mongodb_cdc_delta_spark.ops.sampling import pack_sequences
        from mongodb_cdc_delta_spark.queries import load

        docs = load(spark, "/root/testdata/sf0.001", "documents")
        with pytest.raises(ValueError, match="shard_col"):
            pack_sequences(
                docs, token_col=F.size(F.split(F.col("text"), " ")),
                budget=2048,
            )

    def test_explicit_single_partition_opt_in_still_works(self, spark):
        from mongodb_cdc_delta_spark.ops.sampling import pack_sequences

        df = spark.range(10).select(
            F.col("id").alias("doc_id"), F.lit(100).alias("n")
        )
        out = pack_sequences(
            df, token_col=F.col("n"), budget=250,
            allow_single_partition=True,
        )
        bins = {r["doc_id"]: r["bin_id"] for r in out.collect()}
        # 100 tokens each, 250 budget: docs 0,1,2 start at 0/100/200 ->
        # bin 0, doc 3 starts at 300 -> bin 1, etc.
        assert bins[0] == 0 and bins[2] == 0 and bins[3] == 1
        assert bins[9] == 900 // 250
