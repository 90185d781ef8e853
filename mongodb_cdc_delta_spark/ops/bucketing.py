"""Bucketed co-located joins: pre-shuffle once at write time, join with
zero exchanges forever after.

The third leg of the join-scale toolkit (broadcast for small dims —
queries/relational.py star join; salting for skew — ops/skew.py; bucketing
for repeated big-big joins on a stable key). Writing both sides bucketed
by the join key with the same bucket count lets every subsequent join,
aggregation, or window on that key run shuffle-free: Spark matches bucket
specs and plans a SortMergeJoin with no Exchange on either side.

At 100 TB this converts the single most expensive recurring shuffle (fact
⋈ fact on entity id) into a one-time write-side cost."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist df as a bucketed (and bucket-sorted) managed table. The sort
    makes the downstream SortMergeJoin skip its per-task sort too."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket key — planned with no
    Exchange when bucket specs match (asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def write_dedup_bucketed(
    docs: DataFrame,
    table_name: str,
    text_col: str = "text",
    n_buckets: int = 16,
) -> None:
    """Stage a corpus for repeated shuffle-free dedup: persist bucketed by
    the normalized content hash.

    Every later exact-dedup pass (groupBy fingerprint), cross-snapshot
    dedup join, or decontamination semi-join on the fingerprint then plans
    with ZERO exchanges — at 100 TB the corpus-wide content shuffle is
    paid once at ingest instead of per run."""
    from pyspark.sql import functions as F

    with_fp = docs.withColumn(
        "fingerprint",
        F.xxhash64(F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))),
    )
    writer = (
        with_fp.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "fingerprint")
        .sortBy("fingerprint")
    )
    writer.saveAsTable(table_name)


def bucketed_exact_dedup(spark: SparkSession, table_name: str) -> DataFrame:
    """Keep the lowest doc_id per content fingerprint over a bucketed
    corpus — the aggregation consumes the bucket spec, so the plan has no
    Exchange (asserted in tests)."""
    from pyspark.sql import functions as F

    t = spark.table(table_name)
    return t.groupBy("fingerprint").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count("*").cast("long").alias("n_copies"),
    )
