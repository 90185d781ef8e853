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
