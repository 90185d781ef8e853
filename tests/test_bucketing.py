"""Bucketed co-located joins: correctness + the zero-shuffle plan property
that motivates them."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.ops.bucketing import bucketed_join, write_bucketed


# r11 fast-tier: moved to the slow (full-battery) lane in r11 so the default fast tier stays <15 min; this surface remains covered by the full battery and by the oracle-parity/plan-gate suites that stay in the fast lane
pytestmark = pytest.mark.slow

@pytest.fixture()
def bucketed_tables(spark):
    orders = spark.createDataFrame(
        [(i % 100, i, float(i)) for i in range(5000)],
        "cust_id long, order_id long, total double",
    )
    payments = spark.createDataFrame(
        [(i % 100, i, float(i) / 2) for i in range(3000)],
        "cust_id long, payment_id long, amount double",
    )
    write_bucketed(orders, "orders_b", "cust_id", n_buckets=8)
    write_bucketed(payments, "payments_b", "cust_id", n_buckets=8)
    yield "orders_b", "payments_b", orders, payments
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS payments_b")
    # managed-table data is removed by DROP; clear the (repo-local) default
    # warehouse dir the test session created
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(wh, ignore_errors=True)


def test_join_correct_and_shuffle_free(spark, bucketed_tables):
    lt, rt, orders, payments = bucketed_tables
    # at test scale the planner would broadcast the small side (also fine,
    # also shuffle-free); disable it to exercise the big-big path bucketing
    # exists for, where both sides are far beyond broadcast thresholds
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "cust_id")
        agg = joined.groupBy("cust_id").agg(F.count("*").alias("n"))

        expected = (
            orders.join(payments, "cust_id")
            .groupBy("cust_id")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, agg.collect())) == sorted(
            map(tuple, expected.collect())
        )

        # the motivating property: bucket-matched join plans NO Exchange
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert "SortMergeJoin" in plan

        # and the follow-up aggregation on the bucket key is shuffle-free
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(cust_id" not in agg_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


class TestBucketedReconcile:
    def test_record_diff_on_bucketed_tables_has_no_join_exchange(self, spark):
        """Reconciliation's record_diff is a full-outer join on the key —
        on pre-bucketed source/target tables the join runs with NO Exchange
        on either side (the write-time bucket shuffle is paid once, every
        nightly reconcile after that is shuffle-free)."""
        import re

        from mongodb_cdc_delta_spark.ops.bucketing import write_bucketed
        from mongodb_cdc_delta_spark.reconcile.engine import record_diff

        src = spark.range(0, 1000).selectExpr(
            "id AS event_id", "id * 2 AS value"
        )
        tgt = spark.range(0, 990).selectExpr(
            "id AS event_id",
            "CASE WHEN id % 97 = 0 THEN -1 ELSE id * 2 END AS value",
        )
        write_bucketed(src, "rec_src_b", "event_id", n_buckets=8)
        write_bucketed(tgt, "rec_tgt_b", "event_id", n_buckets=8)
        try:
            diff = record_diff(
                spark.table("rec_src_b"),
                spark.table("rec_tgt_b"),
                key="event_id",
                compare_cols=["value"],
            )
            plan = diff._jdf.queryExecution().executedPlan().toString()
            join_section = plan.split("SortMergeJoin")[-1]
            # no shuffle feeding the join: bucket specs matched
            assert "Exchange hashpartitioning" not in plan
            counts = {
                r["status"]: 1
                for r in diff.select("status").distinct().collect()
            }
            assert "missing_in_target" in counts  # ids 990-999
            assert "field_mismatch" in counts  # id % 97 == 0
        finally:
            spark.sql("DROP TABLE IF EXISTS rec_src_b")
            spark.sql("DROP TABLE IF EXISTS rec_tgt_b")


class TestBucketedDedup:
    def test_dedup_agg_has_no_exchange(self, spark, tmp_path):
        from mongodb_cdc_delta_spark.ops.bucketing import (
            bucketed_exact_dedup,
            write_dedup_bucketed,
        )
        from mongodb_cdc_delta_spark.queries import load

        docs = load(spark, "/root/testdata/sf0.001", "documents")
        write_dedup_bucketed(docs, "docs_bktd")
        try:
            out = bucketed_exact_dedup(spark, "docs_bktd")
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            # content duplicates collapse to one keeper each
            rows = out.collect()
            assert len(rows) > 0
            assert all(r["n_copies"] >= 1 for r in rows)
            # equivalent to a plain normalized dedup on the source
            from pyspark.sql import functions as F

            expected = (
                docs.withColumn(
                    "fp",
                    F.xxhash64(
                        F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
                    ),
                )
                .groupBy("fp")
                .count()
                .count()
            )
            assert len(rows) == expected
        finally:
            spark.sql("DROP TABLE IF EXISTS docs_bktd")
