"""Bucketed co-located joins: correctness + the zero-shuffle plan property
that motivates them."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.ops.bucketing import bucketed_join, write_bucketed


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
