"""bench.py per-query budget: a hung query is cancelled and recorded, it
can never take down the whole benchmark run."""

from __future__ import annotations

import time

import pytest


@pytest.fixture(scope="module")
def bench_mod():
    import importlib
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    return importlib.reload(bench)


def test_fast_thunk_returns_elapsed(spark, bench_mod):
    el = bench_mod.run_with_budget(
        spark, "bb-fast", lambda: time.sleep(0.05), budget=30.0
    )
    assert 0.04 <= el < 5.0


def test_overbudget_spark_job_is_cancelled(spark, bench_mod):
    # a genuinely running Spark job (not a sleep) must be cancelled via
    # its job group and surface as TimeoutError within ~budget seconds
    def slow_job():
        # ~275 billion rows of modular arithmetic: minutes of work, and
        # avg() keeps the aggregate overflow-safe under ANSI mode
        spark.range(1 << 38).selectExpr("avg(id % 123456)").collect()

    t0 = time.perf_counter()
    with pytest.raises(TimeoutError):
        bench_mod.run_with_budget(spark, "bb-slow", slow_job, budget=3.0)
    assert time.perf_counter() - t0 < 30.0
    # the session must remain usable afterwards
    assert spark.range(10).count() == 10


def test_headline_names_all_registered():
    # a typo'd HEADLINE entry would surface as a per-query error in the
    # round's bench JSON; catch it at test time instead
    import bench

    from mongodb_cdc_delta_spark.queries import all_queries

    reg = all_queries()
    missing = [n for n in bench.HEADLINE if n not in reg]
    assert missing == []
