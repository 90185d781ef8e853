"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (TPC-H Q1-style pricing summary) on sf0.001.
queries()     — every implemented operator from SURVEY.md §2 (+ the
                LLM-data-pipeline extensions) as (spark, sf_dir) callables.
oracle_sql()  — DuckDB-equivalent SQL per query; omitted only for genuinely
                non-SQL-expressible ops (sketches, ANN, Pandas-UDF kernels),
                which the driver records as rows-only checks.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from mongodb_cdc_delta_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = all_queries()
    return reg["pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle
        for name, q in all_queries().items()
        if q.oracle is not None
    }
