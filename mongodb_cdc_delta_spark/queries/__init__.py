"""Oracle-checkable query registry.

Every analytical capability this engine claims (SURVEY.md §2.7 Q1-Q8, the
§2.7 gap-list extensions, the CDC/reconciliation relational core, and the
LLM-data-pipeline operators) is registered here as a named pair:

- ``fn(spark, sf_dir) -> DataFrame``  — the Spark-first implementation
- ``oracle``                          — equivalent ANSI SQL for DuckDB

The driver (and ``tests/test_oracle_parity.py``) runs both sides on the same
parquet tables and compares row count + schema + order-insensitive value
hash. Determinism rules used throughout:

- every LIMIT is preceded by a total ORDER BY (unique tiebreak column);
- aggregated doubles are cast per-row to DECIMAL(18,4) so the sum is exact
  decimal arithmetic (identical across engines regardless of add order);
  averages are computed as exact-decimal-sum cast to double / count;
- no raw timestamp column is emitted by value-hashed queries unless it is a
  passthrough of parquet data (bit-identical in both engines).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    description: str = "",
    tags: tuple[str, ...] = (),
):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name, fn, oracle, description, tags)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one driver parquet table.

    ``events.ts`` is physically TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects; read it as a long (legacy conf) and convert to a
    microsecond timestamp with exact integer division — the same floor
    truncation DuckDB applies when it narrows nanos to its micro timestamps.
    """
    # harden against whatever session the caller hands us: timestamps are
    # naive-UTC in the parquet data and the DuckDB oracle compares naive
    # values, so date_format/unix_micros must run under UTC regardless of
    # the driver JVM's zone. A default-conf session also ships 200 shuffle
    # partitions — at driver scale (sf0.01) that is ~200 near-empty tasks
    # per shuffle, so pin the same runtime-settable confs session.py uses.
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.shuffle.partitions", "32"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.autoBroadcastJoinThreshold", "64m"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime-settable in some deployment: keep going
    df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
    from pyspark.sql.types import LongType

    if table == "events" and isinstance(df.schema["ts"].dataType, LongType):
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def all_queries() -> dict[str, Query]:
    """Import all query modules and return the populated registry.

    Registration order is deliberate: the driver checks queries in this
    order under a (possibly bounded) budget, so the CDC/reconcile/quality/
    streaming semantic core registers right after the relational surface,
    ahead of the LLM-pipeline ops.
    """
    from . import relational  # noqa: F401
    from ..reconcile import queries as reconcile_queries  # noqa: F401
    from ..cdc import queries as cdc_queries  # noqa: F401
    from ..quality import queries as quality_queries  # noqa: F401
    from ..streaming import queries as streaming_queries  # noqa: F401
    from ..ops import dedup, similarity, textstats, multimodal, udfs  # noqa: F401
    from ..ops import sampling, skew  # noqa: F401

    # Under a bounded driver check budget, order the registry so the
    # strongest-signal checks come first: (1) the SURVEY §2 core and
    # oracle-checked LLM-pipeline ops (hash-comparable), (2) rows-only
    # sketch/ANN ops (weaker check), (3) the TPC-H breadth analogues,
    # which are extensions beyond the reference surface.
    def tier(q: Query) -> int:
        if "tpch" in q.tags:
            return 2
        return 0 if q.oracle is not None else 1

    ordered = sorted(REGISTRY.items(), key=lambda kv: tier(kv[1]))
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return REGISTRY
