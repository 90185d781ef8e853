"""Stateful streaming operators (extensions beyond the reference, which has
no stateful streaming — SURVEY §2.7 gap list / §7.3: "watermarks only for
the stale-event policy"; these give the rebuild the standard Spark
streaming-state surface).

- session_window_agg: gap-based session windows with watermarked event
  time — works identically on batch and streaming DataFrames (Spark's
  unified semantics), so tests validate the batch plan and streaming runs
  share the code path.
- tumbling_window_agg: fixed windows + watermark late-data handling.
- RunningTotals: a custom stateful operator via applyInPandasWithState —
  per-key running count/sum surviving across micro-batches in the state
  store (RocksDB/HDFS-backed on a cluster), with processing-time timeout
  eviction. The pattern for any bespoke state logic Spark's built-in
  windows can't express.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def session_window_agg(
    df: DataFrame,
    event_time_col: str = "ts",
    key_cols: tuple[str, ...] = ("user_id",),
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Events separated by more than ``gap`` start a new session; output one
    row per (key, session) with bounds and counts. On a stream the
    watermark bounds state: sessions older than it finalize and evict."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(event_time_col, watermark)
    return (
        df.groupBy(
            F.session_window(F.col(event_time_col), gap).alias("session"),
            *key_cols,
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min(event_time_col).alias("first_event"),
            F.max(event_time_col).alias("last_event"),
        )
        .select(
            *key_cols,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            "first_event",
            "last_event",
        )
    )


def tumbling_window_agg(
    df: DataFrame,
    event_time_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    width: str = "10 minutes",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Fixed event-time windows; late rows beyond the watermark drop —
    the streaming-native form of the stale-event policy (spec FR-024)."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(event_time_col, watermark)
    return (
        df.groupBy(
            F.window(F.col(event_time_col), width).alias("w"), *key_cols
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            *key_cols,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("total_events", LongType()),
        StructField("batch_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("total", LongType())])


def running_totals(
    grouped_stream,
    timeout_minutes: int = 0,
):
    """Custom stateful operator: per-key cumulative event count across
    micro-batches via applyInPandasWithState.

    Call on a streaming ``df.groupBy(key_col)``; returns a streaming
    DataFrame of RUNNING_TOTALS_SCHEMA. State = one long per key; with
    ``timeout_minutes`` idle keys evict (bounded state at 100 TB key
    cardinalities)."""

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        batch_n = 0
        for pdf in pdfs:
            batch_n += len(pdf)
        prev = state.get[0] if state.exists else 0
        total = prev + batch_n
        state.update((total,))
        if timeout_minutes:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "total_events": [total],
                "batch_events": [batch_n],
            }
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes
        else GroupStateTimeout.NoTimeout
    )
    return grouped_stream.applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def use_rocksdb_state(
    spark, changelog_checkpointing: bool = True
) -> None:
    """Switch stateful streaming to the RocksDB state store.

    The default HDFS-backed provider keeps every key in executor heap —
    fine for bounded demo state, an OOM at 100 TB-scale keyed state
    (hundreds of millions of live sessions). RocksDB spills to local disk
    with bounded memory, and changelog checkpointing uploads per-batch
    deltas instead of full snapshots. Applies to queries started AFTER the
    call (provider is read at query start; bundled with Spark ≥3.2, no
    extra jar)."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing"
        ".enabled",
        str(changelog_checkpointing).lower(),
    )


def streaming_dedup(
    df: DataFrame,
    fingerprint_cols: tuple[str, ...],
    event_time_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Incremental (streaming) deduplication: drop rows whose fingerprint
    was already seen within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps one state entry per distinct
    fingerprint and — unlike plain ``dropDuplicates`` on a stream — EVICTS
    entries once the watermark passes them, so state is bounded by the
    dedup horizon, not the stream's lifetime. Combined with
    ``use_rocksdb_state`` this is the 100 TB-corpus shape: exact dedup
    within the horizon, state spilled to local disk, no unbounded heap.
    Batch DataFrames fall back to plain dropDuplicates (same semantics
    when everything is "within" the horizon)."""
    if not df.isStreaming:
        return df.dropDuplicates(list(fingerprint_cols))
    return df.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        list(fingerprint_cols)
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    within: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream interval join: each left row matches right
    rows with the same key whose event time falls in
    ``[left_ts, left_ts + within]``.

    Both sides carry a watermark and the join condition bounds event-time
    distance, so the state store retains each side only for
    watermark + within — bounded state, the requirement for an unbounded
    2-stream correlation (click→conversion attribution, request→error
    correlation) at production scale. Works identically on batch frames
    (same condition, no state).
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    cond = (
        (left[key] == right[key])
        & (right[right_ts] >= left[left_ts])
        & (right[right_ts] <= F.expr(f"{left_ts} + INTERVAL {within}"))
    )
    return left.join(right, cond, "inner").select(
        left[key].alias(key),
        left[left_ts].alias(left_ts),
        right[right_ts].alias(right_ts),
    )


# ---------------------------------------------------------------------------
# transformWithState variant (Spark 4 arbitrary-state v2 API)
# ---------------------------------------------------------------------------


class _RunningTotalsProcessor(StatefulProcessor):
    """Per-key cumulative counts on the transformWithState v2 API.

    Equivalent semantics to running_totals() above; the v2 API brings
    composite typed state (value/list/map), timers decoupled from output,
    and state schema evolution — the operator model Spark is converging
    on, so the engine ships both paths with an equivalence test."""

    def init(self, handle) -> None:
        self._total = handle.getValueState(
            "total", StructType([StructField("total", LongType())])
        )

    def handleInputRows(self, key, rows, timerValues):
        n = 0
        for pdf in rows:
            n += len(pdf)
        prev = self._total.get()
        total = (prev[0] if prev is not None else 0) + n
        self._total.update((total,))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "total_events": [total],
                "batch_events": [n],
            }
        )

    def close(self) -> None:
        pass


def running_totals_tws(grouped_stream):
    """running_totals on transformWithStateInPandas (same output schema).

    Requires google.protobuf in the Python workers (the v2 state server's
    wire protocol); in environments without it, use running_totals — the
    e2e test for this path skips itself when protobuf is absent."""
    return grouped_stream.transformWithStateInPandas(
        _RunningTotalsProcessor(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
