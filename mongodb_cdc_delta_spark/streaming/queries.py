"""Oracle-checkable registrations of the streaming window operators.

Spark's session_window / window aggregations have identical semantics on
batch and streaming inputs, so the batch form is checked against a DuckDB
formulation here and the *same helper* runs in streaming with watermarks
(tests/test_streaming_stateful.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..queries import load, register
from .stateful import session_window_agg, tumbling_window_agg


@register(
    "session_window_native",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           min(ts) AS first_event,
           max(ts) AS last_event
    FROM sess GROUP BY user_id, sid
    """,
    description="native session_window aggregation (gap 30 min) — the "
    "streaming-stateful session operator, validated in batch mode where "
    "semantics are identical",
    tags=("streaming", "session", "window"),
)
def session_window_native(spark: SparkSession, sf: str) -> DataFrame:
    return session_window_agg(
        load(spark, sf, "events"),
        event_time_col="ts",
        key_cols=("user_id",),
        gap="30 minutes",
    )


@register(
    "tumbling_window_counts",
    oracle="""
    SELECT event_type,
           time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes'
             AS window_end,
           count(*) AS n_events
    FROM events GROUP BY 1, 2
    """,
    description="tumbling event-time windows (10 min) per event_type — the "
    "watermarked streaming aggregate, validated in batch mode",
    tags=("streaming", "window"),
)
def tumbling_window_counts(spark: SparkSession, sf: str) -> DataFrame:
    return tumbling_window_agg(
        load(spark, sf, "events"),
        event_time_col="ts",
        key_cols=("event_type",),
        width="10 minutes",
    )
