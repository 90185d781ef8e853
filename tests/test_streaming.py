"""Structured Streaming CDC: file-source end-to-end, checkpoint resume,
exactly-once under replay, metrics listener.

Mirrors the reference's e2e flow tests (tests/e2e/test_cdc_flow.py) and
crash recovery (tests/integration/test_crash_recovery.py:18-70 resume from
checkpoint without reprocessing).
"""

from __future__ import annotations

import json
import time

import pytest

from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.streaming import (
    CDCStreamPipeline,
    PipelineMetricsListener,
)

# event-time must be recent: the streaming path stamps `now` with the real
# clock, and events older than 7 days are DLQ'd as stale (spec FR-024)
TS = int(time.time() * 1000)


# r11 fast-tier: moved to the slow (full-battery) lane in r11 so the default fast tier stays <15 min; this surface remains covered by the full battery and by the oracle-parity/plan-gate suites that stay in the fast lane
pytestmark = pytest.mark.slow

def envelope(op, _id, coll="users", extra=None, ts=TS):
    doc = {"_id": _id, **(extra or {})}
    payload = {
        "op": op,
        "ts_ms": ts,
        "source": {"db": "shop", "collection": coll},
    }
    key = "before" if op == "d" else "after"
    payload[key] = json.dumps(doc)
    return json.dumps({"payload": payload})


def write_events(src_dir, name, lines):
    src_dir.mkdir(parents=True, exist_ok=True)
    (src_dir / name).write_text("\n".join(lines) + "\n")


@pytest.fixture()
def dirs(tmp_path):
    return tmp_path / "events", str(tmp_path / "lake")


def test_stream_end_to_end(spark, dirs):
    src, lake = dirs
    write_events(
        src,
        "batch0.json",
        [
            envelope("c", "u1", extra={"name": "Alice", "n": 1}),
            envelope("c", "u2", extra={"name": "Bob", "n": 2}),
            envelope("u", "u1", extra={"name": "Alice2", "n": 3}),
            envelope("c", "o1", coll="orders", extra={"total": 5.5}),
        ],
    )
    pipe = CDCStreamPipeline(spark, lake)
    pipe.run_available(pipe.from_files(str(src)))

    users = pipe.read_table("shop_users")
    assert users.count() == 3
    ops = {
        r["_cdc_operation"]: r["n"]
        for r in users.groupBy("_cdc_operation")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert ops == {"insert": 2, "update": 1}
    assert pipe.read_table("shop_orders").count() == 1


def test_stream_checkpoint_resume_no_duplicates(spark, dirs):
    src, lake = dirs
    write_events(src, "b0.json", [envelope("c", f"u{i}") for i in range(10)])
    pipe = CDCStreamPipeline(spark, lake)
    pipe.run_available(pipe.from_files(str(src)))
    assert pipe.read_table("shop_users").count() == 10

    # second run over the same checkpoint: old file ignored, new file picked up
    write_events(src, "b1.json", [envelope("c", f"v{i}") for i in range(5)])
    pipe2 = CDCStreamPipeline(spark, lake)
    pipe2.run_available(pipe2.from_files(str(src)))
    t = pipe2.read_table("shop_users")
    assert t.count() == 15
    assert t.select("_id").distinct().count() == 15


def test_replayed_batch_skipped_by_txn_guard(spark, dirs):
    # simulate foreachBatch retry: same batch_id delivered twice
    src, lake = dirs
    write_events(src, "b0.json", [envelope("c", "u1")])
    pipe = CDCStreamPipeline(spark, lake)
    raw = spark.createDataFrame(
        [(envelope("c", "u1"),)], "value string"
    )
    pipe._process_batch(raw, 0)
    pipe._process_batch(raw, 0)
    assert pipe.read_table("shop_users").count() == 1
    assert pipe.last_stats.collections["shop_users"]["skipped"]


def test_metrics_listener_collects_progress(spark, dirs):
    src, lake = dirs
    listener = PipelineMetricsListener()
    spark.streams.addListener(listener)
    try:
        write_events(src, "b0.json", [envelope("c", f"u{i}") for i in range(4)])
        pipe = CDCStreamPipeline(spark, lake)
        q = pipe.start(
            pipe.from_files(str(src)), query_name="cdc-test", available_now=True
        )
        q.awaitTermination(120)
        # listener events are async; poll briefly
        import time

        for _ in range(50):
            m = listener.by_query.get("cdc-test")
            if m and m.events_processed_total >= 4:
                break
            time.sleep(0.2)
        m = listener.by_query.get("cdc-test")
        assert m is not None
        assert m.events_processed_total >= 4
        assert m.batches_total >= 1
        assert m.failures_total == 0
    finally:
        spark.streams.removeListener(listener)


def test_stream_with_current_state_materialization(spark, dirs):
    src, lake = dirs
    write_events(
        src,
        "b0.json",
        [
            envelope("c", "m1", extra={"v": 1}),
            envelope("u", "m1", extra={"v": 2}),
            envelope("c", "m2", extra={"v": 9}),
            envelope("d", "m2", extra={"v": 9}),
        ],
    )
    pipe = CDCStreamPipeline(spark, lake, materialize_current=True)
    pipe.run_available(pipe.from_files(str(src)))
    cur = {r["_id"]: r["v"] for r in pipe.read_table("shop_users__current").collect()}
    assert cur == {"m1": 2}
    assert pipe.read_table("shop_users").count() == 4


def test_full_stack_stream_integration(spark, dirs):
    """Pipeline + current-state materialization + control-plane audit +
    parallel collections, over two micro-batch rounds with a replay: the
    complete operational wiring in one test."""
    from mongodb_cdc_delta_spark.cdc.control import ControlPlane
    from mongodb_cdc_delta_spark.cdc.pipeline import CDCIngestor

    src, lake = dirs
    control = ControlPlane(spark, lake)
    pipe = CDCStreamPipeline(spark, lake, materialize_current=True)
    # swap in a fully-loaded ingestor (audit + parallel collections)
    pipe.ingestor = CDCIngestor(
        spark,
        lake,
        materialize_current=True,
        control_plane=control,
        collection_parallelism=2,
    )
    write_events(
        src,
        "b0.json",
        [
            envelope("c", "u1", extra={"n": 1}),
            envelope("c", "u2", extra={"n": 2}),
            envelope("c", "o1", coll="orders", extra={"total": 5.0}),
        ],
    )
    pipe.run_available(pipe.from_files(str(src)))
    write_events(
        src,
        "b1.json",
        [
            envelope("u", "u1", extra={"n": 10}),
            envelope("d", "u2", extra={"n": 2}),
        ],
    )
    pipe.run_available(pipe.from_files(str(src)))

    # append log has full history; __current has live state only
    assert pipe.read_table("shop_users").count() == 4
    cur = {
        r["_id"]: r["n"]
        for r in pipe.ingestor.table("shop_users__current").read().collect()
    }
    assert cur == {"u1": 10}
    assert pipe.ingestor.table("shop_orders__current").read().count() == 1
    # every batch audited by the data plane itself
    audits = control.audit_log().where("action = 'ingest_batch'").count()
    assert audits >= 2
