"""Replay of the reference's schema-evolution load test and e2e CDC flow.

Mirrors:
- tests/load/test_schema_evolution_load.py:28-144 — 2,100 docs through 4
  schema phases (basic → +category/priority/nested metadata + int→float →
  +arrays/metrics struct → deep nesting + array-of-structs), asserting zero
  errors, the final wide schema, and unique-_id integrity.
- tests/e2e/test_cdc_flow.py:60-157 — insert 50 / update 5 / delete 5,
  asserting per-op row counts and updated values, then the current-state
  view.
"""

from __future__ import annotations

import json
import time

import pytest

from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.cdc.pipeline import CDCIngestor
from mongodb_cdc_delta_spark.reconcile import current_state

NOW_MS = int(time.time() * 1000)
NOW = None  # real clock: events stamped NOW_MS are fresh


def envelope(op, doc, coll="items", ts=NOW_MS):
    payload = {
        "op": op,
        "ts_ms": ts,
        "source": {"db": "load", "collection": coll},
    }
    payload["before" if op == "d" else "after"] = json.dumps(doc)
    return json.dumps({"payload": payload})


def phase_docs(phase: int, start: int, n: int):
    """Four escalating schema phases (reference generators :28-144)."""
    for i in range(start, start + n):
        if phase == 1:
            yield {"_id": f"d{i}", "name": f"item-{i}", "value": i}
        elif phase == 2:
            yield {
                "_id": f"d{i}",
                "name": f"item-{i}",
                "value": i + 0.5,  # int → float widening
                "category": "cat-" + str(i % 5),
                "priority": i % 3,
                "metadata": {"source": "gen", "version": 2},
            }
        elif phase == 3:
            yield {
                "_id": f"d{i}",
                "name": f"item-{i}",
                "value": float(i),
                "category": "cat-" + str(i % 5),
                "priority": i % 3,
                "metadata": {"source": "gen", "version": 3},
                "tags": [f"t{j}" for j in range(i % 4)],
                "metrics": {"views": i * 10, "score": i / 7.0},
            }
        else:
            yield {
                "_id": f"d{i}",
                "name": f"item-{i}",
                "value": float(i),
                "category": "cat-" + str(i % 5),
                "priority": i % 3,
                "metadata": {
                    "source": "gen",
                    "version": 4,
                    "nested": {"level2": {"level3": f"deep-{i}"}},
                },
                "tags": [f"t{j}" for j in range(i % 4)],
                "metrics": {"views": i * 10, "score": i / 7.0},
                "history": [
                    {"event": "created", "at": i},
                    {"event": "updated", "at": i + 1},
                ],
            }


def test_four_phase_schema_evolution_load(spark, tmp_path):
    ing = CDCIngestor(spark, str(tmp_path / "lake"))
    counts = (600, 600, 600, 300)  # 2,100 docs total (reference scale)
    start = 0
    for phase, n in enumerate(counts, start=1):
        events = [envelope("c", d) for d in phase_docs(phase, start, n)]
        raw = spark.createDataFrame([(e,) for e in events], "value string")
        stats = ing.ingest_batch(raw, batch_id=phase)
        assert stats.dlq_rows == 0, f"phase {phase} produced DLQ rows"
        assert "load_items" in stats.collections
        start += n

    t = ing.table("load_items")
    df = t.read()

    # zero loss, unique ids (reference integrity assertion)
    assert df.count() == 2100
    assert df.select("_id").distinct().count() == 2100

    # final schema: all phase fields present, correctly typed
    schema = {f.name: f.dataType for f in df.schema.fields}
    assert schema["value"].typeName() == "double"  # int widened to float
    assert schema["metadata"].typeName() == "struct"
    meta_fields = {f.name: f.dataType for f in schema["metadata"].fields}
    assert meta_fields["nested"].typeName() == "struct"  # 3-level nesting
    assert schema["tags"].simpleString() == "array<string>"
    assert schema["metrics"].typeName() == "struct"
    assert schema["history"].simpleString().startswith("array<struct")

    # early-phase rows read back with NULLs in later fields, values intact
    first = df.where(F.col("_id") == "d0").first()
    assert first["name"] == "item-0" and first["value"] == 0.0
    assert first["category"] is None and first["history"] is None
    deep = df.where(F.col("_id") == "d2000").first()
    assert deep["metadata"]["nested"]["level2"]["level3"] == "deep-2000"

    # schema history is recorded: every phase that widened committed
    assert t.version() >= 3


def test_e2e_cdc_flow_counts_and_current_state(spark, tmp_path):
    ing = CDCIngestor(spark, str(tmp_path / "lake"))
    inserts = [
        envelope("c", {"_id": f"u{i}", "name": f"user-{i}", "n": i}, coll="users")
        for i in range(50)
    ]
    updates = [
        envelope("u", {"_id": f"u{i}", "name": f"user-{i}-upd", "n": i + 100},
                 coll="users")
        for i in range(5)
    ]
    deletes = [
        envelope("d", {"_id": f"u{i}", "name": f"user-{i}", "n": i}, coll="users")
        for i in range(45, 50)
    ]
    events = inserts + updates + deletes
    raw = spark.createDataFrame(
        [(e, "mongodb.load.users", 0, i) for i, e in enumerate(events)],
        "value string, topic string, partition int, offset long",
    )
    ing.ingest_batch(raw, batch_id=0)

    users = ing.table("load_users").read()
    by_op = {
        r["_cdc_operation"]: r["n"]
        for r in users.groupBy("_cdc_operation")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # reference e2e: append-log rows per op (test_cdc_flow.py:129-146)
    assert by_op == {"insert": 50, "update": 5, "delete": 5}

    # updated values visible on the update rows
    upd = users.where(
        (F.col("_cdc_operation") == "update") & (F.col("_id") == "u0")
    ).first()
    assert upd["name"] == "user-0-upd" and upd["n"] == 100

    # current-state materialization: 50 - 5 deleted = 45 live users,
    # with updates reflected (_kafka_offset is the idempotency/order key,
    # reference schema_inferrer.py:484-490)
    state = current_state(users, "_id", order_cols=["_kafka_offset"])
    assert state.count() == 45
    assert state.where(F.col("_id") == "u0").first()["name"] == "user-0-upd"
    assert state.where(F.col("_id") == "u47").count() == 0
