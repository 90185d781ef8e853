"""Streaming contamination gate: stream==batch equivalence, the
quarantine/corpus split, and replay idempotence via the txn guard."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.ops.dedup import suffix_run_flags
from mongodb_cdc_delta_spark.sinks.table import LakeTable
from mongodb_cdc_delta_spark.streaming.contamination import ContaminationGate

RUN = "this exact passage appears in a benchmark item verbatim"


def _filler(seed: int, n: int) -> str:
    a = "abcdefghijklmnopqrstuvwxyz"
    return "".join(a[(seed * 7 + i * 13 + i * i) % 26] for i in range(n))


def _write(src, name, rows):
    src.mkdir(parents=True, exist_ok=True)
    (src / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _gate(spark, tmp_path):
    ev = spark.createDataFrame(
        [(900, _filler(3, 25) + RUN + _filler(4, 25))],
        "doc_id long, text string",
    )
    return ContaminationGate(
        eval_set=ev,
        corpus=LakeTable(spark, str(tmp_path / "corpus")),
        quarantine=LakeTable(spark, str(tmp_path / "quarantine")),
    )


def test_stream_splits_and_matches_batch_operator(spark, tmp_path):
    src = tmp_path / "src"
    rows1 = [
        {"doc_id": 1, "text": _filler(1, 60) + RUN + _filler(2, 60)},
        {"doc_id": 2, "text": _filler(5, 150)},
    ]
    rows2 = [
        {"doc_id": 3, "text": RUN + _filler(6, 80)},
        {"doc_id": 4, "text": _filler(7, 140)},
    ]
    _write(src, "a.json", rows1)
    _write(src, "b.json", rows2)
    gate = _gate(spark, tmp_path)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = gate.attach(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    flagged = {r.doc_id for r in gate.quarantine.read().collect()}
    clean = {r.doc_id for r in gate.corpus.read().collect()}
    assert flagged == {1, 3}
    assert clean == {2, 4}
    # stream result == batch operator on the union of all batches
    all_docs = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows1 + rows2],
        "doc_id long, text string",
    )
    batch_flags = {
        r.doc_id for r in suffix_run_flags(all_docs, gate.eval_set).collect()
    }
    assert flagged == batch_flags
    # quarantine carries the run metrics
    [hit] = [
        r for r in gate.quarantine.read().collect() if r.doc_id == 3
    ]
    assert hit.longest_run >= len(RUN)
    assert hit.first_pos == 1


def test_replayed_batch_is_skipped(spark, tmp_path):
    gate = _gate(spark, tmp_path)
    batch = spark.createDataFrame(
        [(1, _filler(1, 40) + RUN + _filler(2, 40)), (2, _filler(9, 120))],
        "doc_id long, text string",
    )
    gate.process_batch(batch, 7)
    v_q = gate.quarantine.version()
    v_c = gate.corpus.version()
    gate.process_batch(batch, 7)  # replay after a simulated crash
    assert gate.quarantine.version() == v_q
    assert gate.corpus.version() == v_c
    assert gate.history[-1]["replayed"] is True
    assert gate.quarantine.read().count() == 1
    assert gate.corpus.read().count() == 1
