"""StreamEnricher: each micro-batch joins against the dimension AS OF
that batch — a dim update between batches is visible to later batches
(the naive stream-static join pins the query-start snapshot and silently
misses it), unmatched facts pass through with null enrichment, and
replayed batches are exactly-once no-ops."""

from __future__ import annotations

import json

from mongodb_cdc_delta_spark.sinks import LakeTable
from mongodb_cdc_delta_spark.streaming.enrichment import StreamEnricher


def _write(src, name, rows):
    src.mkdir(parents=True, exist_ok=True)
    (src / name).write_text("\n".join(json.dumps(r) for r in rows))


def _mk(spark, tmp_path):
    dim = LakeTable(spark, str(tmp_path / "dim"))
    out = LakeTable(spark, str(tmp_path / "out"))
    dim.append(
        spark.createDataFrame(
            [(1, "gold")], "user_id long, tier string"
        )
    )
    return dim, StreamEnricher(dim=dim, out=out, key="user_id")


def _stream(spark, src):
    return (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )


def test_later_batches_see_dim_updates(spark, tmp_path):
    src = tmp_path / "src"
    dim, enr = _mk(spark, tmp_path)

    # drain 1: user 1 known (gold), user 2 unknown -> null tier
    _write(src, "a.json", [{"event_id": 10, "user_id": 1},
                           {"event_id": 11, "user_id": 2}])
    q = enr.attach(_stream(spark, src), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = {r.event_id: r.tier for r in enr.out.read().collect()}
    assert got == {10: "gold", 11: None}

    # dim grows AND changes between drains
    dim.append(
        spark.createDataFrame([(2, "silver")], "user_id long, tier string")
    )
    dim.update_where("user_id = 1", {"tier": "'platinum'"})

    # drain 2 (same checkpoint resumes): new facts see the CURRENT dim
    _write(src, "b.json", [{"event_id": 20, "user_id": 1},
                           {"event_id": 21, "user_id": 2}])
    q = enr.attach(_stream(spark, src), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = {r.event_id: r.tier for r in enr.out.read().collect()}
    # old facts keep their as-of enrichment; new facts see the update
    assert got == {10: "gold", 11: None, 20: "platinum", 21: "silver"}
    # history recorded the dim version each batch was enriched against
    versions = [h["dim_version"] for h in enr.history]
    assert versions == sorted(versions) and versions[0] < versions[-1]


def test_replayed_batch_is_exactly_once(spark, tmp_path):
    _dim, enr = _mk(spark, tmp_path)
    batch = spark.createDataFrame(
        [(1, 1), (2, 2)], "event_id long, user_id long"
    )
    enr.process_batch(batch, 3)
    v = enr.out.version()
    enr.process_batch(batch, 3)  # checkpoint-recovery replay
    assert enr.out.version() == v
    assert enr.out.read().count() == 2
    assert enr.history[-1]["replayed"] is True
