"""Incrementally-maintained aggregate tables (streaming-native rollups)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.sinks import LakeTable
from mongodb_cdc_delta_spark.streaming.aggregates import IncrementalAggregate


import pytest  # noqa: E402  (fast-tier marker below)

# r11 fast-tier: moved to the slow (full-battery) lane in r11 so the default fast tier stays <15 min; this surface remains covered by the full battery and by the oracle-parity/plan-gate suites that stay in the fast lane
pytestmark = pytest.mark.slow

def _agg(spark, tmp_path, keys=("user",), measures=None):
    t = LakeTable(spark, str(tmp_path / "agg"))
    return IncrementalAggregate(
        t, list(keys), measures or {"total": "amount"}
    )


def test_batches_accumulate(spark, tmp_path):
    agg = _agg(spark, tmp_path)
    b0 = spark.createDataFrame(
        [("a", 10.0), ("a", 5.0), ("b", 1.0)], "user string, amount double"
    )
    b1 = spark.createDataFrame(
        [("a", 2.0), ("c", 7.0)], "user string, amount double"
    )
    agg.apply_batch(b0, batch_id=0)
    agg.apply_batch(b1, batch_id=1)
    got = {
        r["user"]: (r["n_rows"], r["total"])
        for r in agg.read().collect()
    }
    assert got == {"a": (3, 17.0), "b": (1, 1.0), "c": (1, 7.0)}


def test_replay_does_not_double_count(spark, tmp_path):
    agg = _agg(spark, tmp_path)
    b = spark.createDataFrame([("a", 10.0)], "user string, amount double")
    agg.apply_batch(b, batch_id=0)
    agg.apply_batch(b, batch_id=0)  # redelivered micro-batch
    rows = agg.read().collect()
    assert len(rows) == 1 and rows[0]["total"] == 10.0 and rows[0]["n_rows"] == 1


def test_composite_keys_and_multiple_measures(spark, tmp_path):
    agg = _agg(
        spark,
        tmp_path,
        keys=("user", "day"),
        measures={"total": "amount", "big": "CASE WHEN amount > 5 THEN 1 ELSE 0 END"},
    )
    b0 = spark.createDataFrame(
        [("a", "d1", 10.0), ("a", "d1", 2.0), ("a", "d2", 9.0)],
        "user string, day string, amount double",
    )
    agg.apply_batch(b0, batch_id=0)
    agg.apply_batch(
        spark.createDataFrame(
            [("a", "d1", 1.0)], "user string, day string, amount double"
        ),
        batch_id=1,
    )
    got = {
        (r["user"], r["day"]): (r["n_rows"], r["total"], r["big"])
        for r in agg.read().collect()
    }
    assert got == {("a", "d1"): (3, 13.0, 1), ("a", "d2"): (1, 9.0, 1)}


def test_matches_full_reaggregation(spark, tmp_path):
    """Fold of N batches == one aggregation of the concatenated input."""
    import random

    rng = random.Random(7)
    batches = [
        [(f"u{rng.randint(0, 5)}", float(rng.randint(1, 9))) for _ in range(20)]
        for _ in range(4)
    ]
    agg = _agg(spark, tmp_path)
    allrows = []
    for i, rows in enumerate(batches):
        agg.apply_batch(
            spark.createDataFrame(rows, "user string, amount double"), batch_id=i
        )
        allrows += rows
    expect = {
        r["user"]: (r["n"], r["s"])
        for r in spark.createDataFrame(allrows, "user string, amount double")
        .groupBy("user")
        .agg(F.count("*").alias("n"), F.sum("amount").alias("s"))
        .collect()
    }
    got = {r["user"]: (r["n_rows"], r["total"]) for r in agg.read().collect()}
    assert got == expect


def test_streaming_foreachbatch_maintenance(spark, tmp_path):
    """The intended wiring: a streaming query folds every micro-batch into
    the aggregate table via foreachBatch(apply_batch)."""
    src = tmp_path / "stream"
    src.mkdir()
    (src / "b0.json").write_text(
        '{"user": "a", "amount": 10.0}\n{"user": "b", "amount": 1.0}\n'
    )
    (src / "b1.json").write_text('{"user": "a", "amount": 5.0}\n')
    agg = _agg(spark, tmp_path)
    stream = (
        spark.readStream.schema("user string, amount double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: agg.apply_batch(df, batch_id=bid) and None
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["user"]: (r["n_rows"], r["total"]) for r in agg.read().collect()}
    assert got == {"a": (2, 15.0), "b": (1, 1.0)}


class TestChangeFeedMaintenance:
    def test_aggregate_tracks_mutable_table(self, spark, tmp_path):
        """MV maintained from the change feed equals a full recompute after
        every kind of upstream mutation."""
        from mongodb_cdc_delta_spark.sinks import LakeTable
        from mongodb_cdc_delta_spark.streaming.aggregates import (
            ChangeFeedTail,
            IncrementalAggregate,
            maintain_from_changes,
        )
        from pyspark.sql import functions as F

        src = LakeTable(spark, str(tmp_path / "src"))
        mv = IncrementalAggregate(
            LakeTable(spark, str(tmp_path / "mv")),
            keys=["grp"],
            measures={"total": "v"},
            txn_app_id="cdf-mv",
        )
        tail = ChangeFeedTail(src)

        def check():
            got = sorted(
                (r["grp"], r["n_rows"], r["total"])
                for r in mv.read().collect()
                if r["n_rows"] > 0
            )
            want = sorted(
                (r["grp"], r["cnt"], r["total"])
                for r in src.read()
                .groupBy("grp")
                .agg(
                    F.count("*").cast("long").alias("cnt"),
                    F.sum("v").alias("total"),
                )
                .collect()
            )
            assert got == want

        src.append(
            spark.createDataFrame(
                [("a", 1, 10), ("a", 2, 20), ("b", 3, 30)],
                "grp string, id long, v long",
            )
        )
        assert maintain_from_changes(tail, mv) == 1
        check()

        src.update_where("id = 2", {"v": "25"})
        src.delete_where("id = 3", deletion_vectors=True)
        src.optimize()  # rearrangement-only version: empty change batch
        maintain_from_changes(tail, mv)
        check()

        src.append(
            spark.createDataFrame([("b", 4, 40)], "grp string, id long, v long")
        )
        maintain_from_changes(tail, mv)
        check()
        # caught up: polling again is a no-op
        assert tail.poll() is None

    def test_replayed_batch_is_noop(self, spark, tmp_path):
        from mongodb_cdc_delta_spark.sinks import LakeTable
        from mongodb_cdc_delta_spark.streaming.aggregates import (
            IncrementalAggregate,
        )

        src = LakeTable(spark, str(tmp_path / "src2"))
        mv = IncrementalAggregate(
            LakeTable(spark, str(tmp_path / "mv2")),
            keys=["grp"],
            measures={"total": "v"},
            txn_app_id="cdf-mv2",
        )
        src.append(
            spark.createDataFrame([("a", 1, 10)], "grp string, id long, v long")
        )
        ch = src.read_changes(0, src.version())
        mv.apply_changes(ch, batch_id=src.version())
        mv.apply_changes(ch, batch_id=src.version())  # replay
        rows = mv.read().collect()
        assert [(r["grp"], r["n_rows"], r["total"]) for r in rows] == [
            ("a", 1, 10)
        ]
