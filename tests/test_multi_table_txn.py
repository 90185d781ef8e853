"""Multi-table transactional commit: all-or-nothing across table + side
tables (the crash-window class ADVICE r1 found in current-state
materialization, closed by construction via a write-ahead intent manifest).
"""

from __future__ import annotations

import os

import pytest

from mongodb_cdc_delta_spark.sinks import LakeTable
from mongodb_cdc_delta_spark.sinks.txn import (
    MultiTableTxn,
    _publish_entry,
    recover,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def test_commit_publishes_all_tables_with_txn_marks(spark, tmp_path):
    a = LakeTable(spark, str(tmp_path / "a"))
    b = LakeTable(spark, str(tmp_path / "b"))
    txn = MultiTableTxn(spark, str(tmp_path / "txns"), "cdc-batch", 7)
    txn.stage_append(a, _df(spark, [(1, "x")]))
    txn.stage_append(b, _df(spark, [(2, "y")]))
    # staged but unpublished: invisible (log does not even exist yet)
    assert not a.exists() and not b.exists()
    res = txn.commit()
    assert [r["skipped"] for r in res] == [False, False]
    assert a.read().count() == 1 and b.read().count() == 1
    assert a.txn_version("cdc-batch") == 7
    assert b.txn_version("cdc-batch") == 7
    assert os.listdir(str(tmp_path / "txns")) == []  # manifest consumed


def test_replayed_txn_is_noop(spark, tmp_path):
    a = LakeTable(spark, str(tmp_path / "a"))
    t1 = MultiTableTxn(spark, str(tmp_path / "txns"), "app", 1)
    t1.stage_append(a, _df(spark, [(1, "x")]))
    t1.commit()
    # the same (app_id, version) arriving again — e.g. foreachBatch retry —
    # must not stage or publish anything
    t2 = MultiTableTxn(spark, str(tmp_path / "txns"), "app", 1)
    assert t2.stage_append(a, _df(spark, [(1, "x")]))["skipped"]
    assert t2.commit() == []
    assert a.read().count() == 1


def test_crash_after_prepare_rolls_forward(spark, tmp_path):
    """Crash between prepare() and the second publish: recover() completes
    the remaining table exactly once."""
    a = LakeTable(spark, str(tmp_path / "a"))
    b = LakeTable(spark, str(tmp_path / "b"))
    txn = MultiTableTxn(spark, str(tmp_path / "txns"), "app", 3)
    txn.stage_append(a, _df(spark, [(1, "x")]))
    txn.stage_append(b, _df(spark, [(2, "y")]))
    manifest = txn.prepare()
    # simulate: first table published, then the process dies
    _publish_entry(spark, txn._staged[0], "app", 3)
    assert a.read().count() == 1
    assert not b.exists()
    assert os.path.exists(manifest)

    done = recover(spark, str(tmp_path / "txns"))
    assert done == [txn.txn_id]
    assert a.read().count() == 1  # not double-applied
    assert len(a.history()) == 1
    assert b.read().count() == 1
    # second recover: nothing pending
    assert recover(spark, str(tmp_path / "txns")) == []


def test_crash_before_prepare_leaves_nothing_visible(spark, tmp_path):
    a = LakeTable(spark, str(tmp_path / "a"))
    txn = MultiTableTxn(spark, str(tmp_path / "txns"), "app", 1)
    txn.stage_append(a, _df(spark, [(1, "x")]))
    # no prepare() — the crash point is before the atomic rename
    assert recover(spark, str(tmp_path / "txns")) == []
    assert not a.exists()


def test_abort_deletes_staged_files(spark, tmp_path):
    a = LakeTable(spark, str(tmp_path / "a"))
    txn = MultiTableTxn(spark, str(tmp_path / "txns"), "app", 1)
    txn.stage_append(a, _df(spark, [(1, "x")]))
    staged = [
        f["path"] for e in txn._staged for f in e["add"]
    ]
    assert staged and all(
        os.path.exists(os.path.join(str(tmp_path / "a"), p)) for p in staged
    )
    txn.abort()
    assert all(
        not os.path.exists(os.path.join(str(tmp_path / "a"), p))
        for p in staged
    )
    assert not a.exists()


def test_abort_refused_after_prepare(spark, tmp_path):
    a = LakeTable(spark, str(tmp_path / "a"))
    txn = MultiTableTxn(spark, str(tmp_path / "txns"), "app", 1)
    txn.stage_append(a, _df(spark, [(1, "x")]))
    txn.prepare()
    with pytest.raises(RuntimeError, match="cannot abort"):
        txn.abort()
    txn.finalize()
    assert a.read().count() == 1


def test_concurrent_writer_race_retries_with_fresh_version(spark, tmp_path):
    a = LakeTable(spark, str(tmp_path / "a"))
    a.append(_df(spark, [(0, "base")]))
    txn = MultiTableTxn(spark, str(tmp_path / "txns"), "app", 1)
    txn.stage_append(a, _df(spark, [(1, "x")]))
    txn.prepare()
    # another writer lands a commit between prepare and finalize — the txn
    # publish must lose the optimistic race once and retry at version+1
    a.append(_df(spark, [(99, "interloper")]))
    txn.finalize()
    assert a.read().count() == 3
    assert a.txn_version("app") == 1


def test_schema_evolution_inside_txn(spark, tmp_path):
    a = LakeTable(spark, str(tmp_path / "a"))
    a.append(_df(spark, [(1, "x")]))
    txn = MultiTableTxn(spark, str(tmp_path / "txns"), "app", 2)
    wider = spark.createDataFrame(
        [(2, "y", 1.5)], "id long, v string, score double"
    )
    txn.stage_append(a, wider)
    txn.commit()
    assert set(a.read().columns) == {"id", "v", "score"}
    assert a.read().where("score IS NOT NULL").count() == 1
