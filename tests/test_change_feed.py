"""Change Data Feed (LakeTable.read_changes): row-level change history
reconstructed from the commit log without stored change files.

Semantics mirror Delta's table_changes: appends → inserts, copy-on-write
UPDATE → delete(pre-image)+insert(post-image), DV DELETE → deletes for
exactly the tombstoned rows, OPTIMIZE/REPARTITION → no changes.
"""

from __future__ import annotations

import pytest

from mongodb_cdc_delta_spark.sinks import LakeTable


# r11 fast-tier: moved to the slow (full-battery) lane in r11 so the default fast tier stays <15 min; this surface remains covered by the full battery and by the oracle-parity/plan-gate suites that stay in the fast lane
pytestmark = pytest.mark.slow

@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable(spark, str(tmp_path / "cdf"))


def _changes(t, start, end=None):
    rows = t.read_changes(start, end).collect()
    return sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in rows
    )


def test_append_only_fast_path(spark, table):
    table.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    table.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    assert _changes(table, 0) == [
        (0, "insert", 1, "a"),
        (0, "insert", 2, "b"),
        (1, "insert", 3, "c"),
    ]
    # bounded range: only version 1
    assert _changes(table, 1, 1) == [(1, "insert", 3, "c")]


def test_copy_on_write_update_is_delete_plus_insert(spark, table):
    table.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    table.update_where("id = 2", {"v": "'B'"})
    got = _changes(table, 1)
    assert got == [(1, "delete", 2, "b"), (1, "insert", 2, "B")]
    # unchanged row 1 was rewritten into the new file but must NOT appear
    assert all(r[2] != 1 for r in got)


def test_dv_delete_emits_only_tombstoned_rows(spark, table):
    table.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "id long, v string"
        )
    )
    res = table.delete_where("id IN (3, 7)", deletion_vectors=True)
    assert res["rows_deleted"] == 2
    ver = res["version"]
    assert _changes(table, ver, ver) == [
        (ver, "delete", 3, "v3"),
        (ver, "delete", 7, "v7"),
    ]
    # a second DV delete reports only the NEW tombstones
    res2 = table.delete_where("id IN (3, 5)", deletion_vectors=True)  # 3 gone
    assert _changes(table, res2["version"], res2["version"]) == [
        (res2["version"], "delete", 5, "v5")
    ]


def test_optimize_produces_no_changes(spark, table):
    for i in range(3):
        table.append(spark.createDataFrame([(i, "x")], "id long, v string"))
    v = table.version()
    table.optimize()
    assert table.version() == v + 1
    assert _changes(table, v + 1) == []


def test_changes_compose_to_current_state(spark, table):
    table.append(
        spark.createDataFrame([(i, "a") for i in range(5)], "id long, v string")
    )
    table.update_where("id < 2", {"v": "'u'"})
    table.delete_where("id = 4", deletion_vectors=True)
    table.append(spark.createDataFrame([(9, "z")], "id long, v string"))
    # replay the feed: inserts minus deletes == final table content
    rows = table.read_changes(0).collect()
    state: dict[tuple, int] = {}
    for r in sorted(rows, key=lambda r: r["_commit_version"]):
        key = (r["id"], r["v"])
        if r["_change_type"] == "insert":
            state[key] = state.get(key, 0) + 1
        else:
            state[key] = state.get(key, 0) - 1
    derived = sorted(k for k, n in state.items() if n > 0)
    actual = sorted((r["id"], r["v"]) for r in table.read().collect())
    assert derived == actual


def test_empty_range_has_change_schema(spark, table):
    table.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    df = table.read_changes(5, 9)
    assert df.count() == 0
    assert df.columns[-3:] == [
        "_change_type",
        "_commit_version",
        "_commit_timestamp",
    ]


def test_snapshot_diff_incremental_equals_full(spark, table):
    from mongodb_cdc_delta_spark.reconcile.incremental import (
        snapshot_diff,
        snapshot_diff_incremental,
    )

    table.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(20)], "id long, v string"
        )
    )
    v0 = table.version()
    table.update_where("id % 5 = 0", {"v": "'upd'"})
    table.delete_where("id = 7", deletion_vectors=True)
    table.append(spark.createDataFrame([(100, "new")], "id long, v string"))

    full = snapshot_diff(table, v0, key="id")
    incr = snapshot_diff_incremental(table, v0, key="id")
    canon = lambda df: sorted(map(tuple, df.collect()))
    assert canon(incr) == canon(full)
    # and it found the three kinds of change
    statuses = {r["status"] for r in incr.collect()}
    assert statuses == {"missing_in_target", "extra_in_target", "field_mismatch"}


def test_changes_across_schema_evolution_unify(spark, table):
    """A feed spanning a schema evolution comes out in the END schema —
    pre-evolution rows carry null for the later column."""
    table.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    table.append(
        spark.createDataFrame(
            [(2, "b", 9.5)], "id long, v string, score double"
        )
    )
    df = table.read_changes(0)
    assert set(df.columns) == {
        "id", "v", "score",
        "_change_type", "_commit_version", "_commit_timestamp",
    }
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5
    assert all(r["_change_type"] == "insert" for r in rows.values())
