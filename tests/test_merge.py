"""Copy-on-write MERGE on LakeTable + reconciliation repair round-trip.

Covers the full reconcile loop the reference spec'd (research.md:659-855):
diff two tables → repair plan → MERGE apply → tables identical. Also checks
the file-pruning property: merging a few keys must not rewrite untouched
files.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.reconcile import (
    apply_repair,
    bucket_hash_compare,
    current_state,
    record_diff,
    repair_plan,
)
from mongodb_cdc_delta_spark.sinks import LakeTable

# deep storage-layer e2e: excluded from the fast lane (see pytest.ini)
pytestmark = pytest.mark.slow


@pytest.fixture()
def lake(tmp_path):
    return str(tmp_path / "lake")


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


class TestMerge:
    def test_upsert_updates_and_inserts(self, spark, lake):
        t = LakeTable(spark, lake + "/t")
        t.append(_df(spark, [(1, "a"), (2, "b")], "id long, v string"))
        t.merge(_df(spark, [(2, "B"), (3, "c")], "id long, v string"), "id")
        got = {r.id: r.v for r in t.read().collect()}
        assert got == {1: "a", 2: "B", 3: "c"}
        assert t.history()[0].operation == "MERGE"

    def test_delete_rows(self, spark, lake):
        t = LakeTable(spark, lake + "/t")
        t.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")], "id long, v string"))
        plan = _df(
            spark,
            [(2, "delete", None), (4, "insert", "d")],
            "id long, _action_ string, v string",
        )
        t.merge(plan.drop("_action_").join(plan.select("id", "_action_"), "id"),
                "id", delete_expr="_action_ = 'delete'")
        got = {r.id: r.v for r in t.read().select("id", "v").collect()}
        assert got == {1: "a", 3: "c", 4: "d"}

    def test_merge_into_empty_table_inserts(self, spark, lake):
        t = LakeTable(spark, lake + "/t")
        res = t.merge(_df(spark, [(1, "a")], "id long, v string"), "id")
        assert t.read().count() == 1
        assert not res.get("skipped")

    def test_file_pruning_untouched_files_survive(self, spark, lake):
        t = LakeTable(spark, lake + "/t")
        # three separate files via three commits
        for i in range(3):
            t.append(
                _df(spark, [(i * 10 + j, "x") for j in range(10)],
                    "id long, v string").coalesce(1)
            )
        files_before = set(t._replay().files)
        assert len(files_before) == 3
        # touch only keys in the second file (ids 10-19)
        res = t.merge(_df(spark, [(15, "HIT")], "id long, v string"), "id")
        assert res["files_rewritten"] == 1
        files_after = set(t._replay().files)
        # two original files untouched
        assert len(files_before & files_after) == 2
        assert t.read().where("id = 15").first().v == "HIT"
        assert t.read().count() == 30

    def test_merge_with_schema_evolution(self, spark, lake):
        t = LakeTable(spark, lake + "/t")
        t.append(_df(spark, [(1, "a")], "id long, v string"))
        t.merge(
            _df(spark, [(1, "A", 9.5)], "id long, v string, score double"), "id"
        )
        row = t.read().first()
        assert row.v == "A" and row.score == 9.5

    def test_merge_txn_idempotent(self, spark, lake):
        t = LakeTable(spark, lake + "/t")
        t.append(_df(spark, [(1, "a")], "id long, v string"))
        src = _df(spark, [(1, "B")], "id long, v string")
        t.merge(src, "id", txn=("repair", 1))
        res = t.merge(src, "id", txn=("repair", 1))
        assert res["skipped"]

    def test_merge_collapses_duplicate_target_keys(self, spark, lake):
        # append-log shape: same key twice; upsert replaces both with one row
        t = LakeTable(spark, lake + "/t")
        t.append(_df(spark, [(1, "v1"), (1, "v2")], "id long, v string"))
        t.merge(_df(spark, [(1, "final")], "id long, v string"), "id")
        rows = t.read().collect()
        assert len(rows) == 1 and rows[0].v == "final"


class TestReconcileRoundTrip:
    def test_diff_repair_converges(self, spark, lake):
        src_t = LakeTable(spark, lake + "/src")
        tgt_t = LakeTable(spark, lake + "/tgt")
        schema = "id long, name string, bal double"
        src_t.append(
            _df(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], schema)
        )
        # target drifted: missing id=1, extra id=9, wrong value id=2
        tgt_t.append(
            _df(spark, [(2, "b", 99.0), (3, "c", 3.0), (9, "zzz", 0.0)], schema)
        )
        src, tgt = src_t.read(), tgt_t.read()
        cols = ["name", "bal"]

        hashes = bucket_hash_compare(src, tgt, "id", cols, n_buckets=8)
        assert hashes.where(~F.col("match")).count() > 0

        diff = record_diff(src, tgt, "id", cols)
        statuses = {r["id"]: r["status"] for r in diff.collect()}
        assert statuses == {
            1: "missing_in_target",
            2: "field_mismatch",
            9: "extra_in_target",
        }

        plan = repair_plan(diff, "id", cols)
        apply_repair(tgt_t, plan, "id")

        # post-repair: target == source exactly
        diff2 = record_diff(src, tgt_t.read(), "id", cols)
        assert diff2.count() == 0
        h2 = bucket_hash_compare(src, tgt_t.read(), "id", cols, n_buckets=8)
        assert h2.where(~F.col("match")).count() == 0


class TestCurrentState:
    def test_latest_per_key_deletes_drop(self, spark):
        log = _df(
            spark,
            [
                (1, "insert", "v1", 100),
                (1, "update", "v2", 200),
                (2, "insert", "x1", 100),
                (2, "delete", "x1", 300),
                (3, "insert", "y1", 50),
            ],
            "id long, _cdc_operation string, v string, _kafka_offset long",
        )
        state = current_state(log, "id")
        got = {r.id: r.v for r in state.collect()}
        assert got == {1: "v2", 3: "y1"}


def test_merge_key_not_first_column(spark, tmp_path):
    """Regression: the survivors anti-join moves the merge key to the front
    of its column list; the union with the upsert side must align by NAME,
    or every column shifts (silent corruption when types happen to line
    up, ANSI cast errors when they don't)."""
    from mongodb_cdc_delta_spark.sinks import LakeTable

    t = LakeTable(spark, str(tmp_path / "midkey"))
    t.append(
        spark.createDataFrame(
            [("x1", "k1", 1), ("x2", "k2", 2), ("x3", "k3", 3)],
            "other string, key string, n long",
        )
    )
    src = spark.createDataFrame(
        [("x2b", "k2", 20), ("x4", "k4", 4)],
        "other string, key string, n long",
    )
    t.merge(src, "key")
    got = {r["key"]: (r["other"], r["n"]) for r in t.read().collect()}
    assert got == {
        "k1": ("x1", 1),
        "k2": ("x2b", 20),
        "k3": ("x3", 3),
        "k4": ("x4", 4),
    }
