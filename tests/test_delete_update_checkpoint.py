"""Predicate DELETE/UPDATE (Delta-parity copy-on-write) and commit-log
checkpointing (replay cost O(interval), not O(commits))."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.sinks import LakeTable
from mongodb_cdc_delta_spark.sinks.table import CHECKPOINT_INTERVAL, _LOG_DIR

# deep storage-layer e2e: excluded from the fast lane (see pytest.ini)
pytestmark = pytest.mark.slow


@pytest.fixture()
def lake(tmp_path):
    return str(tmp_path / "lake")


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


class TestDeleteWhere:
    def test_deletes_matching_rows_only(self, spark, lake):
        t = LakeTable(spark, lake + "/t")
        t.append(_df(spark, [(1, "a"), (2, "b"), (3, "a")], "id long, v string"))
        res = t.delete_where("v = 'a'")
        assert res["files_rewritten"] >= 1
        assert sorted(r.id for r in t.read().collect()) == [2]
        assert t.history()[0].operation == "DELETE"
        # time travel still sees the pre-delete state
        assert t.read(version_as_of=0).count() == 3

    def test_no_match_no_commit(self, spark, lake):
        t = LakeTable(spark, lake + "/t")
        t.append(_df(spark, [(1, "a")], "id long, v string"))
        res = t.delete_where("v = 'zzz'")
        assert res["files_rewritten"] == 0
        assert t.version() == 0  # no-op leaves no commit

    def test_file_pruning(self, spark, lake):
        t = LakeTable(spark, lake + "/t")
        for i in range(3):
            t.append(
                _df(spark, [(i * 10 + j,) for j in range(10)], "id long")
                .coalesce(1)
            )
        res = t.delete_where("id = 15")  # only the second file holds id 15
        assert res["files_rewritten"] == 1
        assert t.read().count() == 29

    def test_predicate_on_evolved_column(self, spark, lake):
        # old files lack column `tag`; delete on tag must not fail on them
        t = LakeTable(spark, lake + "/t")
        t.append(_df(spark, [(1,)], "id long"))
        t.append(_df(spark, [(2, "kill")], "id long, tag string"))
        t.delete_where("tag = 'kill'")
        ids = sorted(r.id for r in t.read().collect())
        assert ids == [1]


class TestUpdateWhere:
    def test_updates_matching_rows(self, spark, lake):
        t = LakeTable(spark, lake + "/t")
        t.append(
            _df(spark, [(1, 10.0, "x"), (2, 20.0, "y")],
                "id long, bal double, v string")
        )
        t.update_where("id = 1", {"bal": "bal * 2", "v": "'updated'"})
        rows = {r.id: (r.bal, r.v) for r in t.read().collect()}
        assert rows == {1: (20.0, "updated"), 2: (20.0, "y")}
        assert t.history()[0].operation == "UPDATE"

    def test_simultaneous_assignment_semantics(self, spark, lake):
        # SET a = b, b = a must swap (both RHS read the original row)
        t = LakeTable(spark, lake + "/t")
        t.append(_df(spark, [(1, 100, 200)], "id long, a long, b long"))
        t.update_where("id = 1", {"a": "b", "b": "a"})
        r = t.read().first()
        assert (r.a, r.b) == (200, 100)

    def test_update_txn_idempotent(self, spark, lake):
        t = LakeTable(spark, lake + "/t")
        t.append(_df(spark, [(1, 1)], "id long, n long"))
        t.update_where("id = 1", {"n": "n + 1"}, txn=("fix", 1))
        res = t.update_where("id = 1", {"n": "n + 1"}, txn=("fix", 1))
        assert res["skipped"]
        assert t.read().first().n == 2


class TestLogCheckpoint:
    def test_checkpoint_written_and_replay_correct(self, spark, lake):
        t = LakeTable(spark, lake + "/t")
        n_commits = CHECKPOINT_INTERVAL + 3
        for i in range(n_commits):
            t.append(_df(spark, [(i,)], "id long").coalesce(1))
        log = os.listdir(os.path.join(lake, "t", _LOG_DIR))
        assert any(f.endswith(".checkpoint.json") for f in log)
        # replay through the checkpoint equals full-history expectations
        assert t.read().count() == n_commits
        assert t.version() == n_commits - 1
        # time travel BEFORE the checkpoint still works (falls back to
        # commit replay from version 0)
        assert t.read(version_as_of=2).count() == 3

    def test_checkpoint_reflects_removes(self, spark, lake):
        t = LakeTable(spark, lake + "/t")
        for i in range(CHECKPOINT_INTERVAL):
            t.append(_df(spark, [(i,)], "id long").coalesce(1))
        # commit #10 is the OPTIMIZE → checkpoint captures the compaction
        res = t.optimize()
        assert res["partitions_compacted"] == 1
        assert t.version() == CHECKPOINT_INTERVAL
        log = os.listdir(os.path.join(lake, "t", _LOG_DIR))
        assert any(f.endswith(".checkpoint.json") for f in log)
        assert t.read().count() == CHECKPOINT_INTERVAL
        assert t.file_count() == 1


class TestClusteredOptimize:
    def test_cluster_by_tightens_rowgroup_stats(self, spark, lake):
        import random

        import pyarrow.parquet as pq

        rnd = random.Random(7)
        t = LakeTable(spark, lake + "/t")
        # two files with interleaved key ranges → overlapping min/max
        for _ in range(2):
            rows = [(rnd.randrange(10_000),) for _ in range(5_000)]
            t.append(_df(spark, rows, "k long").coalesce(1))
        res = t.optimize(cluster_by=["k"])
        assert res["partitions_compacted"] == 1
        # clustered file: row-group k-ranges must be (nearly) disjoint and
        # sorted — the property data skipping needs
        snap = t._replay()
        assert len(snap.files) == 1
        pf = pq.ParquetFile(os.path.join(lake, "t", snap.files[0]))
        mins, maxs = [], []
        col_idx = pf.schema_arrow.names.index("k")
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        assert mins == sorted(mins)
        # data intact
        assert t.read().count() == 10_000


class TestRestore:
    def test_restore_to_old_version(self, spark, lake):
        t = LakeTable(spark, lake + "/t")
        t.append(_df(spark, [(1, "a")], "id long, v string"))        # v0
        t.append(_df(spark, [(2, "b")], "id long, v string"))        # v1
        t.delete_where("id = 1")                                     # v2
        assert t.read().count() == 1
        res = t.restore(1)
        assert res["restored_to"] == 1
        assert sorted(r.id for r in t.read().collect()) == [1, 2]
        # history preserved: the restore itself is a commit, and the
        # pre-restore state is still reachable
        assert t.history()[0].operation == "RESTORE"
        assert t.read(version_as_of=2).count() == 1

    def test_restore_across_schema_evolution_rewrites(self, spark, lake):
        # v0 writes `n` as int; v1 widens to string; restoring to v1 must
        # not map the int-typed v0 file to the string schema unreadably
        t = LakeTable(spark, lake + "/t")
        t.append(_df(spark, [(1, 10)], "id long, n int"))
        from mongodb_cdc_delta_spark.schema import MergeMode

        t.append(_df(spark, [(2, "x")], "id long, n string"),
                 mode=MergeMode.PERMISSIVE)                          # v1
        t.delete_where("id = 1")                                     # v2
        res = t.restore(1)
        assert res["version"] == 3
        vals = sorted(r.n for r in t.read().collect())
        assert vals == ["10", "x"]

    def test_read_after_vacuum_gives_clear_error(self, spark, lake):
        t = LakeTable(spark, lake + "/t")
        t.append(_df(spark, [(1,)], "id long").coalesce(1))
        t.append(_df(spark, [(2,)], "id long").coalesce(1))
        t.optimize()
        t.vacuum(retention_hours=0.0)
        with pytest.raises(ValueError, match="VACUUM"):
            t.read(version_as_of=0).collect()
        with pytest.raises(ValueError, match="VACUUM"):
            t.restore(0)
        # latest snapshot unaffected
        assert t.read().count() == 2


class TestCheckpointTxnProps:
    def test_txn_and_properties_survive_checkpoint(self, spark, lake):
        t = LakeTable(spark, lake + "/t")
        t.set_properties({"k": "early"})
        for i in range(CHECKPOINT_INTERVAL + 2):
            t.append(
                _df(spark, [(i,)], "id long").coalesce(1), txn=("app", i)
            )
        # checkpoint exists and the pre-checkpoint txn/property state is
        # visible through it
        assert t.txn_version("app") == CHECKPOINT_INTERVAL + 1
        assert t.txn_version("other") == -1
        assert t.properties() == {"k": "early"}
        # idempotency still holds across the checkpoint boundary
        res = t.append(
            _df(spark, [(99,)], "id long"), txn=("app", 0)
        )
        assert res["skipped"]
