"""Commit-log longevity (r7 verdict item 2).

The reference's SLO horizon implies ~260k commits/month at 10 s batches
(spec.md:331-332 lag SLOs assume an always-on stream). Replay is
checkpoint + tail, so per-operation commit READS must stay O(interval)
regardless of history length, and checkpoint WRITES must build
incrementally from the previous checkpoint (a from-v0 rebuild makes every
10th commit O(history) — O(N²/interval) cumulative, a month-long stream
killer). These are algorithmic gates: they count commit-file reads, not
wall time, so they are deterministic on any host.
"""

from __future__ import annotations

import json
import os

import pytest

from mongodb_cdc_delta_spark.sinks.table import (
    CHECKPOINT_INTERVAL,
    LakeTable,
    _checkpoint_path,
    _last_checkpoint_path,
)


# r11 fast-tier: moved to the slow (full-battery) lane in r11 so the default fast tier stays <15 min; this surface remains covered by the full battery and by the oracle-parity/plan-gate suites that stay in the fast lane
pytestmark = pytest.mark.slow

def _mk_table(spark, tmp_path, n_commits: int) -> LakeTable:
    t = LakeTable(spark, str(tmp_path / "t"))
    df = spark.range(4).selectExpr("id", "id * 2 AS v")
    for i in range(n_commits):
        t.append(df, partition_by=[], txn=("longevity", i))
    return t


def _count_commit_reads(monkeypatch, t: LakeTable) -> list[str]:
    reads: list[int] = []
    orig = LakeTable._read_commit

    def spy(self, version):
        if os.path.realpath(self.root) == os.path.realpath(t.root):
            reads.append(version)
        return orig(self, version)

    monkeypatch.setattr(LakeTable, "_read_commit", spy)
    return reads


def test_replay_reads_o_interval_commits(spark, tmp_path, monkeypatch):
    n = 3 * CHECKPOINT_INTERVAL + 7
    t = _mk_table(spark, tmp_path, n)
    reads = _count_commit_reads(monkeypatch, t)
    snap = t._replay()
    assert snap.version == n - 1
    # tail since the newest checkpoint only — never the whole history
    assert len(reads) <= CHECKPOINT_INTERVAL
    reads.clear()
    assert t.txn_version("longevity") == n - 1
    assert len(reads) <= CHECKPOINT_INTERVAL


def test_checkpoint_write_is_incremental(spark, tmp_path, monkeypatch):
    # 41 commits -> checkpoints at versions 10/20/30/40
    n = 4 * CHECKPOINT_INTERVAL + 1
    t = _mk_table(spark, tmp_path, n)
    newest = 4 * CHECKPOINT_INTERVAL
    # drop the newest checkpoint + pointer so the rebuild has real work
    os.unlink(_checkpoint_path(t.root, newest))
    os.unlink(_last_checkpoint_path(t.root))
    reads = _count_commit_reads(monkeypatch, t)
    # rebuild the NEWEST checkpoint in isolation: it must read only the
    # tail since the PREVIOUS checkpoint — a from-v0 rebuild (the pre-r8
    # shape) reads all n commits and fails this bound
    t._write_checkpoint(newest)
    assert 0 < len(reads) <= CHECKPOINT_INTERVAL
    assert min(reads) > newest - 2 * CHECKPOINT_INTERVAL


def test_incremental_checkpoint_equals_full_rebuild(spark, tmp_path):
    n = 3 * CHECKPOINT_INTERVAL
    t = _mk_table(spark, tmp_path, n)
    t.set_properties({"k1": "v1"})
    df2 = spark.range(3).selectExpr(
        "id", "id * 2 AS v", "CAST(id AS STRING) AS extra"
    )
    for i in range(CHECKPOINT_INTERVAL):
        t.append(df2, txn=("other-app", i), partition_by=[])
    latest_ckpt_version = max(
        int(f.split(".")[0])
        for f in os.listdir(os.path.join(t.root, "_log"))
        if f.endswith(".checkpoint.json")
    )
    with open(_checkpoint_path(t.root, latest_ckpt_version)) as fh:
        incremental = json.load(fh)
    # force a from-scratch rebuild of the same version by removing every
    # checkpoint + the pointer, then compare state for state
    for f in list(os.listdir(os.path.join(t.root, "_log"))):
        if f.endswith(".checkpoint.json") or f == "_last_checkpoint.json":
            os.unlink(os.path.join(t.root, "_log", f))
    t._write_checkpoint(latest_ckpt_version)
    with open(_checkpoint_path(t.root, latest_ckpt_version)) as fh:
        full = json.load(fh)
    assert incremental == full


def test_last_checkpoint_pointer(spark, tmp_path):
    t = _mk_table(spark, tmp_path, CHECKPOINT_INTERVAL + 2)
    with open(_last_checkpoint_path(t.root)) as fh:
        ptr = json.load(fh)
    assert ptr["version"] == CHECKPOINT_INTERVAL
    # corrupt pointer → listing-scan fallback still finds the checkpoint
    with open(_last_checkpoint_path(t.root), "w") as fh:
        fh.write("not json")
    ck = t._latest_checkpoint(t.version())
    assert ck is not None and ck["version"] == CHECKPOINT_INTERVAL
    # missing pointer (pre-r8 logs) → same fallback
    os.unlink(_last_checkpoint_path(t.root))
    ck = t._latest_checkpoint(t.version())
    assert ck is not None and ck["version"] == CHECKPOINT_INTERVAL


def test_truncate_log_keeps_replay_and_txn_state(spark, tmp_path):
    n = 5 * CHECKPOINT_INTERVAL
    t = _mk_table(spark, tmp_path, n)
    rows_before = t.read().count()
    version_before = t.version()
    res = t.truncate_log(retain_commits=2 * CHECKPOINT_INTERVAL)
    assert res["commits_deleted"] > 0
    cut = res["oldest_version"]
    # cut lands on a checkpoint and respects retention
    assert cut <= version_before - 2 * CHECKPOINT_INTERVAL
    assert os.path.exists(_checkpoint_path(t.root, cut))
    # replay/read/version/txn state all survive
    assert t.version() == version_before
    assert t.read().count() == rows_before
    assert t.txn_version("longevity") == n - 1
    # idempotent appends still skip correctly after truncation
    df = spark.range(4).selectExpr("id", "id * 2 AS v")
    r = t.append(df, partition_by=[], txn=("longevity", 0))
    assert r["skipped"] is True
    # time travel inside the retained window works; beyond it raises
    assert t.read(version_as_of=cut).count() > 0
    with pytest.raises(ValueError, match="not in table log"):
        t._replay(version_as_of=0)


def test_truncate_log_noop_without_checkpoint_margin(spark, tmp_path):
    t = _mk_table(spark, tmp_path, 3)  # below the first checkpoint
    res = t.truncate_log(retain_commits=1)
    assert res == {"commits_deleted": 0, "checkpoints_deleted": 0}
