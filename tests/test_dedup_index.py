"""Incremental MinHash-LSH index: equivalence with a full rebuild after
every corpus mutation, exactly-once refresh, and new-doc probing."""

from __future__ import annotations

from mongodb_cdc_delta_spark.ops.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
)
from mongodb_cdc_delta_spark.sinks import LakeTable
from mongodb_cdc_delta_spark.streaming.aggregates import ChangeFeedTail
from mongodb_cdc_delta_spark.streaming.dedup_index import IncrementalLshIndex

DUP_A = "the quick brown fox jumps over the lazy dog near the river bank"
DUP_B = "the quick brown fox jumps over the lazy dog near the river bend"
OTHER = "completely different content about distributed query engines"
THIRD = "yet another unrelated document describing parquet file layouts"


import pytest  # noqa: E402  (fast-tier marker below)

# r11 fast-tier: moved to the slow (full-battery) lane in r11 so the default fast tier stays <15 min; this surface remains covered by the full battery and by the oracle-parity/plan-gate suites that stay in the fast lane
pytestmark = pytest.mark.slow

def _mk(spark, tmp_path):
    corpus = LakeTable(spark, str(tmp_path / "corpus"))
    idx = IncrementalLshIndex(LakeTable(spark, str(tmp_path / "idx")))
    tail = ChangeFeedTail(corpus, from_version=-1)
    return corpus, idx, tail


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch_pairs(spark, corpus):
    sigs = minhash_signatures(
        shingles(corpus.read().select("doc_id", "text"), n=3)
    )
    return {
        (r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sigs).collect()
    }


def _index_pairs(idx):
    return {(r.doc_a, r.doc_b) for r in idx.candidate_pairs().collect()}


def _refresh(idx, tail):
    return idx.maintain(tail)


def test_incremental_matches_full_rebuild_through_mutations(
    spark, tmp_path
):
    corpus, idx, tail = _mk(spark, tmp_path)

    # 1: initial append with one near-dup pair
    corpus.append(
        _docs_df(spark, [(1, DUP_A), (2, DUP_B), (3, OTHER)])
    )
    _refresh(idx, tail)
    pairs = _index_pairs(idx)
    assert pairs == _batch_pairs(spark, corpus)
    assert (1, 2) in pairs

    # 2: update doc 3 into a near-dup of doc 1 (COW delete+insert)
    corpus.update_where("doc_id = 3", {"text": f"'{DUP_A}'"})
    _refresh(idx, tail)
    pairs = _index_pairs(idx)
    assert pairs == _batch_pairs(spark, corpus)
    assert (1, 3) in pairs and (2, 3) in pairs

    # 3: delete doc 2 → its pairs disappear
    corpus.delete_where("doc_id = 2")
    _refresh(idx, tail)
    pairs = _index_pairs(idx)
    assert pairs == _batch_pairs(spark, corpus)
    assert all(2 not in p for p in pairs)

    # 4: append an unrelated doc → no new pairs
    corpus.append(_docs_df(spark, [(4, THIRD)]))
    _refresh(idx, tail)
    assert _index_pairs(idx) == _batch_pairs(spark, corpus)


def test_replayed_batch_is_exactly_once(spark, tmp_path):
    corpus, idx, _tail = _mk(spark, tmp_path)
    corpus.append(_docs_df(spark, [(1, DUP_A), (2, DUP_B)]))
    changes = corpus.read_changes(0)
    idx.apply_changes(changes, batch_id=0)
    v = idx.index.version()
    idx.apply_changes(changes, batch_id=0)  # redelivered
    assert idx.index.version() == v  # txn-skipped, no duplicate postings
    assert idx.postings().count() == 2 * idx.bands


def test_probe_new_docs_against_index(spark, tmp_path):
    corpus, idx, tail = _mk(spark, tmp_path)
    corpus.append(_docs_df(spark, [(1, DUP_A), (3, OTHER)]))
    _refresh(idx, tail)
    probes = _docs_df(spark, [(100, DUP_B), (101, THIRD)])
    got = {
        (r.probe_doc, r.match_doc)
        for r in idx.candidates_for(probes).collect()
    }
    assert (100, 1) in got
    assert all(p != 101 for p, _ in got)


def test_multi_version_batch_folds_to_latest_state(spark, tmp_path):
    """One poll spanning insert+delete+update commits must fold to the
    latest state: deleted docs stay deleted, updated docs index the NEW
    text only (regression for the multi-version fold bug)."""
    corpus, idx, tail = _mk(spark, tmp_path)
    corpus.append(_docs_df(spark, [(1, DUP_A), (2, OTHER)]))
    corpus.delete_where("doc_id = 1")
    corpus.update_where("doc_id = 2", {"text": f"'{DUP_B}'"})
    n = _refresh(idx, tail)
    assert n == 1  # single multi-version batch
    assert _index_pairs(idx) == _batch_pairs(spark, corpus)
    post = idx.postings()
    assert post.where("doc_id = 1").count() == 0        # not resurrected
    assert post.where("doc_id = 2").count() == idx.bands  # exactly one set
