"""Long-horizon soak of the incremental LSH + IVF indexes.

The r5 review fixed multi-version change-feed folding in both indexes
against constructed three-op polls; this soak drives each index through
~60 seeded random corpus mutations with maintenance polls at RANDOM
intervals (so most polls span several commit versions with arbitrary
insert/update/delete interleavings), restart replays from stale tails,
and source-table compaction — asserting bit-equality with a from-scratch
rebuild throughout. The CDF-export soak found two real bugs the unit
tests missed; this is the same treatment for the index maintenance path.
"""

from __future__ import annotations

import random

import pytest

from mongodb_cdc_delta_spark.ops.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
)
from mongodb_cdc_delta_spark.ops.similarity import assign_to_centroids
from mongodb_cdc_delta_spark.sinks import LakeTable
from mongodb_cdc_delta_spark.streaming.aggregates import ChangeFeedTail
from mongodb_cdc_delta_spark.streaming.ann_index import IncrementalIvfIndex
from mongodb_cdc_delta_spark.streaming.dedup_index import IncrementalLshIndex

pytestmark = pytest.mark.slow

CENTROIDS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.0, 1.0, 0.0, 0.0]),
    (2, [0.0, 0.0, 1.0, 0.0]),
]

WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
).split()


def _text(rng: random.Random) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(rng.randint(5, 12)))


def _vec(rng: random.Random) -> list[float]:
    cell = rng.randint(0, 2)
    v = [0.0, 0.0, 0.0, round(rng.random() * 0.2, 3)]
    v[cell] = 1.0
    v[(cell + 1) % 3] = round(rng.random() * 0.3, 3)
    return v


class TestIvfIndexSoak:
    def test_random_mutations_random_poll_cadence(self, spark, tmp_path):
        rng = random.Random(0xA11CE)
        corpus = LakeTable(spark, str(tmp_path / "corpus"))
        idx = IncrementalIvfIndex(
            LakeTable(spark, str(tmp_path / "ivf")), CENTROIDS
        )
        tail = ChangeFeedTail(corpus, from_version=-1)
        next_id = 0
        live: set[int] = set()

        def _append(n):
            nonlocal next_id
            rows = [(next_id + i, _vec(rng)) for i in range(n)]
            corpus.append(
                spark.createDataFrame(
                    rows, "vec_id long, embedding array<float>"
                )
            )
            live.update(next_id + i for i in range(n))
            next_id += n

        _append(6)
        checks = 0
        for i in range(60):
            op = rng.random()
            if op < 0.45 or not live:
                _append(rng.randint(1, 4))
            elif op < 0.70:
                victim = rng.choice(sorted(live))
                v = _vec(rng)
                corpus.update_where(
                    f"vec_id = {victim}",
                    {
                        "embedding": "array("
                        + ", ".join(f"{x}f" for x in v)
                        + ")"
                    },
                )
            elif op < 0.90:
                victim = rng.choice(sorted(live))
                corpus.delete_where(f"vec_id = {victim}")
                live.discard(victim)
            else:
                corpus.optimize(target_file_rows=64)

            # poll only sometimes: most maintains span several commits
            # with interleaved ops — the multi-version folding shape
            if rng.random() < 0.4 or i == 59:
                idx.maintain(tail)
                if rng.random() < 0.5 or i == 59:
                    got = {
                        (r.vec_id, r.centroid_id)
                        for r in idx.postings().collect()
                    }
                    want = {
                        (r.vec_id, r.centroid_id)
                        for r in assign_to_centroids(
                            corpus.read().select("vec_id", "embedding"),
                            CENTROIDS,
                        ).collect()
                    }
                    assert got == want, f"iter {i}: index != rebuild"
                    checks += 1
            if i % 20 == 19:
                # restart replay: a tail rebuilt from an OLD version
                # re-delivers every change since; txn versions must
                # make the re-application a no-op
                stale = ChangeFeedTail(corpus, from_version=-1)
                idx.maintain(stale)
                got = {
                    (r.vec_id, r.centroid_id)
                    for r in idx.postings().collect()
                }
                want = {
                    (r.vec_id, r.centroid_id)
                    for r in assign_to_centroids(
                        corpus.read().select("vec_id", "embedding"),
                        CENTROIDS,
                    ).collect()
                }
                assert got == want, f"iter {i}: stale-tail replay diverged"
        assert checks >= 8


class TestLshIndexSoak:
    def test_random_mutations_random_poll_cadence(self, spark, tmp_path):
        rng = random.Random(0xBEEF)
        corpus = LakeTable(spark, str(tmp_path / "corpus"))
        idx = IncrementalLshIndex(LakeTable(spark, str(tmp_path / "idx")))
        tail = ChangeFeedTail(corpus, from_version=-1)
        next_id = 0
        live: set[int] = set()
        texts: dict[int, str] = {}

        def _append(n, dup_of=None):
            nonlocal next_id
            rows = []
            for i in range(n):
                t = (
                    texts[dup_of]
                    if dup_of is not None and dup_of in texts
                    else _text(rng)
                )
                rows.append((next_id + i, t))
                texts[next_id + i] = t
                live.add(next_id + i)
            corpus.append(
                spark.createDataFrame(rows, "doc_id long, text string")
            )
            next_id += n

        def _rebuild():
            sigs = minhash_signatures(
                shingles(corpus.read().select("doc_id", "text"), n=3)
            )
            return {
                (r.doc_a, r.doc_b)
                for r in lsh_candidate_pairs(sigs).collect()
            }

        _append(5)
        _append(2, dup_of=0)  # guarantee some candidate pairs exist
        checks = 0
        for i in range(50):
            op = rng.random()
            if op < 0.40 or not live:
                _append(rng.randint(1, 3))
            elif op < 0.55:
                # near-duplicate of an existing doc: pair churn
                _append(1, dup_of=rng.choice(sorted(live)))
            elif op < 0.75:
                victim = rng.choice(sorted(live))
                t = _text(rng)
                corpus.update_where(
                    f"doc_id = {victim}",
                    {"text": "'" + t + "'"},
                )
                texts[victim] = t
            elif op < 0.92:
                victim = rng.choice(sorted(live))
                corpus.delete_where(f"doc_id = {victim}")
                live.discard(victim)
                texts.pop(victim, None)
            else:
                corpus.optimize(target_file_rows=64)

            if rng.random() < 0.4 or i == 49:
                idx.maintain(tail)
                if rng.random() < 0.5 or i == 49:
                    got = {
                        (r.doc_a, r.doc_b)
                        for r in idx.candidate_pairs().collect()
                    }
                    assert got == _rebuild(), f"iter {i}: index != rebuild"
                    checks += 1
            if i % 25 == 24:
                stale = ChangeFeedTail(corpus, from_version=-1)
                idx.maintain(stale)
                got = {
                    (r.doc_a, r.doc_b)
                    for r in idx.candidate_pairs().collect()
                }
                assert got == _rebuild(), f"iter {i}: stale-tail replay"
        # seeded cadence: the fixed rng yields exactly 5 equality checks
        # (plus 2 stale-tail replay checks) — enough soak coverage
        assert checks >= 5
