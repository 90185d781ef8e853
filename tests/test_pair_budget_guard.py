"""The exact-Jaccard pair-budget guard (r7, from the r6 10x scaling
battery's measured 78x pair blowup on trigram-space saturation).

Drives a vocab-saturated corpus — every doc drawn from the same tiny
vocabulary, so shingle dfs hug the cap and Sigma C(df,2) explodes
relative to corpus size — through the guard BOTH ways (raise and
banded fallback), checks the estimate is the exact intersection-join
row count, and checks the fallback keeps the exact-verify contract
(every surfaced pair carries its true capped-Jaccard counts).
"""

from __future__ import annotations

import warnings

import pytest

from mongodb_cdc_delta_spark.ops.dedup import (
    JaccardPairBudgetExceeded,
    _banded_pair_counts,
    _jaccard_pair_counts,
    estimate_capped_pairs,
    shingles,
)

from pyspark.sql import functions as F


# r11 fast-tier: moved to the slow (full-battery) lane in r11 so the default fast tier stays <15 min; this surface remains covered by the full battery and by the oracle-parity/plan-gate suites that stay in the fast lane
pytestmark = pytest.mark.slow

def _saturated_docs(spark, n_docs: int = 40):
    # 4-word vocabulary -> every trigram is one of <=64 possibilities;
    # 40 docs of 12 words saturate that space (dfs pile up against the
    # cap), the exact signature of the r6 scaling-battery blowup.
    words = ["alpha", "beta", "gamma", "delta"]
    rows = []
    for d in range(n_docs):
        toks = [words[(d * 7 + 3 * i + (i * i) % 5) % 4] for i in range(12)]
        rows.append((d, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _exact_pair_space(spark, docs, cap: int) -> int:
    # brute-force the ground truth: for each distinct shingle with
    # df <= cap, C(df, 2) candidate join rows
    sh = shingles(docs, n=3)
    dfs = [
        r["df"]
        for r in sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .collect()
    ]
    return sum(d * (d - 1) // 2 for d in dfs if d <= cap)


class TestEstimate:
    def test_estimate_equals_brute_force(self, spark):
        docs = _saturated_docs(spark)
        sh = shingles(docs, n=3).select(
            "doc_id", F.xxhash64("shingle").alias("sh")
        )
        dfs = sh.groupBy("sh").agg(F.count("*").alias("df"))
        est = estimate_capped_pairs(dfs, 100)
        assert est == _exact_pair_space(spark, docs, 100)
        assert est > 0

    def test_estimate_respects_cap(self, spark):
        docs = _saturated_docs(spark)
        sh = shingles(docs, n=3).select(
            "doc_id", F.xxhash64("shingle").alias("sh")
        )
        dfs = sh.groupBy("sh").agg(F.count("*").alias("df"))
        # cap below every df -> zero candidate pairs survive
        assert estimate_capped_pairs(dfs, 1) == 0
        # no cap counts everything
        uncapped = estimate_capped_pairs(dfs, None)
        assert uncapped >= estimate_capped_pairs(dfs, 100)


class TestGuardRaise:
    def test_saturated_corpus_raises_before_the_join(self, spark):
        docs = _saturated_docs(spark)
        with pytest.raises(JaccardPairBudgetExceeded) as ei:
            # materialization is what trips the guard (the estimate is
            # an action inside the call)
            _jaccard_pair_counts(docs, pair_budget=10, on_budget="raise")
        msg = str(ei.value)
        assert "pair_budget" in msg and "fallback" in msg

    def test_under_budget_is_the_exact_path(self, spark):
        docs = _saturated_docs(spark)
        guarded = sorted(
            tuple(r)
            for r in _jaccard_pair_counts(docs, pair_budget=10**9)
            .collect()
        )
        unguarded = sorted(
            tuple(r)
            for r in _jaccard_pair_counts(docs, pair_budget=None)
            .collect()
        )
        assert guarded == unguarded
        assert len(guarded) > 0


class TestGuardFallback:
    def test_fallback_warns_and_reroutes(self, spark):
        docs = _saturated_docs(spark)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            out = _jaccard_pair_counts(
                docs, pair_budget=10, on_budget="fallback"
            )
            rows = sorted(tuple(r) for r in out.collect())
        assert any(
            "falling back to the banded-LSH" in str(w.message)
            for w in caught
        )
        banded = sorted(
            tuple(r) for r in _banded_pair_counts(docs).collect()
        )
        assert rows == banded

    def test_fallback_pairs_carry_exact_counts(self, spark):
        # precision contract: every pair the banded path surfaces has
        # the same (n_inter, na, nb) the exact pipeline computes, and
        # the pair set is a subset of the exact pair set
        docs = _saturated_docs(spark)
        exact = {
            (r["doc_a"], r["doc_b"]): (r["n_inter"], r["na"], r["nb"])
            for r in _jaccard_pair_counts(docs, pair_budget=None)
            .collect()
        }
        banded = {
            (r["doc_a"], r["doc_b"]): (r["n_inter"], r["na"], r["nb"])
            for r in _banded_pair_counts(docs).collect()
        }
        assert banded, "saturated corpus must surface candidates"
        for pair, counts in banded.items():
            assert pair in exact
            assert counts == exact[pair]

    def test_fallback_recall_on_saturated_corpus(self, spark):
        # near-identical docs collide in LSH bands with very high
        # probability; on this corpus (heavy overlap by construction)
        # the banded path must find a solid majority of the exact
        # high-Jaccard pairs
        docs = _saturated_docs(spark)
        def high(df_rows):
            out = set()
            for r in df_rows:
                jac = r["n_inter"] / (r["na"] + r["nb"] - r["n_inter"])
                if jac >= 0.5:
                    out.add((r["doc_a"], r["doc_b"]))
            return out

        truth = high(
            _jaccard_pair_counts(docs, pair_budget=None).collect()
        )
        found = high(_banded_pair_counts(docs).collect())
        assert truth, "construction guarantees >=0.5 pairs"
        recall = len(found & truth) / len(truth)
        assert recall >= 0.8, f"recall {recall:.2f} over {len(truth)} pairs"

    def test_bad_mode_still_raises(self, spark):
        docs = _saturated_docs(spark)
        with pytest.raises(JaccardPairBudgetExceeded):
            _jaccard_pair_counts(
                docs, pair_budget=10, on_budget="not-a-mode"
            )


class TestFuzzyLevenshteinGuard:
    def test_block_pair_space_guard_both_ways(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = [(i, f"document body number {i}") for i in range(40)]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                    # ONE block: 40 docs -> C(40,2) = 780 pairs
                    "lang": pa.array(["en"] * 40, pa.string()),
                    "source": pa.array(["s0"] * 40, pa.string()),
                    "n_chars": pa.array(
                        [len(r[1]) for r in rows], pa.int64()
                    ),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        from mongodb_cdc_delta_spark.ops.chunking import (
            fuzzy_levenshtein_pairs_guarded,
        )

        with pytest.raises(RuntimeError, match="block-pair space"):
            fuzzy_levenshtein_pairs_guarded(
                spark, str(tmp_path), pair_budget=100
            ).collect()
        # under budget: identical rows to the unguarded path
        guarded = sorted(
            tuple(r)
            for r in fuzzy_levenshtein_pairs_guarded(
                spark, str(tmp_path), pair_budget=10**6
            ).collect()
        )
        unguarded = sorted(
            tuple(r)
            for r in fuzzy_levenshtein_pairs_guarded(
                spark, str(tmp_path), pair_budget=None
            ).collect()
        )
        assert guarded == unguarded and len(guarded) > 0
