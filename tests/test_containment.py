"""Containment decontamination: seeded exact-value behavior, the
eval-embedded-in-train case Jaccard misses, and ppm quantization."""

from __future__ import annotations

from mongodb_cdc_delta_spark.ops.dedup import (
    containment_scores,
    ngram_jaccard_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestContainmentScores:
    def test_full_embedding_scores_exactly_one(self, spark):
        # eval doc "a b c d e f" (4 trigrams) verbatim inside a much
        # larger train doc -> containment exactly 1_000_000 ppm
        filler = " ".join(f"x{i}" for i in range(100))
        train = _docs(spark, [(1, f"{filler} a b c d e f {filler}")])
        ev = _docs(spark, [(100, "a b c d e f")])
        [r] = containment_scores(train, ev).collect()
        assert (r.train_doc_id, r.eval_doc_id) == (1, 100)
        assert r.n_shared == 4
        assert r.containment_ppm == 1_000_000

    def test_partial_overlap_exact_ppm(self, spark):
        # train shares exactly {abc, def} of eval's 4 trigrams -> 1/2
        train = _docs(spark, [(1, "a b c z d e f")])
        ev = _docs(spark, [(100, "a b c d e f")])
        [r] = containment_scores(train, ev).collect()
        assert r.n_shared == 2
        assert r.containment_ppm == 500_000

    def test_disjoint_docs_emit_no_row(self, spark):
        train = _docs(spark, [(1, "p q r s t u")])
        ev = _docs(spark, [(100, "a b c d e f")])
        assert containment_scores(train, ev).count() == 0

    def test_truncation_not_rounding(self, spark):
        # 1 of 3 eval trigrams shared: 1_000_000 div 3 = 333_333 (both
        # engines truncate; a rounding implementation would give 333_333
        # here too, so also pin 2/3 -> 666_666, where HALF_UP gives
        # 666_667)
        train = _docs(spark, [(1, "a b c d x z")])  # shares abc,bcd of 3?
        ev = _docs(spark, [(100, "a b c d e")])  # trigrams abc,bcd,cde
        [r] = containment_scores(train, ev).collect()
        assert r.n_shared == 2
        assert r.containment_ppm == 666_666

    def test_duplicate_shingles_in_train_count_once(self, spark):
        # repeated "a b c" runs in train must not inflate n_shared
        train = _docs(spark, [(1, "a b c z a b c z a b c")])
        ev = _docs(spark, [(100, "a b c")])
        [r] = containment_scores(train, ev).collect()
        assert r.n_shared == 1 and r.containment_ppm == 1_000_000

    def test_random_corpora_match_python_reference(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        word = st.integers(min_value=0, max_value=11).map(lambda i: f"w{i}")
        doc = st.lists(word, min_size=0, max_size=25).map(" ".join)

        def ref_trigrams(text):
            toks = text.split(" ")
            return {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }

        @settings(
            max_examples=5,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(
            st.lists(doc, min_size=1, max_size=5),
            st.lists(doc, min_size=1, max_size=3),
        )
        def run(train_texts, eval_texts):
            train = _docs(spark, list(enumerate(train_texts)))
            ev = _docs(
                spark, [(1000 + i, t) for i, t in enumerate(eval_texts)]
            )
            got = {
                (r.train_doc_id, r.eval_doc_id): (
                    r.n_shared,
                    r.containment_ppm,
                )
                for r in containment_scores(train, ev).collect()
            }
            expect = {}
            for ti, tt in enumerate(train_texts):
                for ei, et in enumerate(eval_texts):
                    inter = len(ref_trigrams(tt) & ref_trigrams(et))
                    if inter:
                        expect[(ti, 1000 + ei)] = (
                            inter,
                            inter * 1_000_000 // len(ref_trigrams(et)),
                        )
            assert got == expect, (got, expect)

        run()

    def test_catches_embedding_jaccard_misses(self, spark):
        # the motivating asymmetry: eval fully inside a 200-word train
        # doc scores 1.0 containment while trigram-Jaccard is far below
        # any practical dedup threshold
        filler = " ".join(f"w{i}" for i in range(200))
        corpus = _docs(
            spark,
            [
                (1, f"{filler} a b c d e f"),
                (2, "a b c d e f"),
            ],
        )
        jac = ngram_jaccard_pairs(corpus, threshold=0.5).count()
        assert jac == 0  # Jaccard ~ 4/204: invisible at any sane cutoff
        [r] = containment_scores(
            corpus.where("doc_id = 1"), corpus.where("doc_id = 2")
        ).collect()
        assert r.containment_ppm == 1_000_000
