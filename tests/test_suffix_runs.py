"""Suffix-run decontamination: seeded-overlap behavior, equivalence vs the
stride-gram method where both apply, and the no-stride advantage below the
stride method's 30-char detection floor."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.ops.dedup import (
    _SR_L,
    exact_substring_flags,
    suffix_run_flags,
)

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _filler(seed: int, n: int) -> str:
    # deterministic junk with no 20-char self-overlap across seeds
    return "".join(
        ALPHA[(seed * 7 + i * 13 + i * i) % 26] for i in range(n)
    )


RUN40 = "the quick brown fox jumps over the lazy "  # 40 chars
RUN25 = "shared twenty-five chars!"  # 25 chars (< 30-char stride floor)


class TestSuffixRunFlags:
    def test_exact_run_length_recovered(self, spark):
        train = _docs(
            spark, [(1, _filler(1, 50) + RUN40 + _filler(2, 50))]
        )
        ev = _docs(spark, [(100, _filler(3, 30) + RUN40 + _filler(4, 30))])
        [r] = suffix_run_flags(train, ev).collect()
        assert r.doc_id == 1
        assert r.n_runs == 1
        assert r.longest_run == len(RUN40)  # maximal extent, exact
        assert r.first_pos == 51  # 1-based start of the run

    def test_no_shared_run_no_rows(self, spark):
        train = _docs(spark, [(1, _filler(1, 200))])
        ev = _docs(spark, [(100, _filler(9, 200))])
        assert suffix_run_flags(train, ev).count() == 0

    def test_detects_below_stride_methods_floor(self, spark):
        # a 25-char run: >= gram(20) so the suffix pass MUST find it;
        # the stride method's guarantee only starts at 30 chars
        train = _docs(
            spark, [(1, _filler(1, 61) + RUN25 + _filler(2, 60))]
        )
        ev = _docs(spark, [(100, _filler(3, 40) + RUN25 + _filler(4, 40))])
        [r] = suffix_run_flags(train, ev).collect()
        assert r.longest_run == len(RUN25)
        assert r.first_pos == 62

    def test_equivalence_with_stride_method_on_long_overlaps(self, spark):
        # any run >= 30 chars is inside BOTH methods' guarantees: the
        # flagged doc sets must agree exactly
        train = _docs(
            spark,
            [
                (1, _filler(1, 40) + RUN40 + _filler(2, 40)),  # hit
                (2, _filler(5, 120)),  # clean
                (3, RUN40 + _filler(6, 80)),  # hit at pos 1
            ],
        )
        ev = _docs(spark, [(100, _filler(3, 25) + RUN40 + _filler(4, 25))])
        suffix_ids = {
            r.doc_id for r in suffix_run_flags(train, ev).collect()
        }
        stride_ids = {
            r.doc_id for r in exact_substring_flags(train, ev).collect()
        }
        assert suffix_ids == stride_ids == {1, 3}

    def test_two_separate_runs_counted_separately(self, spark):
        a = "first shared passage is here"  # 28 chars
        b = "and a second shared passage here"  # 32 chars
        train = _docs(
            spark,
            [(1, _filler(1, 30) + a + _filler(2, 30) + b + _filler(7, 30))],
        )
        ev = _docs(
            spark,
            [(100, _filler(3, 20) + b + _filler(4, 20) + a + _filler(8, 20))],
        )
        [r] = suffix_run_flags(train, ev).collect()
        assert r.n_runs == 2
        assert r.longest_run == len(b)

    def test_run_inside_repeated_eval_docs_not_double_merged(self, spark):
        # same run in TWO eval docs → two (doc, eval_doc) islands; the
        # rollup must still report ONE maximal length, n_runs = 2 islands
        train = _docs(spark, [(1, _filler(1, 30) + RUN40 + _filler(2, 30))])
        ev = _docs(
            spark,
            [
                (100, _filler(3, 10) + RUN40 + _filler(4, 10)),
                (101, RUN40 + _filler(5, 15)),
            ],
        )
        [r] = suffix_run_flags(train, ev).collect()
        assert r.longest_run == len(RUN40)
        assert r.n_runs == 2

    def test_short_docs_skipped(self, spark):
        train = _docs(spark, [(1, "tiny"), (2, _filler(1, 100))])
        ev = _docs(spark, [(100, "x" * (_SR_L - 1))])
        assert suffix_run_flags(train, ev).count() == 0


class TestCutSpans:
    def _cut(self, spark, train_rows, eval_rows):
        from mongodb_cdc_delta_spark.ops.dedup import cut_contaminated_spans

        return cut_contaminated_spans(
            _docs(spark, train_rows), _docs(spark, eval_rows)
        ).collect()

    def test_middle_span_removed_exactly(self, spark):
        pre, post = _filler(1, 37), _filler(2, 41)
        [r] = self._cut(
            spark,
            [(1, pre + RUN40 + post)],
            [(100, _filler(3, 25) + RUN40 + _filler(4, 25))],
        )
        assert r.clean_text == pre + post
        assert r.n_spans_cut == 1
        assert r.chars_cut == len(RUN40)

    def test_overlapping_spans_from_two_eval_docs_merge(self, spark):
        # eval doc A shares chars [s, s+40); eval doc B shares a longer
        # window that overlaps it — the cut must be ONE merged interval
        pre, post = _filler(1, 30), _filler(2, 30)
        mid = _filler(5, 10)
        body = RUN40 + mid + RUN25
        [r] = self._cut(
            spark,
            [(1, pre + body + post)],
            [
                (100, _filler(3, 20) + RUN40 + mid + _filler(4, 20)),
                (101, mid + RUN25 + _filler(6, 20)),
            ],
        )
        # RUN40+mid matches doc 100; mid+RUN25 matches doc 101 — the
        # shared `mid` overlap merges them into one contiguous cut
        assert r.n_spans_cut == 1
        assert r.chars_cut == len(body)
        assert r.clean_text == pre + post

    def test_span_at_text_start_and_end(self, spark):
        mid = _filler(1, 50)
        [r] = self._cut(
            spark,
            [(1, RUN40 + mid + RUN25)],
            [(100, RUN25 + _filler(3, 15) + RUN40)],
        )
        assert r.n_spans_cut == 2
        assert r.chars_cut == len(RUN40) + len(RUN25)
        assert r.clean_text == mid

    def test_clean_docs_not_in_output(self, spark):
        rows = self._cut(
            spark,
            [(1, _filler(1, 100)), (2, _filler(2, 60) + RUN40)],
            [(100, RUN40 + _filler(3, 30))],
        )
        assert [r.doc_id for r in rows] == [2]

    def test_cut_and_flags_agree_on_doc_set(self, spark):
        from mongodb_cdc_delta_spark.ops.dedup import suffix_run_flags

        train = _docs(
            spark,
            [
                (1, _filler(1, 40) + RUN40 + _filler(2, 40)),
                (2, _filler(5, 120)),
            ],
        )
        ev = _docs(spark, [(100, RUN40 + _filler(3, 30))])
        cut_ids = {
            r.doc_id
            for r in __import__(
                "mongodb_cdc_delta_spark.ops.dedup", fromlist=["x"]
            ).cut_contaminated_spans(train, ev).collect()
        }
        flag_ids = {r.doc_id for r in suffix_run_flags(train, ev).collect()}
        assert cut_ids == flag_ids == {1}


class TestSuffixRunProperties:
    """Property-based: randomized run geometry, one Spark job per example.

    Side-disjoint filler alphabets (train a-m, eval n-z) and per-case
    unique run content (digits + case index) guarantee zero accidental
    gram matches, so every planted run must be recovered EXACTLY —
    length, start, and count — and nothing else may be flagged."""

    @staticmethod
    def _mk_case(i: int, pre_len: int, run_len: int, post_len: int):
        t_alpha = "abcdefghijklm"
        e_alpha = "nopqrstuvwxyz"

        def fill(alpha, seed, n):
            return "".join(
                alpha[(seed * 5 + k * 11 + k * k) % len(alpha)]
                for k in range(n)
            )

        base = f"<run-{i:03d}>"
        run = (base * (run_len // len(base) + 1))[:run_len]
        train = fill(t_alpha, i * 2 + 1, pre_len) + run + fill(
            t_alpha, i * 2 + 2, post_len
        )
        ev = fill(e_alpha, i * 3 + 1, 15) + run + fill(e_alpha, i * 3 + 2, 20)
        return train, ev, pre_len + 1, run_len

    def test_planted_runs_recovered_exactly(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        geometry = st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=80),   # pre filler
                st.integers(min_value=20, max_value=60),  # run length
                st.integers(min_value=0, max_value=80),   # post filler
            ),
            min_size=1,
            max_size=6,
        )

        @settings(
            max_examples=6,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(geometry)
        def run(cases):
            train_rows, eval_rows, expect = [], [], {}
            for i, (pre, rl, post) in enumerate(cases):
                t, e, pos, length = self._mk_case(i, pre, rl, post)
                train_rows.append((i, t))
                eval_rows.append((1000 + i, e))
                expect[i] = (pos, length)
            # one clean train doc that must never be flagged
            train_rows.append((999, "a" * 0 + "abcdefghijklm" * 10))
            got = {
                r.doc_id: (r.first_pos, r.longest_run, r.n_runs)
                for r in suffix_run_flags(
                    _docs(spark, train_rows), _docs(spark, eval_rows)
                ).collect()
            }
            assert set(got) == set(expect), (got, expect)
            for i, (pos, length) in expect.items():
                gpos, glen, gruns = got[i]
                assert (gpos, glen) == (pos, length), (i, got[i], expect[i])
                # periodic run content legitimately matches at several
                # diagonals (self-overlap) — a suffix array reports those
                # too; the maximal extent and start stay exact
                assert gruns >= 1

        run()
