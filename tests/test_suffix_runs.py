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
