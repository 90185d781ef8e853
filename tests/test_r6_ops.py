"""Adversarial seeded-frame tests for the round-6 operators.

bm25_retrieval_topk / knn_label_purity / lsh_band_sweep_recall /
key_skew_report pass the driver's oracle check on generated data — but
generated data never exercises df=0 query terms, sub-10 neighbor pools,
an empty truth set, score ties at the LIMIT boundary, or a hand-checkable
skew distribution. These tests seed hand-built tables, assert exact
hand-computed values, AND run the registered DuckDB oracle on the same
seeded tables (the test_tpch_analytics_adversarial pattern)."""

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


class TestBm25Adversarial:
    def _seed(self, tmp_path):
        # doc 0: 'spark' x2 in 4 words; doc 1: 'spark' x1 + 'window' x1
        # in 6 words; doc 2: no query terms (must not appear);
        # docs 3 and 4: identical text (score tie -> doc_id order)
        _write_documents(
            tmp_path / "documents.parquet",
            [
                (0, "spark spark alpha beta"),
                (1, "spark window alpha beta gamma delta"),
                (2, "alpha beta gamma delta epsilon zeta eta theta"),
                (3, "window window alpha beta"),
                (4, "window window alpha beta"),
            ],
        )

    @staticmethod
    def _score_micro(n, df, tf, dl, avgdl):
        # mirrors the registered expression ops in order
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return math.floor(
            idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) * 1e6
        )

    def test_hand_computed_scores_and_tie(self, spark, tmp_path):
        self._seed(tmp_path)
        s_rows, d_rows = _run_both(
            spark, "bm25_retrieval_topk", str(tmp_path), ordered=True
        )
        assert s_rows == d_rows
        n, avgdl = 5.0, (4 + 6 + 8 + 4 + 4) / 5.0
        sc = self._score_micro
        expect = {
            0: sc(n, 2, 2, 4, avgdl),                       # spark x2
            1: sc(n, 2, 1, 6, avgdl) + sc(n, 3, 1, 6, avgdl),
            3: sc(n, 3, 2, 4, avgdl),
            4: sc(n, 3, 2, 4, avgdl),
        }
        got = {r[0]: r[2] for r in s_rows}
        assert got == expect
        assert all(r[0] != 2 for r in s_rows), "no-hit doc must not rank"
        # identical docs tie exactly -> doc_id ascending within the tie
        i3 = [r[0] for r in s_rows].index(3)
        i4 = [r[0] for r in s_rows].index(4)
        assert i3 < i4
        # n_terms_hit column
        hits = {r[0]: r[1] for r in s_rows}
        assert hits == {0: 1, 1: 2, 3: 1, 4: 1}


class TestKnnLabelPurityAdversarial:
    def test_small_pool_and_exact_purity(self, spark, tmp_path):
        # 3 queries (vec_id 0,1,2 < 20) + 4 corpus vectors (>= 20):
        # q0 is axis-x with label 7; corpus has two label-7 vectors near
        # axis-x and two label-8 vectors near axis-y. Pool size 4+2
        # OTHER queries = every non-self vector, so n_top = 6 (< 10) —
        # the ppm denominator must be the REAL pool, not 10.
        vecs = [
            (0, [1.0, 0.0, 0.0, 0.0], 7),
            (1, [0.0, 1.0, 0.0, 0.0], 8),
            (2, [0.0, 0.0, 1.0, 0.0], 9),
            (20, [0.9, 0.1, 0.0, 0.0], 7),
            (21, [0.8, 0.2, 0.0, 0.0], 7),
            (22, [0.1, 0.9, 0.0, 0.0], 8),
            (23, [0.2, 0.8, 0.0, 0.0], 8),
        ]
        _write_embeddings(tmp_path / "embeddings.parquet", vecs)
        s_rows, d_rows = _run_both(
            spark, "knn_label_purity", str(tmp_path)
        )
        assert s_rows == d_rows
        by_q = {r[0]: r for r in s_rows}
        assert set(by_q) == {0, 1, 2}
        # every query sees all 6 non-self vectors
        assert all(r[2] == 6 for r in s_rows)
        # q0 (label 7): matches are exactly vecs 20, 21
        assert by_q[0][3] == 2
        assert by_q[0][4] == 2 * 1_000_000 // 6
        # q1 (label 8): matches are exactly vecs 22, 23
        assert by_q[1][3] == 2
        # q2 (label 9): nothing shares its label
        assert by_q[2][3] == 0 and by_q[2][4] == 0


class TestLshBandSweepAdversarial:
    def test_identical_pair_always_caught(self, spark, tmp_path):
        # docs 0,1 identical (J=1: truth AND identical signatures ->
        # candidate at every band width); docs 2,3 disjoint from all
        _write_documents(
            tmp_path / "documents.parquet",
            [
                (0, "alpha beta gamma delta epsilon"),
                (1, "alpha beta gamma delta epsilon"),
                (2, "one two three four five six"),
                (3, "seven eight nine ten eleven twelve"),
            ],
        )
        s_rows, d_rows = _run_both(
            spark, "lsh_band_sweep_recall", str(tmp_path)
        )
        assert s_rows == d_rows
        assert len(s_rows) == 3
        for rows_per_band, n_bands, n_truth, n_cand, n_caught, rec in s_rows:
            assert n_bands == 32 // rows_per_band
            assert n_truth == 1  # only the identical pair
            assert n_caught == 1
            assert rec == 1_000_000

    def test_empty_truth_reads_zero_recall(self, spark, tmp_path):
        # no pair reaches J >= 0.5: the guarded floor division must
        # read recall 0, not divide by zero
        _write_documents(
            tmp_path / "documents.parquet",
            [
                (0, "alpha beta gamma delta epsilon"),
                (1, "one two three four five six"),
            ],
        )
        s_rows, d_rows = _run_both(
            spark, "lsh_band_sweep_recall", str(tmp_path)
        )
        assert s_rows == d_rows
        assert all(r[2] == 0 and r[5] == 0 for r in s_rows)


class TestKeySkewAdversarial:
    def test_hand_computed_shares(self, spark, tmp_path):
        # l_orderkey: key 1 x6, key 2 x2, key 3 x2 (hot key = 60%)
        # l_partkey: uniform 10 distinct (top1 = 10%, hhi = 1/10)
        # l_suppkey: all one key (degenerate max concentration)
        rows = [
            (1, p, 99) for p in range(6)
        ] + [(2, 6, 99), (2, 7, 99), (3, 8, 99), (3, 9, 99)]
        _write_lineitem_keys(tmp_path / "lineitem.parquet", rows)
        s_rows, d_rows = _run_both(spark, "key_skew_report", str(tmp_path))
        assert s_rows == d_rows
        by_key = {r[0]: r for r in s_rows}
        ok = by_key["l_orderkey"]
        assert ok[1:] == (
            10,  # n_rows
            3,   # n_keys
            600_000,  # 6/10
            1_000_000,  # top-10 covers all 3 keys
            (36 + 4 + 4) * 1_000_000_000 // 100,  # hhi
        )
        pk = by_key["l_partkey"]
        assert pk[1:] == (10, 10, 100_000, 1_000_000, 100_000_000)
        sk = by_key["l_suppkey"]
        assert sk[1:] == (10, 1, 1_000_000, 1_000_000, 1_000_000_000)


class TestNgramNoveltyAdversarial:
    def test_saturating_vs_growing_corpus(self, spark, tmp_path):
        # docs 0-4 all share ONE trigram vocabulary ("a b c d e" -> 3
        # shingles, all first seen in decile of doc 0); docs 5-9 each
        # introduce a fresh disjoint trigram set. With 10 docs, doc i
        # lands in decile i exactly (i*10//10 = i).
        rows = [(i, "a b c d e") for i in range(5)] + [
            (5, "f g h"),
            (6, "i j k"),
            (7, "l m n"),
            (8, "o p q"),
            (9, "r s t"),
        ]
        _write_documents(tmp_path / "documents.parquet", rows)
        s_rows, d_rows = _run_both(
            spark, "ngram_novelty_curve", str(tmp_path)
        )
        assert s_rows == d_rows
        by_dec = {r[0]: r for r in s_rows}
        # decile 0: the 3 shared shingles first appear at doc 0
        assert by_dec[0][1] == 3
        # deciles 1-4 introduce nothing new (pure repetition)
        for d in (1, 2, 3, 4):
            assert d not in by_dec
        # deciles 5-9: one fresh shingle each
        for d in (5, 6, 7, 8, 9):
            assert by_dec[d][1] == 1
        # cumulative reaches the full distinct count; shares sum ~1e6
        assert by_dec[9][2] == 8
        assert by_dec[0][3] == 3 * 1_000_000 // 8

    def test_single_doc_short_text(self, spark, tmp_path):
        # a 2-token doc yields no trigrams; a 3-token doc yields one
        _write_documents(
            tmp_path / "documents.parquet",
            [(0, "x y"), (1, "a b c")],
        )
        s_rows, d_rows = _run_both(
            spark, "ngram_novelty_curve", str(tmp_path)
        )
        assert s_rows == d_rows
        assert s_rows == [(5, 1, 1, 1_000_000)]  # doc 1 of 2 -> decile 5


class TestEmbeddingNormOutliersAdversarial:
    def test_outlier_and_collapsed_detection(self, spark, tmp_path):
        # label 0: nine unit vectors + one 3x outlier — mean norm2
        # (9+9)/10 = 1.8, so 9 > 3.6 flags ONLY the outlier and the
        # units (1 > 0.9) stay unflagged; label 1: nine units + one
        # 0.1-norm collapsed — mean (9+0.01)/10 = 0.901, so 0.01 <
        # 0.4505 flags ONLY the collapsed one; label 2: uniform 2x
        # vectors, no flags
        unit = [1.0, 0.0, 0.0, 0.0]
        vecs = (
            [(i, unit, 0) for i in range(9)]
            + [(9, [3.0, 0.0, 0.0, 0.0], 0)]
            + [(10 + i, unit, 1) for i in range(9)]
            + [(19, [0.1, 0.0, 0.0, 0.0], 1)]
            + [(20, [2.0, 0.0, 0.0, 0.0], 2), (21, [0.0, 2.0, 0.0, 0.0], 2)]
        )
        _write_embeddings(tmp_path / "embeddings.parquet", vecs)
        s_rows, d_rows = _run_both(
            spark, "embedding_norm_outliers", str(tmp_path)
        )
        assert s_rows == d_rows
        by_label = {r[0]: r for r in s_rows}
        n0 = by_label[0]
        assert n0[1] == 10
        assert n0[2] == 18_000_000 // 10
        assert n0[3] == 1 and n0[4] == 0
        n1 = by_label[1]
        assert n1[1] == 10
        assert n1[3] == 0 and n1[4] == 1
        n2 = by_label[2]
        assert n2[1:] == (2, 4_000_000, 0, 0)

    def test_float32_widening_is_exact(self, spark, tmp_path):
        # 0.1 is not exact in float32; both engines must widen the SAME
        # float32 bits to double, so micro-norms agree exactly
        vecs = [(i, [0.1, 0.2, 0.3], 0) for i in range(3)]
        _write_embeddings(tmp_path / "embeddings.parquet", vecs)
        s_rows, d_rows = _run_both(
            spark, "embedding_norm_outliers", str(tmp_path)
        )
        assert s_rows == d_rows
        assert s_rows[0][3] == 0 and s_rows[0][4] == 0
