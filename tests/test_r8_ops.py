"""Adversarial seeded-frame tests for the round-8 operators.

Generated data never exercises a duplicate group whose copies differ in
raw quality, a near-dup pair that straddles a hash-split boundary, exact
hand-countable hapax/TTR ratios, negative embedding components through
the floor-scaled anisotropy path, or NULL-bearing measure columns in the
stats collector. These tests seed hand-built tables, assert exact
hand-computed values, AND run the registered DuckDB oracle on the same
seeded tables (the test_r6/r7_ops pattern).
"""

from __future__ import annotations

import glob
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from mongodb_cdc_delta_spark.queries import all_queries

REG = all_queries()


def _bucket(key: int) -> int:
    return ((key % 100003) * 2654435761 + 7919) % 2147483648 % 10000


def _split_of(key: int) -> str:
    b = _bucket(key)
    return "val" if b < 500 else ("test" if b < 1000 else "train")


def _ids_by_split(start: int, want: dict[str, int]) -> dict[str, list[int]]:
    """Scan ids upward from `start` until each split has `want` ids."""
    got: dict[str, list[int]] = {"train": [], "test": [], "val": []}
    i = start
    while any(len(got[s]) < n for s, n in want.items()):
        s = _split_of(i)
        if len(got[s]) < want.get(s, 0):
            got[s].append(i)
        i += 1
    return got


def _write_documents(path, rows):
    """rows: (doc_id, text, source)."""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array([r[2] for r in rows], pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
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


def _write_lineitem_measures(path, rows):
    """rows: (l_quantity, l_extendedprice, l_discount, l_tax) — Nones ok."""
    n = len(rows)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(range(n), pa.int64()),
                "l_partkey": pa.array([1] * n, pa.int64()),
                "l_suppkey": pa.array([1] * n, pa.int64()),
                "l_linenumber": pa.array(range(1, n + 1), pa.int32()),
                "l_quantity": pa.array([r[0] for r in rows], pa.float64()),
                "l_extendedprice": pa.array(
                    [r[1] for r in rows], pa.float64()
                ),
                "l_discount": pa.array([r[2] for r in rows], pa.float64()),
                "l_tax": pa.array([r[3] for r in rows], pa.float64()),
                "l_returnflag": pa.array(["N"] * n, pa.string()),
                "l_linestatus": pa.array(["O"] * n, pa.string()),
                "l_shipdate": pa.array([None] * n, pa.timestamp("us")),
            }
        ),
        str(path),
    )


def _run_both(spark, name: str, sf_dir: str):
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
    return sorted(s_rows), sorted(d_rows)


class TestSplitLeakage:
    def test_straddling_pair_counted(self, spark, tmp_path):
        # one near-dup TRIPLE straddling train/test, one train-internal
        # pair, one unique doc. Texts share all trigrams within a family.
        ids = _ids_by_split(0, {"train": 3, "test": 1})
        a, b, c = ids["train"][0], ids["train"][1], ids["test"][0]
        d = ids["train"][2]
        rows = [
            (a, "alpha beta gamma delta", "s0"),
            (b, "alpha beta gamma delta", "s0"),
            (c, "alpha beta gamma delta", "s0"),
            (d, "epsilon zeta eta theta", "s0"),
            (99991, "iota kappa lambda", "s0"),
        ]
        _write_documents(tmp_path / "documents.parquet", rows)
        s_rows, d_rows = _run_both(spark, "split_leakage_report", str(tmp_path))
        assert s_rows == d_rows
        got = {(r[0], r[1]): (r[2], r[3]) for r in s_rows}
        # pairs (a,b) within train; (a,c) and (b,c) straddle test/train
        assert got[("train", "train")] == (1, 2)
        assert got[("test", "train")] == (2, 3)


class TestClusterAwareSplit:
    def test_family_lands_on_one_side(self, spark, tmp_path):
        # the cluster label is min(doc_id in component); pick a family
        # whose members' PER-DOC splits differ so the per-doc split
        # would leak, then assert the cluster split does not.
        ids = _ids_by_split(0, {"train": 2, "test": 1, "val": 1})
        fam = [ids["train"][0], ids["test"][0], ids["val"][0]]
        solo = ids["train"][1]
        rows = [(i, "mu nu xi omicron pi", "s0") for i in fam]
        rows.append((solo, "rho sigma tau upsilon", "s0"))
        _write_documents(tmp_path / "documents.parquet", rows)
        s_rows, d_rows = _run_both(spark, "cluster_aware_split", str(tmp_path))
        assert s_rows == d_rows
        by_split = {r[0]: r for r in s_rows}
        # every row's computed leak count is zero
        assert all(r[4] == 0 for r in s_rows)
        cluster_split = _split_of(min(fam))
        fam_row = by_split[cluster_split]
        # the whole family (3 docs, 1 cluster) is on the cluster's side
        assert fam_row[1] >= 3 and fam_row[2] >= 1
        total_docs = sum(r[1] for r in s_rows)
        assert total_docs == len(rows)


class TestDedupQualityKeep:
    def test_richest_copy_wins(self, spark, tmp_path):
        # group = same normalized distinct-token SET: docs 1-4 all map to
        # {a, b} (case/whitespace variants, a word-SHUFFLED copy, and a
        # stutter-duplicated copy). Raw distinct tokens differ: doc 1 has
        # {A,b,a,B}=4, the rest 2. Keep = doc 1. A second group ties on
        # 2 distinct tokens -> min doc_id wins. Singleton doc emits no
        # row.
        rows = [
            (1, "A  b a B", "s0"),
            (2, "a b a b", "s0"),
            (3, "b a  b a", "s0"),  # shuffled word order, same set
            (4, "a a a b", "s0"),  # stutter multiplicity, same set
            (10, "x y", "s0"),
            (11, "y  x", "s0"),
            (20, "unique text here", "s0"),
        ]
        _write_documents(tmp_path / "documents.parquet", rows)
        s_rows, d_rows = _run_both(spark, "dedup_quality_keep", str(tmp_path))
        assert s_rows == d_rows
        got = {r[1]: (r[2], r[3]) for r in s_rows}  # keep_id -> (n, ntok)
        assert got == {1: (4, 4), 10: (2, 2)}


class TestHapaxRatio:
    def test_hand_counted_ratios(self, spark, tmp_path):
        # s1: "a a b" + "b c" -> tokens 5, types 3 (a:2 b:2 c:1),
        # hapax 1; ttr = 3e6 // 5 = 600000; hapax = 1e6 // 3 = 333333.
        # s2: "x" -> 1/1/1, ttr = hapax = 1000000. Empty-token guard:
        # double space in s1 must not create a '' token.
        rows = [
            (1, "a  a b", "s1"),
            (2, "b c", "s1"),
            (3, "x", "s2"),
        ]
        _write_documents(tmp_path / "documents.parquet", rows)
        s_rows, d_rows = _run_both(spark, "hapax_ratio_report", str(tmp_path))
        assert s_rows == d_rows
        got = {r[0]: r[1:] for r in s_rows}
        assert got["s1"] == (5, 3, 1, 600000, 333333)
        assert got["s2"] == (1, 1, 1, 1000000, 1000000)


class TestEmbeddingAnisotropy:
    def test_aligned_opposed_and_negative_fraction(self, spark, tmp_path):
        # label 0: two identical unit vectors -> anisotropy exactly 1e6.
        # label 1: opposed vectors -> mean is zero -> anisotropy 0; the
        # -1.0 and -0.5 components drive floor() on negatives.
        rows = [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.0], 0),
            (3, [1.0, 0.0], 1),
            (4, [-1.0, 0.0], 1),
            (5, [-0.5, 0.5], 2),
        ]
        _write_embeddings(tmp_path / "embeddings.parquet", rows)
        s_rows, d_rows = _run_both(
            spark, "embedding_anisotropy_report", str(tmp_path)
        )
        assert s_rows == d_rows
        got = {r[0]: r[1:] for r in s_rows}
        assert got[0] == (2, 1_000_000, 1_000_000_000_000)
        assert got[1] == (2, 0, 1_000_000_000_000)
        # label 2: m = (-500000, 500000); num = 2*25e10 = 5e11;
        # den = 5e11; n = 1 -> ppm = 5e11*1e6 // 5e11 = 1e6
        assert got[2] == (1, 1_000_000, 500_000_000_000)


class TestAnalyzeColumnStats:
    def test_nulls_and_ndv(self, spark, tmp_path):
        rows = [
            (1.0, 10.0, 0.1, None),
            (1.0, 20.0, 0.1, 0.02),
            (2.0, 20.0, None, 0.02),
            (None, 30.0, 0.3, 0.02),
        ]
        _write_lineitem_measures(tmp_path / "lineitem.parquet", rows)
        s_rows, d_rows = _run_both(
            spark, "analyze_column_stats", str(tmp_path)
        )
        assert s_rows == d_rows
        got = {r[0]: r[1:] for r in s_rows}
        assert got["l_quantity"] == (4, 1, 2, 1.0, 2.0)
        assert got["l_extendedprice"] == (4, 0, 3, 10.0, 30.0)
        assert got["l_discount"] == (4, 1, 2, 0.1, 0.3)
        assert got["l_tax"] == (4, 1, 1, 0.02, 0.02)


class TestEquiwidthHistogram:
    def test_exact_bins_and_max_clamp(self, spark, tmp_path):
        # prices 0..8: lo=0, hi=8, width 1. v=8 floors to bin 8 ->
        # clamped to 7, so bin 7 holds {7.0, 8.0}.
        rows = [(1.0, float(v), 0.0, 0.0) for v in range(9)]
        _write_lineitem_measures(tmp_path / "lineitem.parquet", rows)
        s_rows, d_rows = _run_both(
            spark, "column_equiwidth_histogram", str(tmp_path)
        )
        assert s_rows == d_rows
        got = {r[0]: (r[1], r[2]) for r in s_rows}
        assert got[7] == (2, 7.0)
        assert all(got[b] == (1, float(b)) for b in range(7))


def _ids_by_slice(start: int, n_new: int, n_existing: int):
    """Scan ids upward: ids whose bucket >= 9000 are 'new' (the
    incremental-dedup increment slice), the rest 'existing'."""
    new_ids, old_ids = [], []
    i = start
    while len(new_ids) < n_new or len(old_ids) < n_existing:
        (new_ids if _bucket(i) >= 9000 else old_ids).append(i)
        i += 1
    return new_ids[:n_new], old_ids[:n_existing]


class TestIncrementalDedup:
    """Seeded increment-vs-corpus families (generated data has no
    cross-slice twins): a new doc with an existing twin, a pure-new pair,
    an existing-only pair (must be excluded), a doc with BOTH kinds of
    twin (vs_existing must win so it is not double-counted), and a
    unique new doc."""

    def _seed(self, tmp_path):
        new, old = _ids_by_slice(0, 6, 4)
        x, y, z, w, q, p = sorted(new)
        e1, e2, e3, e4 = sorted(old)
        rows = [
            # F1: new X twins existing E1 -> new_existing, X dropped
            (e1, "alpha beta gamma delta", "s0"),
            (x, "alpha beta gamma delta", "s0"),
            # F2: pure-new pair (Y < Z) -> new_new, Z dropped, Y kept
            (y, "epsilon zeta eta theta", "s0"),
            (z, "epsilon zeta eta theta", "s0"),
            # F3: existing-only pair -> must NOT appear in any output
            (e2, "iota kappa lambda mu", "s0"),
            (e3, "iota kappa lambda mu", "s0"),
            # F4: Q and P (Q < P) both twin existing E4 and each other:
            # both drop vs_existing; P must not ALSO count as new_only
            (e4, "nu xi omicron pi", "s0"),
            (q, "nu xi omicron pi", "s0"),
            (p, "nu xi omicron pi", "s0"),
            # W: unique new doc -> kept
            (w, "rho sigma tau upsilon", "s0"),
        ]
        _write_documents(tmp_path / "documents.parquet", rows)
        return x, y, z, w, q, p

    def test_pair_classes_exact(self, spark, tmp_path):
        self._seed(tmp_path)
        s_rows, d_rows = _run_both(
            spark, "dedup_incremental_pairs", str(tmp_path)
        )
        assert s_rows == d_rows
        got = {r[0]: (r[1], r[2]) for r in s_rows}
        # 3 new_existing pairs (X-E1, Q-E4, P-E4) over 3 distinct new docs
        assert got["new_existing"] == (3, 3)
        # 2 new_new pairs (Y-Z, Q-P) over 4 distinct new docs
        assert got["new_new"] == (2, 4)

    def test_keep_decision_exact(self, spark, tmp_path):
        self._seed(tmp_path)
        s_rows, d_rows = _run_both(
            spark, "dedup_incremental_keep", str(tmp_path)
        )
        assert s_rows == d_rows
        ((n_new, vs_existing, new_only, kept),) = s_rows
        assert n_new == 6
        assert vs_existing == 3  # X, Q, P
        assert new_only == 1  # Z (P already dropped vs existing)
        assert kept == 2  # W and Y
