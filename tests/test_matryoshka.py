"""Seeded adversarial tests for matryoshka_recall_report.

Two hand-constructed corpora pin the report's endpoints:

- prefix-faithful: every vector is its 8-dim prefix tiled 8x, so the
  cosine ordering is IDENTICAL at every truncation — recall@10 must be
  exactly 1.0 (1_000_000 ppm) for all four dims.
- prefix-blind: all corpus vectors share one constant 8-dim prefix
  (cosine ties broken by vec_id → top-10 = lowest ids), while dims 9-64
  make the TRUE top-10 the HIGHEST ids — recall@10 at dim 8 must be
  exactly 0.

Both cases also run the registered DuckDB oracle on the seeded parquet,
so the cross-engine tie-break (rounded cosine desc, vec_id asc) is
proven at the degenerate all-ties edge."""

from __future__ import annotations

import glob
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from mongodb_cdc_delta_spark.queries import all_queries

REG = all_queries()


import pytest  # noqa: E402  (fast-tier marker below)

# r11 fast-tier: moved to the slow (full-battery) lane in r11 so the default fast tier stays <15 min; this surface remains covered by the full battery and by the oracle-parity/plan-gate suites that stay in the fast lane
pytestmark = pytest.mark.slow

def _write_embeddings(path, vecs):
    """vecs: list of (vec_id, [64 floats])."""
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
                "embedding": pa.array(
                    [v[1] for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * len(vecs), pa.int32()),
            }
        ),
        str(path),
    )


def _run_both(spark, sf_dir):
    q = REG["matryoshka_recall_report"]
    sdf = q.fn(spark, sf_dir)
    s_rows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.splitext(os.path.basename(f))[0]
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{f}')"
        )
    cur = con.execute(q.oracle)
    d_cols = [d[0] for d in cur.description]
    idx = [d_cols.index(c) for c in sdf.columns]
    d_rows = sorted(tuple(r[i] for i in idx) for r in cur.fetchall())
    assert s_rows == d_rows, "cross-engine mismatch on seeded frame"
    return {r[0]: r for r in s_rows}  # by trunc_dim


def _tiled(prefix8):
    return [float(x) for x in prefix8] * 8


class TestMatryoshkaRecall:
    def test_prefix_faithful_corpus_scores_full_recall(
        self, spark, tmp_path
    ):
        # vector i has prefix (1, i, i^2 mod 7, ..., arbitrary but
        # distinct); tiling it preserves cosine order at every dim
        vecs = [
            (i, _tiled([1.0, i % 5 + 1, i % 7 + 1, i % 3 + 1,
                        i % 11 + 1, 2.0, i % 2 + 1, 3.0]))
            for i in range(30)
        ]
        _write_embeddings(tmp_path / "embeddings.parquet", vecs)
        by_dim = _run_both(spark, str(tmp_path))
        assert set(by_dim) == {8, 16, 32, 64}
        for d, (_, n_queries, overlap, ppm) in by_dim.items():
            assert n_queries == 10
            assert overlap == 100, f"dim {d}: overlap {overlap}"
            assert ppm == 1_000_000

    def test_prefix_blind_corpus_scores_zero_recall(self, spark, tmp_path):
        # queries 0-9: constant prefix, tail favors HIGH ids. corpus
        # 10-29: identical prefix (all cosine ties at dim 8 -> top-10 by
        # vec_id asc = ids 10-19) but tail = [i, 1, 1, ...] aligned with
        # the query tail direction increasingly with i -> true top-10 at
        # dim 64 = ids 20-29. Zero overlap at dim 8.
        def vec(i):
            prefix = [1.0] * 8
            tail = [0.0] * 56
            tail[0] = float(i)  # larger i -> closer to query direction
            tail[1] = 1.0
            return prefix + tail

        qtail = [0.0] * 56
        qtail[0] = 1000.0  # query points along tail[0]
        qtail[1] = 1.0
        vecs = [(i, [1.0] * 8 + qtail) for i in range(10)]
        vecs += [(i, vec(i)) for i in range(10, 30)]
        _write_embeddings(tmp_path / "embeddings.parquet", vecs)
        by_dim = _run_both(spark, str(tmp_path))
        # dim 8: all cosines tie at 1.0 -> top-10 = ids 10-19;
        # dim 64 truth: cosine strictly increases with i -> ids 20-29
        assert by_dim[8][2] == 0 and by_dim[8][3] == 0
        assert by_dim[64][2] == 100 and by_dim[64][3] == 1_000_000


class TestQueryPoolCap:
    """matryoshka_recall's max_queries cap (r8 verdict #2): deterministic
    hash-sampled query pool above the cap, bit-identical no-op below it —
    the build_pq_codebooks(train_rows=...) regime."""

    def _frame(self, spark, n_queries=24, n_corpus=40):
        import random

        rng = random.Random(11)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(64)])
            for i in range(n_queries + n_corpus)
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        queries = emb.where(f"vec_id < {n_queries}").selectExpr(
            "vec_id as qid", "embedding as qv"
        )
        corpus = emb.where(f"vec_id >= {n_queries}")
        return corpus, queries

    def test_cap_is_noop_below(self, spark):
        from mongodb_cdc_delta_spark.ops.similarity import matryoshka_recall

        corpus, queries = self._frame(spark)
        capped = sorted(
            map(tuple, matryoshka_recall(corpus, queries).collect())
        )
        uncapped = sorted(
            map(
                tuple,
                matryoshka_recall(
                    corpus, queries, max_queries=None
                ).collect(),
            )
        )
        assert capped == uncapped
        assert capped[0][1] == 24  # n_queries: full pool used

    def test_cap_samples_deterministically_above(self, spark):
        from pyspark.sql import functions as F

        from mongodb_cdc_delta_spark.ops.similarity import matryoshka_recall

        corpus, queries = self._frame(spark)
        capped = sorted(
            map(
                tuple,
                matryoshka_recall(
                    corpus, queries, max_queries=8, seed=7
                ).collect(),
            )
        )
        # the cap must reduce the pool, and the result must equal running
        # UNCAPPED on the explicit hash-sampled pool (same predicate) —
        # i.e. the cap is exactly a deterministic pre-filter
        n_used = capped[0][1]
        assert 0 < n_used < 24
        frac_ppm = 8 * 1_000_000 // 24
        sampled = queries.where(
            F.pmod(F.xxhash64(F.col("qid") + F.lit(7)), F.lit(1_000_000))
            < F.lit(frac_ppm)
        )
        explicit = sorted(
            map(
                tuple,
                matryoshka_recall(
                    corpus, sampled, max_queries=None
                ).collect(),
            )
        )
        assert capped == explicit
        # rerun: same sample, same numbers (determinism)
        again = sorted(
            map(
                tuple,
                matryoshka_recall(
                    corpus, queries, max_queries=8, seed=7
                ).collect(),
            )
        )
        assert capped == again

    def test_empty_query_pool_degrades_to_zero_rows_not_error(self, spark):
        """r9 ADVICE: n = 0 must yield recall_ppm 0 per dim, not an ANSI
        divide-by-zero; and the pool-size check must not crash on an
        empty frame."""
        from mongodb_cdc_delta_spark.ops.similarity import matryoshka_recall

        corpus, queries = self._frame(spark)
        empty = queries.where("qid < -1")
        rows = sorted(
            map(tuple, matryoshka_recall(corpus, empty).collect())
        )
        assert [r[1:] for r in rows] == [(0, 0, 0)] * 4
