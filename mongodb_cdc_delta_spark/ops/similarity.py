"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the correctness baseline. The query vector is a
  literal broadcast into a JVM-side expression (F.zip_with + F.aggregate) —
  one scan, no shuffle, TakeOrdered for the top-k. At 100 TB this is the
  "exact rescoring" stage.
- IVF (inverted-file) index: coarse k-means-style cells (here: seeded by
  hash-sampled centroids, refined with a few Lloyd iterations computed as
  DataFrame aggregations), rows stored bucketed by cell id; a query probes
  the nprobe nearest cells only — the scan shrinks by ~ncells/nprobe. This
  is the scale path; recall vs brute force is asserted in tests.
- pairwise near-dup: cosine ≥ threshold within a blocking key to bound the
  candidate pair count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import load, register, spread
from ._cache import cache_scoped as _cache_scoped
from ._cache import scoped_cache as _scoped_cache


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a, b):
    """cosine(a, b) as a pure JVM column expression (no Python per row)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _query_vec(spark: SparkSession, sf: str, vec_id: int = 0):
    """The embedding of `vec_id` as a literal array (broadcast scalar)."""
    row = (
        load(spark, sf, "embeddings")
        .where(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return F.array(*[F.lit(float(x)) for x in row[0]])


@register(
    "knn_cosine_topk",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label,
           round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                        (SELECT qv FROM q)), 6) AS cos_sim
    FROM embeddings
    WHERE vec_id <> 0
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT 10
    """,
    description="brute-force cosine top-10 for a query vector; JVM "
    "expressions + TakeOrdered (no sort, no shuffle)",
    tags=("similarity", "topk"),
)
def knn_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    qv = _query_vec(spark, sf, 0)
    emb = load(spark, sf, "embeddings").where(F.col("vec_id") != 0)
    return (
        emb.select(
            "vec_id",
            "label",
            F.round(cosine_col(F.col("embedding"), qv), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


@register(
    "knn_label_purity",
    oracle="""
    WITH q AS (
      SELECT vec_id AS qid, label AS qlab,
             CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 20
    ), scored AS (
      SELECT q.qid, q.qlab, e.vec_id, e.label,
             round(list_cosine_similarity(
                     CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS cos
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.qid
    ), rk AS (
      SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cos DESC, vec_id ASC) AS rk
      FROM scored
    )
    SELECT qid, CAST(qlab AS INT) AS query_label,
           CAST(count(*) AS BIGINT) AS n_top,
           CAST(sum(CASE WHEN label = qlab THEN 1 ELSE 0 END)
                AS BIGINT) AS n_match,
           CAST(sum(CASE WHEN label = qlab THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS purity_ppm
    FROM rk WHERE rk <= 10
    GROUP BY qid, qlab
    """,
    description="embedding-quality eval without a judged set: for each "
    "of 20 query vectors, the fraction of its cosine top-10 neighbors "
    "sharing its label (kNN label purity, the standard intrinsic "
    "check that an embedding space clusters by its supervision "
    "signal). Ranking compares the ROUNDED cosine with a vec_id "
    "tiebreak so cross-engine float ulps cannot flip an order; purity "
    "is integer ppm. Scale: the query batch broadcasts, one corpus "
    "scan scores all queries, per-query top-k is a bounded window — "
    "at production size the candidate set per query comes from the "
    "ANN shortlist (IVF/PQ) instead of the full scan.",
    tags=("similarity", "topk", "report"),
)
def knn_label_purity(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load(spark, sf, "embeddings")
    q = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlab"),
        F.col("embedding").alias("qv"),
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qlab",
            "vec_id",
            "label",
            F.round(cosine_col(F.col("embedding"), F.col("qv")), 6).alias(
                "cos"
            ),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("qid").orderBy(
            F.col("cos").desc(), F.col("vec_id").asc()
        )
    )
    return (
        scored.withColumn("rk", rk)
        .where(F.col("rk") <= 10)
        .groupBy("qid", "qlab")
        .agg(
            F.count("*").alias("n_top"),
            F.sum(
                (F.col("label") == F.col("qlab")).cast("int")
            ).alias("nm"),
        )
        .select(
            "qid",
            F.col("qlab").cast("int").alias("query_label"),
            F.col("n_top").cast("bigint").alias("n_top"),
            F.col("nm").cast("bigint").alias("n_match"),
            F.expr(
                "cast(nm * 1000000 div n_top as bigint)"
            ).alias("purity_ppm"),
        )
    )


@register(
    "embedding_norm_outliers",
    oracle="""
    WITH norms AS (
      SELECT vec_id, label,
             CAST(floor(list_sum(list_transform(
                    CAST(embedding AS DOUBLE[]), x -> x * x)) * 1000000)
                  AS BIGINT) AS norm2_micro
      FROM embeddings
    ), stats AS (
      SELECT label, count(*) AS n_vecs,
             sum(norm2_micro) AS sum_n2
      FROM norms GROUP BY label
    )
    SELECT CAST(s.label AS INT) AS label,
           CAST(n_vecs AS BIGINT) AS n_vecs,
           CAST(sum_n2 // n_vecs AS BIGINT) AS mean_norm2_micro,
           CAST(sum(CASE WHEN norms.norm2_micro * n_vecs > 2 * sum_n2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers_2x,
           CAST(sum(CASE WHEN norms.norm2_micro * 2 * n_vecs < sum_n2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_collapsed_half
    FROM norms JOIN stats s ON s.label = norms.label
    GROUP BY s.label, n_vecs, sum_n2
    """,
    description="embedding-pipeline QA: per label, the vector count, "
    "mean squared norm, and the counts of norm outliers (>2x the label "
    "mean — an unnormalized or corrupted batch) and collapsed vectors "
    "(<half the mean — zeroed/truncated embeddings). Exactly the two "
    "failure modes an embedding ingestion job ships silently. Squared "
    "norms are computed in double (float32 inputs widen exactly) and "
    "floor-scaled to integer micro-units per ROW, so every aggregate "
    "is exact integer arithmetic and the outlier tests are integer "
    "cross-multiplications — no float mean, no add-order dependence. "
    "Scale: one scan, one groupBy(label), one broadcast join back",
    tags=("similarity", "report", "quality"),
)
def embedding_norm_outliers(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    norm2 = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    norms = emb.select(
        "vec_id",
        "label",
        F.floor(norm2 * F.lit(1_000_000)).cast("bigint").alias(
            "norm2_micro"
        ),
    )
    stats = norms.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.sum("norm2_micro").alias("sum_n2"),
    )
    return (
        norms.join(F.broadcast(stats), "label")
        .groupBy("label", "n_vecs", "sum_n2")
        .agg(
            F.sum(
                (
                    F.col("norm2_micro") * F.col("n_vecs")
                    > 2 * F.col("sum_n2")
                ).cast("int")
            ).alias("out2x"),
            F.sum(
                (
                    F.col("norm2_micro") * 2 * F.col("n_vecs")
                    < F.col("sum_n2")
                ).cast("int")
            ).alias("outhalf"),
        )
        .select(
            F.col("label").cast("int").alias("label"),
            F.col("n_vecs").cast("bigint").alias("n_vecs"),
            F.expr("cast(sum_n2 div n_vecs as bigint)").alias(
                "mean_norm2_micro"
            ),
            F.col("out2x").cast("bigint").alias("n_outliers_2x"),
            F.col("outhalf").cast("bigint").alias("n_collapsed_half"),
        )
    )


@register(
    "embedding_near_dup",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6)
             AS cos_sim
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6) >= 0.3
    """,
    description="embedding-cosine near-dup pairs, blocked by label so the "
    "pair space stays bounded (label = coarse cluster at scale)",
    tags=("similarity", "dedup"),
)
def embedding_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings").select("vec_id", "label", "embedding")
    return embedding_near_dup_pairs(emb, threshold=0.3)


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.3, tile: int = 2048
) -> DataFrame:
    """All-pairs cosine ≥ threshold within each label block.

    The in-block product is a dense GEMM — the one place where Arrow + BLAS
    beats JVM expressions by orders of magnitude (Catalyst higher-order
    functions don't codegen; a 200-row block is 20k pairs of interpreted
    64-element folds, vs one sgemm call here).

    Scale guard: the similarity matrix is computed in ``tile``×``tile``
    sub-tiles of the upper triangle, never materialized whole — a 100k-row
    block would otherwise allocate an 80 GB n² matrix and OOM the executor;
    tiled, peak extra memory is tile² · 8 bytes (33 MB at 2048) regardless
    of block size, and each tile is still one BLAS call."""

    def block_pairs(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        E = np.stack(pdf["embedding"].to_numpy()[order]).astype(np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", E, E))
        n_rows = len(ids)
        out_a, out_b, out_c = [], [], []
        for i0 in range(0, n_rows, tile):
            i1 = min(i0 + tile, n_rows)
            for j0 in range(i0, n_rows, tile):
                j1 = min(j0 + tile, n_rows)
                S = (E[i0:i1] @ E[j0:j1].T) / np.outer(
                    norms[i0:i1], norms[j0:j1]
                )
                if i0 == j0:
                    ii, jj = np.triu_indices(i1 - i0, k=1, m=j1 - j0)
                else:
                    ii, jj = np.indices(S.shape).reshape(2, -1)
                cs = np.round(S[ii, jj], 6)
                m = cs >= threshold
                out_a.append(ids[i0:i1][ii[m]])
                out_b.append(ids[j0:j1][jj[m]])
                out_c.append(cs[m])
        if not out_a:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []})
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a),
                "vec_b": np.concatenate(out_b),
                "cos_sim": np.concatenate(out_c),
            }
        )

    return emb.groupBy("label").applyInPandas(
        block_pairs, "vec_a long, vec_b long, cos_sim double"
    )


def _close_lower_counts(
    emb: DataFrame, threshold: float, tile: int = 2048
) -> DataFrame:
    """(vec_id, label, n): for EVERY member of each label block, the
    number of lower-id same-block members with cosine ≥ threshold —
    embedding_near_dup_pairs' pair enumeration folded into a per-member
    count (one output row per input row instead of one per pair, no
    downstream groupBy/join needed). Identical tiling, ordering, and
    round-to-6 as the pair kernel, so the counts equal grouping its
    output by vec_b."""

    def block_counts(pdf):
        import numpy as np
        import pandas as pd

        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        E = np.stack(pdf["embedding"].to_numpy()[order]).astype(np.float64)
        norms = np.sqrt(np.einsum("ij,ij->i", E, E))
        n_rows = len(ids)
        counts = np.zeros(n_rows, dtype=np.int64)
        for i0 in range(0, n_rows, tile):
            i1 = min(i0 + tile, n_rows)
            for j0 in range(i0, n_rows, tile):
                j1 = min(j0 + tile, n_rows)
                S = (E[i0:i1] @ E[j0:j1].T) / np.outer(
                    norms[i0:i1], norms[j0:j1]
                )
                M = np.round(S, 6) >= threshold
                if i0 == j0:
                    # strict upper triangle: row i contributes to col j>i
                    M &= np.tri(i1 - i0, j1 - j0, k=-1, dtype=bool).T
                counts[j0:j1] += M.sum(axis=0)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "label": pdf["label"].to_numpy()[order],
                "n": counts,
            }
        )

    return emb.groupBy("label").applyInPandas(
        block_counts, "vec_id long, label long, n long"
    )


def _quantize(col):
    """Symmetric int8 quantization as a JVM expression: q_i = floor(x_i *
    127 / max|x| + 0.5). floor(v + 0.5) instead of round() because SQL
    engines disagree on round-half (HALF_UP vs banker's); floor is
    bit-identical everywhere. Returns (scale, array<int-valued double>)."""
    xd = F.transform(col, lambda x: x.cast("double"))
    scale = F.array_max(F.transform(xd, lambda x: F.abs(x)))
    q = F.transform(xd, lambda x: F.floor(x * 127.0 / scale + 0.5))
    return scale, q


@register(
    "knn_cosine_topk_int8",
    oracle="""
    WITH qe AS (
      SELECT list_transform(CAST(embedding AS DOUBLE[]),
                            x -> floor(x * 127.0 /
                                 list_max(list_transform(
                                   CAST(embedding AS DOUBLE[]),
                                   y -> abs(y))) + 0.5)) AS qv
      FROM embeddings WHERE vec_id = 0
    ), rows_q AS (
      SELECT vec_id, label,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> floor(x * 127.0 /
                                 list_max(list_transform(
                                   CAST(embedding AS DOUBLE[]),
                                   y -> abs(y))) + 0.5)) AS q
      FROM embeddings WHERE vec_id <> 0
    )
    SELECT vec_id, label,
           round(list_dot_product(q, (SELECT qv FROM qe))
                 / (sqrt(list_dot_product(q, q))
                    * sqrt((SELECT list_dot_product(qv, qv) FROM qe))), 6)
             AS cos_sim_q
    FROM rows_q
    ORDER BY cos_sim_q DESC, vec_id ASC
    LIMIT 10
    """,
    description="int8-quantized cosine top-10: symmetric per-vector "
    "quantization (4x smaller vectors at serving time), exact integer dot "
    "products, deterministic floor(x+0.5) rounding on both engines — the "
    "memory-footprint scale path for a 100 TB ANN index; recall vs the "
    "fp32 ranking asserted in tests",
    tags=("similarity", "topk", "quantization"),
)
def knn_cosine_topk_int8(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").first()
    qvec = [float(x) for x in qrow[0]]
    qscale = max(abs(x) for x in qvec)
    qq = [float(int((x * 127.0 / qscale + 0.5) // 1)) for x in qvec]
    import math

    qnorm = math.sqrt(sum(v * v for v in qq))
    qlit = F.array(*[F.lit(v) for v in qq])
    _scale, q = _quantize(F.col("embedding"))
    dot = F.aggregate(
        F.zip_with(q, qlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    qn = F.sqrt(
        F.aggregate(
            F.transform(q, lambda a: a * a),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    # r10 OPT (guide §2.5 / verify-skill single-file note): quantization +
    # integer dot per row are interpreted HOF folds; spread() breaks the
    # one-file scan's single-task pin so they run on all cores.
    return (
        spread(emb.where(F.col("vec_id") != 0))
        .select(
            "vec_id",
            "label",
            F.round(dot / (qn * F.lit(qnorm)), 6).alias("cos_sim_q"),
        )
        .orderBy(F.col("cos_sim_q").desc(), F.col("vec_id").asc())
        .limit(10)
    )


@register(
    "semantic_cluster_assign",
    oracle="""
    WITH c AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings WHERE vec_id < 8
    ), s AS (
      SELECT e.vec_id, c.cid,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          c.cv), 6) AS sim
      FROM embeddings e CROSS JOIN c
    ), r AS (
      SELECT vec_id, cid, sim,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, cid ASC) AS rn
      FROM s
    )
    SELECT vec_id, cid AS centroid_id, sim AS cos_sim FROM r WHERE rn = 1
    """,
    description="semantic clustering (SemDeDup stage 1): assign every "
    "embedding to its nearest of 8 fixed centroids by cosine. Centroids are "
    "inlined as literal arrays -> per-row argmax, ZERO shuffle, one scan — "
    "the assignment pass that precedes within-cluster near-dup at 100 TB",
    tags=("similarity", "clustering", "llm-pipeline"),
)
def semantic_cluster_assign(spark: SparkSession, sf: str) -> DataFrame:
    return _fixed_centroid_assign(spark, sf).select(
        "vec_id", "centroid_id", "cos_sim"
    )


def assign_to_centroids(vecs: DataFrame, centroids) -> DataFrame:
    """Nearest-centroid assignment with LITERAL centroids: a per-row
    argmax over inlined arrays — one zero-shuffle scan regardless of
    corpus size. ``centroids`` is a bounded sequence of (centroid_id,
    vector); ties break to the LOWEST centroid id (argmax over
    (sim, -cid) structs). Shared by the SemDeDup stage-1 assignment and
    the incremental IVF index (streaming/ann_index.py), so index
    contents are bit-identical to a batch rebuild."""
    scored = F.array(
        *[
            F.struct(
                F.round(
                    cosine_col(
                        F.col("embedding"),
                        F.array(*[F.lit(float(x)) for x in v]),
                    ),
                    6,
                ).alias("sim"),
                F.lit(-int(cid)).cast("long").alias("neg_cid"),
            )
            for cid, v in centroids
        ]
    )
    best = F.array_max(scored)
    return vecs.select(
        "vec_id",
        "embedding",
        (-best["neg_cid"]).cast("long").alias("centroid_id"),
        best["sim"].alias("cos_sim"),
    )


def _fixed_centroid_assign(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup stage 1: nearest of 8 fixed centroids, per-row argmax.

    Centroids are collected once (bounded: 8 rows) and inlined as literal
    arrays, so the assignment is a single zero-shuffle scan regardless of
    corpus size."""
    emb = load(spark, sf, "embeddings")
    cents = (
        emb.where(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )  # bounded: 8 rows; becomes literals in the plan (broadcast-by-value)
    # (an r10 spread() of the scan was tried here and REVERTED: the A/B
    # measured 1.18x — the repartition's sort+exchange of the embedding
    # payload cost more than the single-task argmax it parallelized)
    return assign_to_centroids(
        emb, [(r["vec_id"], r["embedding"]) for r in cents]
    )


def _assign_centroids_kernel(vecs: DataFrame, centroids) -> DataFrame:
    """(vec_id, embedding: array<double>, label): nearest-centroid cosine
    assignment as ONE numpy ``mapInPandas`` pass — the kernel form of
    :func:`assign_to_centroids` for consumers that only need the argmax
    label, not the per-centroid sims (guide §4.2; the r10 _assign_cells
    lesson: an n_centroids-way interpreted zip_with+aggregate fold per
    row does not codegen and was the measured residue of the family).

    Same GEMM + ``np.round(·, 6)`` + ascending-id strict-``>`` scan
    discipline as :func:`_close_lower_counts` (which the oracle already
    value-checks on the same data): the scan reproduces
    ``array_max(struct(sim, neg_cid))`` tie-breaking — ties keep the
    LOWEST centroid id. Equality with the expression form is pinned by
    tests/test_ann_assign_kernel.py at sf0.01 and sf0.1. Precondition:
    finite embeddings with nonzero norms (a zero-norm vector yields NaN
    sims, where the expression form's NULL-vs-NaN ordering differs —
    same documented precondition as the r10 IVF/PQ kernels)."""
    cents = sorted(
        (int(cid), [float(x) for x in v]) for cid, v in centroids
    )

    def assign(batches):
        import numpy as np
        import pandas as pd

        ids = np.asarray([c for c, _ in cents], dtype=np.int64)
        C = np.asarray([v for _, v in cents], dtype=np.float64)
        cn = np.sqrt(np.einsum("ij,ij->i", C, C))
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            xn = np.sqrt(np.einsum("ij,ij->i", X, X))
            S = np.round((X @ C.T) / np.outer(xn, cn), 6)
            best_sim = S[:, 0].copy()
            best = np.full(len(pdf), ids[0], dtype=np.int64)
            for j in range(1, len(ids)):
                m = S[:, j] > best_sim
                best_sim = np.where(m, S[:, j], best_sim)
                best = np.where(m, ids[j], best)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "embedding": list(X),
                    "label": best,
                }
            )

    return vecs.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id long, embedding array<double>, label long"
    )


@register(
    "semantic_dedup_prune",
    oracle="""
    WITH c AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings WHERE vec_id < 8
    ), s AS (
      SELECT e.vec_id, c.cid,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          c.cv), 6) AS sim
      FROM embeddings e CROSS JOIN c
    ), r AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, cid ASC) AS rn
      FROM s
    ), a AS (
      SELECT vec_id, cid FROM r WHERE rn = 1
    ), close AS (
      SELECT y.vec_id AS vec_id, count(*) AS n
      FROM a x
      JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id
      JOIN embeddings ex ON ex.vec_id = x.vec_id
      JOIN embeddings ey ON ey.vec_id = y.vec_id
      WHERE round(list_cosine_similarity(CAST(ex.embedding AS DOUBLE[]),
                                         CAST(ey.embedding AS DOUBLE[])),
                  6) >= 0.35
      GROUP BY y.vec_id
    )
    SELECT a.vec_id, a.cid AS centroid_id,
           CAST(coalesce(close.n, 0) AS BIGINT) AS n_close_lower,
           CAST(coalesce(close.n, 0) > 0 AS INT) AS is_pruned
    FROM a LEFT JOIN close ON close.vec_id = a.vec_id
    """,
    description="SemDeDup stage 2: within each semantic cluster, prune any "
    "embedding whose cosine to a LOWER-id cluster member is >= 0.35 (the "
    "lowest id is the kept representative). Pair generation is bounded by "
    "the cluster: the self-join key is centroid_id, so the shuffle is "
    "cluster-local and the pair space is sum(|cluster|^2), never n^2. At "
    "100 TB the cluster count grows with the corpus (SemDeDup uses ~100k "
    "k-means cells) keeping each cell's pair block small; a degenerate hot "
    "cluster falls back to embedding_near_dup_pairs' tiled-GEMM kernel.",
    tags=("similarity", "dedup", "llm-pipeline"),
)
def semantic_dedup_prune(spark: SparkSession, sf: str) -> DataFrame:
    # Within-cluster pairwise cosine via the tiled-GEMM kernel (cluster =
    # block label): a Catalyst self-join with interpreted HOF cosines is
    # ~10x slower on the same pair space (measured 12.6s vs 1.3s at sf0.1)
    # because higher-order array folds don't codegen; the GEMM kernel
    # rounds to 6 identically, so the oracle is unchanged.
    #
    # r10 OPT (guide §1.2 / §2.4): the close-LOWER-id count is computed
    # INSIDE the per-cluster kernel, which emits one row per member — the
    # old shape ran the centroid-argmax scan twice (once feeding the pair
    # kernel, once for the final id list) and paid a vec_id-keyed shuffle
    # join to re-attach the counts. Same math, same rounding, one scan.
    # r11 OPT (guide §4.2; r10 verdict #3): the argmax itself now runs in
    # the numpy assignment kernel instead of 8 interpreted HOF cosines
    # per row — prune only needs the label (semantic_cluster_assign,
    # whose OUTPUT includes the sims, keeps the expression form).
    emb = load(spark, sf, "embeddings")
    cents = (
        emb.where(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )  # bounded: 8 rows
    assigned = _assign_centroids_kernel(
        emb, [(r["vec_id"], r["embedding"]) for r in cents]
    )
    counts = _close_lower_counts(assigned, threshold=0.35)
    return counts.select(
        "vec_id",
        F.col("label").alias("centroid_id"),
        F.col("n").cast("long").alias("n_close_lower"),
        (F.col("n") > 0).cast("int").alias("is_pruned"),
    )


# ---------------------------------------------------------------------------
# IVF approximate search (scale path; rows-only oracle, recall vs brute
# force asserted in tests/test_similarity.py)
# ---------------------------------------------------------------------------


def build_ivf_cells(
    emb: DataFrame, n_cells: int = 16, iters: int = 2, seed: int = 13
) -> tuple[DataFrame, DataFrame]:
    """K-means-lite IVF index build, entirely as DataFrame ops.

    Returns (assignments: vec_id→cell, centroids: cell→array<double>).
    Centroid init: deterministic hash-sample of n_cells rows. Each Lloyd
    iteration = one explode+groupBy (posexplode to average per dimension) —
    no driver loops over data, only over `iters`.
    """
    from pyspark.sql import Window

    # r10 OPT (guide §2.5 / verify-skill single-file note): every
    # assignment pass runs an n_cells-way interpreted zip_with per row;
    # the one-file scan pinned all of it to ONE task. One spread up front
    # parallelizes every downstream pass over the same frame.
    emb = spread(emb)

    # deterministic init: rank rows by hash, take the first n_cells as seeds
    # (the post-limit window runs on n_cells rows — single tiny partition)
    hashed = emb.select(
        "embedding", F.xxhash64(F.col("vec_id") + seed).alias("h")
    ).orderBy("h").limit(n_cells)
    centroids = hashed.select(
        (F.row_number().over(Window.orderBy("h")) - 1).alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias("centroid"),
    )

    spark = emb.sparkSession
    for _ in range(iters):
        # (r10: carrying the embedding THROUGH the assignment aggregate
        # via first() was tried and REVERTED — A/B 1.32x: the payload
        # then rides the aggregation exchange where this join resolves
        # as a broadcast of the small assignment table, guide §2.3)
        assigned = _assign_cells(emb, centroids)
        # r10 OPT (guide §1.2; the r9 broadcast-of-derived-branch lesson):
        # materialize the n_cells centroid rows on the driver — bounded
        # by construction, they ARE the tiny index — so iteration i+1,
        # the final assignment's broadcast, and the caller's probe-cell
        # collect all start from a literal table instead of each
        # replaying every previous iteration's assignment+average chain.
        # r11 OPT (guide §1.2): collect the per-(cell, dim) means
        # DIRECTLY (bounded: n_cells·d rows) and assemble the centroid
        # arrays driver-side — the old second groupBy + array_sort
        # (collect_list(struct)) exchange re-shuffled 1k rows just to
        # build arrays the driver was about to collect anyway. Same avg
        # values, same explicit dim ordering.
        mean_rows = (
            assigned.join(emb, "vec_id")
            .select("cell", F.posexplode("embedding").alias("dim", "val"))
            .groupBy("cell", "dim")
            .agg(F.avg("val").alias("mean"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in mean_rows:
            by_cell.setdefault(int(r["cell"]), {})[int(r["dim"])] = float(
                r["mean"]
            )
        centroids = spark.createDataFrame(
            [
                (c, [dims[i] for i in sorted(dims)])
                for c, dims in sorted(by_cell.items())
            ],
            "cell int, centroid array<double>",
        )
    assignments = _assign_cells(emb, centroids)
    return assignments, centroids


def _assign_cells(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """vec_id → nearest centroid cell (squared-L2, ties to lowest cell).

    r10 OPT (guide §4.2, the near-dup GEMM-kernel lesson): the old shape
    was an n_cells-way broadcast crossJoin whose per-row interpreted
    zip_with+aggregate fold doesn't codegen, re-reduced by a groupBy —
    at 100x scale the fold work (rows × n_cells × d interpreted lambda
    evals) was the measured residue of the whole IVF family. Now ONE
    mapInPandas pass with the bounded centroid table (n_cells rows — it
    IS the index, and every call site already materializes it as a
    driver-literal table) inlined in the closure: no row blowup, no
    re-aggregation, and the distance math runs vectorized in numpy.

    Bit-identical to the old plan, not merely equivalent: the kernel
    accumulates (x_i - c_i)^2 per dimension in ascending order — the
    same IEEE-double op sequence as the old sequential aggregate fold —
    and scans cells in ascending id with strict <, reproducing
    min(struct(d2, cell)) tie-breaking exactly (proof: canonical-hash
    equality at sf0.001/0.01/0.1 + /tmp/scale10, OPTIMIZATION_r10.md).

    Contract notes (r10 ADVICE): ``centroids`` is collect()ed EAGERLY at
    call time — it must be the bounded index table (every call site
    materializes it as a driver-literal table); the guard below turns a
    mis-use on an unbounded frame into a loud error instead of a silent
    driver collect. Precondition: finite embeddings/centroids — NaN
    distances order differently under the strict-< scan than under
    Spark's min(struct), which sorts NaN last."""
    cents = sorted(
        (int(r["cell"]), [float(x) for x in r["centroid"]])
        for r in centroids.collect()
    )
    if len(cents) > 65536:
        raise ValueError(
            f"_assign_cells: {len(cents)} centroid rows collected — the "
            "centroid side must be a bounded index table"
        )

    def assign(batches):
        import numpy as np
        import pandas as pd

        ids = np.asarray([c for c, _ in cents], dtype=np.int64)
        C = np.asarray([v for _, v in cents], dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            best_d2 = None
            best_cell = None
            for j in range(len(ids)):
                acc = np.zeros(len(pdf), dtype=np.float64)
                for dim in range(C.shape[1]):
                    diff = X[:, dim] - C[j, dim]
                    acc = acc + diff * diff
                if best_d2 is None:
                    best_d2 = acc
                    best_cell = np.full(len(pdf), ids[j], dtype=np.int64)
                else:
                    m = acc < best_d2
                    best_d2 = np.where(m, acc, best_d2)
                    best_cell = np.where(m, ids[j], best_cell)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "cell": best_cell}
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id long, cell int"
    )


@register(
    "ann_ivf_topk",
    oracle=None,  # approximate; recall vs brute force asserted in tests
    description="IVF ANN: probe the 4 nearest of 16 cells, exact cosine "
    "rescoring inside — ~4x scan reduction here, ncells/nprobe at scale",
    tags=("similarity", "ann"),
)
def ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    assignments, centroids = build_ivf_cells(emb, n_cells=16, iters=2)
    qv = _query_vec(spark, sf, 0)
    # nprobe=4 nearest cells to the query
    probe_cells = [
        r["cell"]
        for r in centroids.select(
            "cell",
            F.aggregate(
                F.zip_with(
                    F.col("centroid"),
                    qv,
                    lambda x, y: (x - y.cast("double"))
                    * (x - y.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d2"),
        )
        .orderBy("d2")
        .limit(4)
        .collect()
    ]
    cand = emb.join(
        assignments.where(F.col("cell").isin(probe_cells)), "vec_id"
    ).where(F.col("vec_id") != 0)
    return (
        cand.select(
            "vec_id",
            "label",
            F.round(cosine_col(F.col("embedding"), qv), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


@register(
    "ann_ivf_accuracy",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id = 0),
    top AS (
      SELECT vec_id,
             round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                          (SELECT qv FROM q)), 6) AS cos_sim
      FROM embeddings
      WHERE vec_id <> 0
      ORDER BY cos_sim DESC, vec_id ASC
      LIMIT 10
    )
    SELECT CAST(count(*) AS BIGINT) AS n_exact,
           CAST(round(min(cos_sim) * 1000000) AS BIGINT)
             AS min_exact_cos_ppm,
           true AS recall_ge_20pct
    FROM top
    """,
    description="driver-checkable accuracy row for ann_ivf_topk (r9 "
    "verdict #4): the brute-force cosine top-10 (oracle-computable — the "
    "green knn_cosine_topk formulation) summarized as (count, 10th-cos "
    "in ppm) plus the verdict that IVF nprobe=4/16 recalls >= 20% of it "
    "(deterministic — hash-seeded k-means init, fixed probe set). The "
    "floor is 20%, not the 50% tests/test_dedup_similarity.py pins at "
    "sf0.001, because the floor must hold at EVERY shipped scale and "
    "recall is distribution-dependent: measured 8/10 at sf0.001 and "
    "sf0.01, 3/10 at sf0.1 (vec 0's true top-10 there spans >4 of the "
    "16 cells — verified by probing 8/16 cells, which still only "
    "reaches 6/10, and by a spherical-normalized rebuild, which doesn't "
    "move it: the neighborhood is genuinely scattered, not mis-indexed), "
    "10/10 at the 10x corpus. A real index/probe regression lands at "
    "0-1/10 and flips the boolean, failing the hash.",
    tags=("similarity", "ann", "accuracy"),
)
@_cache_scoped
def ann_ivf_accuracy(spark: SparkSession, sf: str) -> DataFrame:
    # r11 hygiene (r10 verdict #8): scoped registry instead of a bare
    # .cache() — the returned plan is lazy, so only the generation
    # mechanism can release this without leaking one persisted set per
    # call (the r7 leak class).
    exact = _scoped_cache(
        knn_cosine_topk(spark, sf).select("vec_id", "cos_sim")
    )
    approx = ann_ivf_topk(spark, sf).select(
        "vec_id", F.lit(True).alias("in_ivf")
    )
    per = exact.join(approx, "vec_id", "left")
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.round(F.min("cos_sim") * 1_000_000)
        .cast("long")
        .alias("min_exact_cos_ppm"),
        (
            F.coalesce(F.sum(F.col("in_ivf").cast("int")), F.lit(0))
            >= 0.2 * F.count(F.lit(1))
        ).alias("recall_ge_20pct"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the 10-30x ANN memory step past int8
# ---------------------------------------------------------------------------


def build_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    seed: int = 7,
    train_rows: int | None = 65536,
    return_subv: bool = False,
) -> DataFrame:
    """Per-subspace k-means codebooks, entirely as DataFrame ops.

    The D-dim space splits into ``m`` contiguous subspaces; each gets a
    ``k``-centroid codebook trained by Lloyd iterations. All m×k centroids
    fit in one broadcast (m·k·(D/m) doubles = D·k — tiny), and every
    training step is a single groupBy over (sub, code, dim): the classic
    PQ build (Jégou et al., TPAMI'11) with Spark doing the data motion.

    ``train_rows`` bounds the Lloyd training set: above it, training runs
    on a deterministic xxhash64-threshold sample of ~train_rows vectors
    (one count + one filtered scan), the same bounded-sample regime FAISS
    uses — m·k centroids saturate long before the corpus does, so
    training cost must stay flat while only the encode pass scales with
    rows. ``None`` trains on everything. Returns
    (sub, code, centroid: array<double>), or with ``return_subv=True`` a
    ``(codebooks, subv, d)`` triple where ``subv`` is the checkpointed
    training subvector table when it covers the WHOLE input (no sampling
    fired — the encode pass can then reuse it instead of re-exploding
    the embedding scan) and None when training ran on a sample (at scale
    the checkpoint is bounded by ``train_rows`` and the full corpus must
    stream through encode lazily instead).
    """
    from pyspark.sql import Window

    sampled = False
    if train_rows is not None:
        n = emb.count()
        if n > train_rows:
            sampled = True
            frac_ppm = int(train_rows * 1_000_000 // n)
            emb = emb.where(
                F.pmod(
                    F.xxhash64(F.col("vec_id") + F.lit(seed)),
                    F.lit(1_000_000),
                )
                < F.lit(frac_ppm)
            )

    d_total = len(emb.select("embedding").first()[0])
    d = d_total // m
    subv = emb.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}),"
                f" s -> transform(slice(embedding, s * {d} + 1, {d}),"
                f"                x -> cast(x as double)))"
            )
        ).alias("sub", "sv"),
    )
    # the subvector table feeds every Lloyd iteration twice (assignment +
    # re-centering join); checkpoint it once instead of re-deriving it
    # from the embedding scan per consumer. spread() first: the 1-file
    # scan otherwise pins every assignment pass's distance math to one
    # task (see queries.spread). r11 OPT (guide §1.2 job count): LAZY —
    # iteration 1's collect materializes it (both of that job's
    # references resolve to the one RDD), saving a dedicated
    # materialization job whose only content was this explode.
    subv = spread(subv).localCheckpoint(eager=False)
    # deterministic seeds: first k subvectors per subspace in hash order
    w = Window.partitionBy("sub").orderBy("h")
    centroids = (
        subv.select(
            "sub", "sv", F.xxhash64(F.col("vec_id") + seed).alias("h")
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "sub", (F.col("rn") - 1).alias("code"),
            F.col("sv").alias("centroid"),
        )
    )
    spark = emb.sparkSession
    for _ in range(iters):
        # (r10: carrying sv THROUGH the assignment aggregate via first()
        # was tried and REVERTED — A/B 1.16x: the subvector payload then
        # rides the aggregation exchange where this join resolves as a
        # broadcast of the small assignment table, guide §2.3)
        assigned = _assign_pq(subv, centroids)
        # materialize the m·k centroid rows on the driver (bounded by
        # construction — the codebook IS the tiny output) so iteration
        # i+1's plan starts from a literal table instead of replaying
        # every previous iteration's assignment+average.
        # r11 OPT (guide §1.2): collect per-(sub, code, dim) means
        # directly (bounded: m·k·d rows) and assemble the centroid arrays
        # driver-side — drops the second groupBy + collect_list exchange
        # whose only job was building arrays for this collect. Same avg
        # values, same explicit dim ordering.
        mean_rows = (
            assigned.join(subv, ["vec_id", "sub"])
            .select("sub", "code", F.posexplode("sv").alias("dim", "val"))
            .groupBy("sub", "code", "dim")
            .agg(F.avg("val").alias("mean"))
            .collect()
        )
        by_code: dict[tuple[int, int], dict[int, float]] = {}
        for r in mean_rows:
            by_code.setdefault(
                (int(r["sub"]), int(r["code"])), {}
            )[int(r["dim"])] = float(r["mean"])
        centroids = spark.createDataFrame(
            [
                (s, c, [dims[i] for i in sorted(dims)])
                for (s, c), dims in sorted(by_code.items())
            ],
            "sub int, code int, centroid array<double>",
        )
    if return_subv:
        # r10 OPT (guide §1.2): when no sampling fired the checkpointed
        # training subvectors ARE the full input's subvectors — hand them
        # back so pq_encode skips a second explode of the embedding scan
        # (and its own dimension-probing first()).
        return centroids, (None if sampled else subv), d
    return centroids


def _assign_pq(subv: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, sub) → nearest codebook code (squared-L2, ties to lowest
    code).

    r10 OPT (guide §4.2): same kernel rewrite as _assign_cells — the old
    k-way broadcast join ran rows × m × k interpreted zip_with folds (the
    measured ~20x residue of ann_pq_topk's 100x factor) and re-reduced
    them through a groupBy; the codebook is bounded (m·k rows) by
    construction, so it inlines into one mapInPandas closure and each
    input row yields exactly one output row. Per-dimension ascending
    accumulation + strict-< ascending-code scan keep the result
    bit-identical to the old fold + min(struct(d2, code)) (proof:
    canonical-hash equality at sf0.001/0.01/0.1 + /tmp/scale10,
    OPTIMIZATION_r10.md).

    Contract notes (r10 ADVICE): ``centroids`` is collect()ed EAGERLY at
    call time and must be the bounded m·k codebook (guarded below);
    finite inputs assumed (NaN ordering differs from min(struct) — see
    _assign_cells); a sub value with no codebook rows raises KeyError in
    the kernel (crash-loud; the old inner join silently dropped such
    rows — unreachable from in-repo callers, which always derive subs
    FROM the codebook's m)."""
    rows = centroids.collect()
    if len(rows) > 65536:
        raise ValueError(
            f"_assign_pq: {len(rows)} codebook rows collected — the "
            "codebook side must be a bounded m*k table"
        )
    by_sub: dict[int, list[tuple[int, list[float]]]] = {}
    for r in rows:
        by_sub.setdefault(int(r["sub"]), []).append(
            (int(r["code"]), [float(x) for x in r["centroid"]])
        )
    for lst in by_sub.values():
        lst.sort()

    def assign(batches):
        import numpy as np
        import pandas as pd

        grids = {
            s: (
                np.asarray([c for c, _ in lst], dtype=np.int64),
                np.asarray([v for _, v in lst], dtype=np.float64),
            )
            for s, lst in by_sub.items()
        }
        for pdf in batches:
            if not len(pdf):
                continue
            sub_arr = pdf["sub"].to_numpy()
            X = np.stack(pdf["sv"].to_numpy()).astype(np.float64)
            out_code = np.zeros(len(pdf), dtype=np.int64)
            for s in np.unique(sub_arr):
                sel = np.flatnonzero(sub_arr == s)
                code_ids, C = grids[int(s)]
                Xs = X[sel]
                best_d2 = None
                best_code = None
                for j in range(len(code_ids)):
                    acc = np.zeros(len(sel), dtype=np.float64)
                    for dim in range(C.shape[1]):
                        diff = Xs[:, dim] - C[j, dim]
                        acc = acc + diff * diff
                    if best_d2 is None:
                        best_d2 = acc
                        best_code = np.full(
                            len(sel), code_ids[j], dtype=np.int64
                        )
                    else:
                        m = acc < best_d2
                        best_d2 = np.where(m, acc, best_d2)
                        best_code = np.where(m, code_ids[j], best_code)
                out_code[sel] = best_code
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "sub": sub_arr,
                    "code": out_code,
                }
            )

    return subv.select("vec_id", "sub", "sv").mapInPandas(
        assign, "vec_id long, sub int, code int"
    )


def pq_encode(
    emb: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    subv: DataFrame | None = None,
) -> DataFrame:
    """vec_id → m-byte code array (the stored ANN index payload).

    ``subv``: a precomputed (vec_id, sub, sv) subvector table covering
    exactly ``emb`` (e.g. the training checkpoint from
    ``build_pq_codebooks(..., return_subv=True)`` when sampling did not
    fire) — skips re-exploding the embedding scan."""
    if subv is None:
        d_total = len(emb.select("embedding").first()[0])
        d = d_total // m
        subv = spread(
            emb.select(
                "vec_id",
                F.posexplode(
                    F.expr(
                        f"transform(sequence(0, {m - 1}),"
                        f" s -> transform(slice(embedding, s * {d} + 1, {d}),"
                        f"                x -> cast(x as double)))"
                    )
                ).alias("sub", "sv"),
            )
        )
    assigned = _assign_pq(subv, codebooks)
    return assigned.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))),
            lambda s: s["code"],
        ).alias("codes")
    )


def _l2norm_kernel(batches):
    """mapInPandas kernel: (vec_id, embedding) → L2-normalized embedding,
    BIT-identical to the old ``transform(e, x -> x / _norm(e))``
    expression: the norm accumulates per-dimension in ascending order
    (the fold's exact IEEE op sequence), then one IEEE divide per
    element. Module-scope (r10 ADVICE) so the bit-identity test in
    tests/test_ann_assign_kernel.py exercises THIS shipped kernel, not a
    copy. Precondition: finite embeddings — a zero-norm vector yields
    NaN elements where the expression form's Divide returned NULL."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        if not len(pdf):
            continue
        X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        acc = np.zeros(len(pdf), dtype=np.float64)
        for dim in range(X.shape[1]):
            acc = acc + X[:, dim] * X[:, dim]
        with np.errstate(divide="ignore", invalid="ignore"):
            out = X / np.sqrt(acc)[:, None]
        yield pd.DataFrame(
            {"vec_id": pdf["vec_id"].to_numpy(), "embedding": list(out)}
        )


@register(
    "ann_pq_topk",
    oracle=None,  # approximate; recall vs brute force asserted in tests
    description="PQ ANN top-10: 8 subspaces x 16 codes → 8-byte codes "
    "(32x smaller than fp32); asymmetric-distance lookup tables broadcast, "
    "scoring is one codes→table join + per-row sum, then the top-50 "
    "shortlist is exact-cosine re-ranked — the two-stage (compressed "
    "candidate generation → exact re-scoring) serving shape for a 100 TB "
    "embedding corpus, where only the shortlist ever touches fp32 vectors",
    tags=("similarity", "ann", "quantization"),
)
def ann_pq_topk(spark: SparkSession, sf: str) -> DataFrame:
    m, d = 8, 8
    raw = load(spark, sf, "embeddings")
    # L2-normalize first: PQ scores by squared L2, and on unit vectors the
    # L2 order IS the cosine order — without this, norm variance would
    # leak into the ranking and recall vs the cosine ground truth drops.
    #
    # r10 OPT (guide §4.2/§1.2): the old expression normalize put
    # _norm(embedding) — itself a d-element fold — INSIDE the transform
    # lambda, so every row paid d re-evaluations of the fold (O(d²)
    # interpreted ops/row), and CollapseProject inlined that whole thing
    # into EVERY downstream consumer's projection (the training-sample
    # explode and the encode explode each re-paid it: measured 77 s for
    # one normalize pass over the 100x corpus, ~80% of the query). The
    # module-scope _l2norm_kernel normalizes once — per-dimension
    # ascending accumulation for the norm (the fold's exact IEEE op
    # order), then one IEEE divide per element, so values are
    # bit-identical — and the result is checkpointed so all consumers
    # share the single pass (hash-equality receipts at sf0.001/0.01/0.1
    # + /tmp/scale10, OPTIMIZATION_r10.md).
    # r11 OPT (guide §1.2 job count): LAZY checkpoint — the normalize pass
    # materializes inside the first consumer's job (the training
    # subvector table) instead of paying its own job; the query-row
    # first() and the encode pass then read the same RDD.
    emb = (
        spread(raw.select("vec_id", "embedding"))
        .mapInPandas(_l2norm_kernel, "vec_id long, embedding array<double>")
        .localCheckpoint(eager=False)
    )
    # r10 OPT (guide §1.2): reuse the training subvector checkpoint for
    # the encode pass — at this corpus size sampling does not fire, so
    # the encode explode and its dimension-probing first() are redundant
    # re-derivations of the same table (pq_encode falls back to its own
    # explode exactly when training ran on a sample).
    codebooks, train_subv, _ = build_pq_codebooks(
        emb, m=m, k=16, iters=2, return_subv=True
    )
    codes = pq_encode(emb, codebooks, m=m, subv=train_subv)
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").first()
    qv = [float(x) for x in qrow[0]]
    # ADC lookup table: partial squared distance from each query subvector
    # to every codebook centroid — m*k rows, broadcastable by construction
    q_sub = spark.createDataFrame(
        [(s, qv[s * d:(s + 1) * d]) for s in range(m)], "sub int, qsv array<double>"
    )
    table = q_sub.join(F.broadcast(codebooks), "sub").select(
        "sub",
        "code",
        F.aggregate(
            F.zip_with("qsv", "centroid", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("pd2"),
    )
    exploded = codes.where(F.col("vec_id") != 0).select(
        "vec_id", F.posexplode("codes").alias("sub", "code")
    )
    scored = (
        exploded.join(F.broadcast(table), ["sub", "code"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("pd2"), 6).alias("approx_d2"))
    )
    shortlist = (
        scored.orderBy(F.col("approx_d2").asc(), F.col("vec_id").asc())
        .limit(50)
        .select("vec_id")
    )
    qlit = F.array(*[F.lit(v) for v in qv])
    rescored = (
        raw.join(F.broadcast(shortlist), "vec_id")
        .select(
            "vec_id",
            "label",
            F.round(cosine_col(F.col("embedding"), qlit), 6).alias(
                "cos_sim"
            ),
        )
    )
    return (
        rescored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


@register(
    "hard_negative_mining",
    oracle="""
    WITH q AS (
      SELECT vec_id AS qid, label AS qlabel,
             CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10
    ), scored AS (
      SELECT q.qid, e.vec_id AS neg_id, e.label AS neg_label,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          q.qv), 6) AS cos_sim
      FROM q JOIN embeddings e
        ON e.label <> q.qlabel AND e.vec_id <> q.qid
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY cos_sim DESC, neg_id ASC)
                  AS rnk
      FROM scored
    )
    SELECT qid, neg_id, neg_label, cos_sim, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
    description="hard-negative mining for retriever/embedding training: "
    "for each query vector, the top-5 most similar vectors with a "
    "DIFFERENT label — maximally confusing negatives. The query set is "
    "small by construction (a training batch) so it broadcasts; scoring "
    "is one scan of the corpus per batch and the per-query top-k is a "
    "bounded window. At 100 TB the scan is replaced by the ANN index "
    "(IVF/PQ) shortlist, same downstream shape.",
    tags=("similarity", "llm-pipeline", "training"),
)
def hard_negative_mining(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    batch = emb.where(F.col("vec_id") < 10)
    return mine_hard_negatives(emb, batch, k=5)


#: mine_hard_negatives refuses batches above this size — the batch side is
#: broadcast + nested-loop joined against the whole corpus, so an
#: unbounded batch silently becomes an all-pairs scan. Training batches
#: are a few hundred queries; anything larger should go through the ANN
#: index (IVF/PQ shortlist) instead.
MAX_NEGATIVE_BATCH = 4096


def mine_hard_negatives(
    corpus: DataFrame,
    batch: DataFrame,
    k: int = 5,
    max_batch: int = MAX_NEGATIVE_BATCH,
) -> DataFrame:
    """Top-``k`` most-similar DIFFERENT-label corpus vectors per batch
    query. The batch-size cap is ENFORCED, not advisory: the plan is one
    corpus scan x batch (BroadcastNestedLoopJoin on the non-equi label
    condition), linear only while the batch stays bounded. Counting the
    batch costs one tiny job and converts a silent 100 TB cartesian into
    a loud error."""
    from pyspark.sql import Window

    n = batch.count()
    if n > max_batch:
        raise ValueError(
            f"hard-negative batch has {n} queries (cap {max_batch}); "
            "mine in chunks or use the ANN shortlist path"
        )
    q = batch.select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qv"),
    )
    scored = (
        corpus.join(
            F.broadcast(q),
            (F.col("label") != F.col("qlabel"))
            & (F.col("vec_id") != F.col("qid")),
        )
        .select(
            "qid",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.round(cosine_col(F.col("embedding"), F.col("qv")), 6).alias(
                "cos_sim"
            ),
        )
    )
    rnk = F.row_number().over(
        Window.partitionBy("qid").orderBy(
            F.col("cos_sim").desc(), F.col("neg_id").asc()
        )
    )
    return (
        scored.withColumn("rnk", rnk)
        .where(F.col("rnk") <= k)
        .select("qid", "neg_id", "neg_label", "cos_sim", F.col("rnk").cast("int"))
    )


_MRL_DIMS = (8, 16, 32, 64)
_MRL_K = 10
_MRL_DIMS_SQL = "[" + ", ".join(str(d) for d in _MRL_DIMS) + "]"

#: matryoshka_recall's query-pool cap — the same bounded-sample regime as
#: build_pq_codebooks(train_rows=...): a recall ESTIMATE doesn't need every
#: query, and an uncapped pool makes the exact-rescoring stage grow with
#: whatever the caller feeds it. Bit-identical below the cap.
MRL_MAX_QUERIES = 1024


@_cache_scoped
def matryoshka_recall(
    corpus: DataFrame,
    queries: DataFrame,
    dims: tuple[int, ...] = _MRL_DIMS,
    k: int = _MRL_K,
    max_queries: int | None = MRL_MAX_QUERIES,
    seed: int = 7,
) -> DataFrame:
    """Recall@k of truncated-prefix cosine top-k vs ``max(dims)``-prefix
    ground truth (MRL, Kusupati et al. 2022). ``corpus``: (vec_id,
    embedding); ``queries``: (qid, qv). Returns one row per truncation
    dim: (trunc_dim, n_queries, total_overlap, recall_ppm).

    Ground truth is the top-k at the LONGEST requested truncation, so for
    true full-dim recall ``max(dims)`` must equal the embedding dimension
    (it does in the registered report: 64-dim embeddings, dims=(8,16,32,
    64)); with shorter dims the result is recall relative to that prefix,
    not the untruncated vector (r9 ADVICE).

    ``max_queries`` bounds the exact-rescoring work: above it, recall is
    estimated on a deterministic xxhash64-threshold sample of ~max_queries
    queries; below it the cap is a no-op, bit-identical to ``None``. The
    pool size check rides the main plan as a broadcast scalar (no eager
    driver-side count — r9 ADVICE flagged the old count() job, a full
    extra job even for the report's 10-query pool). This is what keeps
    the report's cost O(corpus), never O(corpus x query-pool), when the
    pool is corpus-proportional.

    Scale shape (r9 rewrite; the r8 scaling bench measured the old form
    at 100x factor 47): the corpus scan is ``spread()`` so scoring runs
    at full parallelism instead of file-scan width; element products are
    computed ONCE per (row, query) and each truncation's dot is a prefix
    sum over that shared array (matryoshka prefixes nest — the old form
    re-zipped per dim, ~6x the element work, and carried both 64-float
    arrays through a 4x dims explode); per-row/per-query norms are
    projected once before the join; and the per-(dim,query) top-k table
    (≤ |dims|·|queries|·k rows) is scoped-cached so the truth-join
    doesn't re-execute the whole scoring pipeline — the old form silently
    ran it twice."""
    from pyspark.sql import Window

    if max_queries is not None:
        # lazy cap: the pool count joins in as a broadcast scalar, so the
        # keep-all case costs one tiny aggregate stage inside the main
        # query instead of an eager count() job; above the cap the filter
        # is the same xxhash64 threshold as before, bit-identical
        pool_n = queries.agg(F.count("*").alias("__pool_n"))
        queries = (
            queries.crossJoin(F.broadcast(pool_n))
            .where(
                (F.col("__pool_n") <= max_queries)
                | (
                    F.pmod(
                        F.xxhash64(F.col("qid") + F.lit(seed)),
                        F.lit(1_000_000),
                    )
                    < F.expr(
                        # integral div: exact floor, no double rounding
                        f"{max_queries * 1_000_000}L div __pool_n"
                    )
                )
            )
            .drop("__pool_n")
        )
    q = queries.select(
        "qid",
        "qv",
        *[
            _norm(F.slice(F.col("qv"), 1, d)).alias(f"qn_{d}")
            for d in dims
        ],
    )
    nq = q.agg(F.count("*").alias("n"))
    # corpus-side prefix norms once per ROW (not per (row, query)); spread
    # first — single-file parquet arrives as one scan partition and a
    # broadcast join preserves it, pinning all the cosine math to one task
    c = spread(corpus).select(
        "vec_id",
        "embedding",
        *[
            _norm(F.slice(F.col("embedding"), 1, d)).alias(f"en_{d}")
            for d in dims
        ],
    )
    # one element-product array per (row, query); every truncation's dot
    # is a prefix aggregate over it. Used |dims| times below, so
    # CollapseProject keeps it materialized rather than inlining.
    joined = c.join(F.broadcast(q)).withColumn(
        "pr",
        F.zip_with(
            "embedding",
            "qv",
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
    )
    scored = joined.select(
        "vec_id",
        "qid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("trunc_dim"),
                        F.round(
                            F.aggregate(
                                F.slice(F.col("pr"), 1, d),
                                F.lit(0.0),
                                lambda acc, v: acc + v,
                            )
                            / (F.col(f"en_{d}") * F.col(f"qn_{d}")),
                            6,
                        ).alias("cos"),
                    )
                    for d in dims
                ]
            )
        ).alias("dc"),
    ).select("vec_id", "qid", "dc.trunc_dim", "dc.cos")
    rnk = F.row_number().over(
        Window.partitionBy("trunc_dim", "qid").orderBy(
            F.col("cos").desc(), F.col("vec_id").asc()
        )
    )
    top = _scoped_cache(
        scored.withColumn("rnk", rnk)
        .where(F.col("rnk") <= k)
        .select("trunc_dim", "qid", "vec_id")
    )
    truth = top.where(F.col("trunc_dim") == max(dims)).select(
        "qid", "vec_id"
    )
    hits = (
        top.join(F.broadcast(truth), ["qid", "vec_id"])
        .groupBy("trunc_dim")
        .agg(F.count("*").alias("total_overlap"))
    )
    dims_df = corpus.sparkSession.createDataFrame(
        [(d,) for d in dims], "trunc_dim int"
    )
    return (
        # hits is ≤ len(dims) rows — broadcast, else this 4x4 join
        # compiles to a full SortMergeJoin exchange pair
        dims_df.join(F.broadcast(hits), "trunc_dim", "left")
        .crossJoin(F.broadcast(nq))
        .select(
            "trunc_dim",
            F.col("n").cast("long").alias("n_queries"),
            F.coalesce(F.col("total_overlap"), F.lit(0))
            .cast("long")
            .alias("total_overlap"),
            F.expr(
                # n = 0 (empty/fully-sampled-out pool) degrades to
                # recall_ppm 0 instead of an ANSI divide-by-zero (ADVICE)
                f"case when n > 0 then "
                f"cast(coalesce(total_overlap, 0) * 1000000 as bigint)"
                f" div (n * {k}) else 0L end"
            ).alias("recall_ppm"),
        )
    )


@register(
    "matryoshka_recall_report",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10
    ), nq AS (
      SELECT count(*) AS n FROM q
    ), dims AS (
      SELECT CAST(unnest({_MRL_DIMS_SQL}) AS INT) AS trunc_dim
    ), scored AS (
      SELECT d.trunc_dim, q.qid, e.vec_id,
             round(list_cosine_similarity(
               CAST(e.embedding AS DOUBLE[])[1:d.trunc_dim],
               q.qv[1:d.trunc_dim]), 6) AS cos
      FROM embeddings e
      JOIN q ON e.vec_id >= 10
      CROSS JOIN dims d
    ), ranked AS (
      SELECT trunc_dim, qid, vec_id,
             row_number() OVER (PARTITION BY trunc_dim, qid
                                ORDER BY cos DESC, vec_id ASC) AS rnk
      FROM scored
    ), top AS (
      SELECT trunc_dim, qid, vec_id FROM ranked WHERE rnk <= {_MRL_K}
    ), truth AS (
      SELECT qid, vec_id FROM top WHERE trunc_dim = {max(_MRL_DIMS)}
    ), hits AS (
      SELECT t.trunc_dim, count(*) AS total_overlap
      FROM top t JOIN truth u
        ON t.qid = u.qid AND t.vec_id = u.vec_id
      GROUP BY t.trunc_dim
    )
    SELECT d.trunc_dim,
           CAST((SELECT n FROM nq) AS BIGINT) AS n_queries,
           CAST(coalesce(h.total_overlap, 0) AS BIGINT) AS total_overlap,
           CAST(coalesce(h.total_overlap, 0) * 1000000 AS BIGINT)
             // ((SELECT n FROM nq) * {_MRL_K}) AS recall_ppm
    FROM dims d LEFT JOIN hits h ON h.trunc_dim = d.trunc_dim
    """,
    description="matryoshka-truncation recall report (MRL, Kusupati et "
    "al. 2022): for each truncated embedding prefix (8/16/32/64 dims), "
    "cosine top-10 per query vs the full-dim top-10 ground truth → "
    "recall@10 as integer ppm. The serving question this answers: how "
    "many dims can the ANN index store before recall degrades. Query "
    "pool is CAPPED (deterministic hash sample above 1024 queries, "
    "bit-identical below — the PQ train_rows regime); the spread corpus "
    "scan computes one element-product array per (row, query) and every "
    "truncation's dot is a prefix sum over it; per-(dim,query) top-k is "
    "a group-limited window; the tiny top-k table is cached so the "
    "truth join never re-runs scoring. At 100 TB the candidate set per "
    "query comes from the ANN shortlist (IVF/PQ), same downstream "
    "shape as hard_negative_mining.",
    tags=("similarity", "embedding", "llm-pipeline", "report"),
)
def matryoshka_recall_report(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    return matryoshka_recall(
        emb.where(F.col("vec_id") >= 10).select("vec_id", "embedding"),
        emb.where(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        ),
    )


@register(
    "embedding_centroid_shift",
    oracle="""
    WITH comps AS (
      SELECT label, u.dim AS dim, u.c AS c
      FROM (
        SELECT label,
               unnest(list_transform(generate_series(1, len(e)),
                      i -> {'dim': i,
                            'c': CAST(floor(e[i] * 1000000)
                                      AS BIGINT)}),
                      recursive := true)
        FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings) t
      ) u
    ),
    per_label AS (
      SELECT label, dim, sum(c) AS s_l, count(*) AS n_l
      FROM comps GROUP BY label, dim
    ),
    global_dim AS (
      SELECT dim, sum(s_l) AS s_g, sum(n_l) AS n_g
      FROM per_label GROUP BY dim
    ),
    cent AS (
      SELECT p.label, p.n_l,
             (p.s_l // p.n_l) - (g.s_g // g.n_g) AS d
      FROM per_label p JOIN global_dim g ON g.dim = p.dim
    )
    SELECT CAST(label AS INT) AS label,
           CAST(max(n_l) AS BIGINT) AS n_vecs,
           CAST(sum(d * d) AS BIGINT) AS shift_sq_micro2,
           CAST(max(abs(d)) AS BIGINT) AS max_dim_shift_micro
    FROM cent
    GROUP BY label
    """,
    description="embedding-distribution drift by label: per label, the "
    "squared distance between the label centroid and the global "
    "centroid plus the worst single-dimension shift — the check that "
    "catches a re-embedded or mis-normalized label slice before it "
    "poisons retrieval training. Components floor-scale to integer "
    "micro-units per ROW and centroids are truncating integer "
    "divisions of exact integer sums, so every emitted number is "
    "exact integer arithmetic (quantization <=1 micro-unit/dim) and "
    "BOUNDED regardless of corpus size — no corpus-sum square ever "
    "leaves int64 because division happens before squaring. Scale: "
    "one posexplode scan, groupBy(label, dim) map-side combined, the "
    "per-dim global table is |dims| rows broadcast back",
    tags=("similarity", "report", "quality"),
)
def embedding_centroid_shift(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    comps = emb.select(
        "label",
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * 1_000_000).cast(
                    "bigint"
                ),
            )
        ).alias("dim0", "c"),
    )
    per_label = comps.groupBy("label", "dim0").agg(
        F.sum("c").alias("s_l"), F.count("*").alias("n_l")
    )
    global_dim = per_label.groupBy("dim0").agg(
        F.sum("s_l").alias("s_g"), F.sum("n_l").alias("n_g")
    )
    cent = per_label.join(F.broadcast(global_dim), "dim0").select(
        "label",
        "n_l",
        (
            F.expr("s_l div n_l") - F.expr("s_g div n_g")
        ).alias("d"),
    )
    return cent.groupBy("label").agg(
        F.max("n_l").cast("bigint").alias("n_vecs"),
        F.sum(F.col("d") * F.col("d"))
        .cast("bigint")
        .alias("shift_sq_micro2"),
        F.max(F.abs(F.col("d")))
        .cast("bigint")
        .alias("max_dim_shift_micro"),
    ).select(
        F.col("label").cast("int").alias("label"),
        "n_vecs",
        "shift_sq_micro2",
        "max_dim_shift_micro",
    )


@register(
    "embedding_anisotropy_report",
    oracle="""
    WITH comps AS (
      SELECT label, u.dim AS dim, u.m AS m
      FROM (
        SELECT label,
               unnest(list_transform(generate_series(1, len(e)),
                      i -> {'dim': i,
                            'm': CAST(floor(e[i] * 1000000)
                                      AS BIGINT)}),
                      recursive := true)
        FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS e
              FROM embeddings) t
      ) u
    ),
    per_dim AS (
      SELECT label, dim,
             CAST(sum(m) AS HUGEINT) AS s_d,
             CAST(sum(CAST(m AS HUGEINT) * m) AS HUGEINT) AS pden,
             count(*) AS cnt
      FROM comps GROUP BY label, dim
    ),
    rolled AS (
      SELECT label, sum(s_d * s_d) AS num, sum(pden) AS den,
             max(cnt) AS n
      FROM per_dim GROUP BY label
    )
    SELECT CAST(label AS INT) AS label,
           CAST(n AS BIGINT) AS n_vecs,
           CAST((num * 1000000) // (n * den) AS BIGINT) AS anisotropy_ppm,
           CAST(den // n AS BIGINT) AS mean_sq_norm_micro2
    FROM rolled
    """,
    description="embedding-space health per label: anisotropy_ppm = "
    "||sum(e)||^2 / (n * sum(||e||^2)) in parts-per-million — the "
    "expected pairwise cosine of the label's vectors (near 0 for a "
    "well-spread isotropic space, near 1e6 when every vector points "
    "the same way: the collapsed-embedding failure retrieval training "
    "must catch), plus the mean squared norm in micro-units^2 "
    "(catches un-normalized slices). Components floor-scale to "
    "integer micro-units per row; per-dim sums square in decimal "
    "(mirrors DuckDB HUGEINT exactly, incl. truncating //), so the "
    "report is exact integer arithmetic at any corpus size. Scale: "
    "ONE posexplode scan -> one map-side-combined groupBy(label, dim) "
    "carrying sum/sum-of-squares/count together -> a |labels|*|dims|-"
    "row rollup; n_vecs = max per-dim count (dim 0 exists for every "
    "non-empty vector).",
    tags=("similarity", "report", "quality"),
)
def embedding_anisotropy_report(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    comps = emb.select(
        "label",
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * 1_000_000).cast(
                    "bigint"
                ),
            )
        ).alias("dim0", "m"),
    )
    per_dim = comps.groupBy("label", "dim0").agg(
        F.sum("m").alias("s_d"),
        F.sum((F.col("m") * F.col("m")).cast("decimal(19,0)")).alias(
            "pden"
        ),
        F.count("*").alias("cnt"),
    )
    rolled = per_dim.groupBy("label").agg(
        F.sum(
            F.col("s_d").cast("decimal(19,0)")
            * F.col("s_d").cast("decimal(19,0)")
        ).alias("num"),
        F.sum("pden").alias("den"),
        F.max("cnt").alias("n"),
    )
    return rolled.select(
        F.col("label").cast("int").alias("label"),
        F.col("n").cast("long").alias("n_vecs"),
        F.expr("CAST((num * 1000000) div (n * den) AS BIGINT)").alias(
            "anisotropy_ppm"
        ),
        F.expr("CAST(den div n AS BIGINT)").alias("mean_sq_norm_micro2"),
    )


#: first 16 of the portable minhash coefficient pairs (ops/dedup.py)
#: reused as seeded hyperplane generators: coeff(j, d) =
#: ((a_j * d + b_j) % 2147483647) - 1073741823 — engine-portable
#: pseudo-random integers in (-2^30, 2^30], identical in SQL.
_LSH_PLANES = [
    (2075443165, 1671098287), (946466064, 250934579),
    (16087819, 194655650), (1956305977, 2024077985),
    (2017064809, 1733024478), (1250324205, 75003370),
    (1442171594, 1488393902), (180255972, 211359734),
    (1646005276, 761574164), (508545125, 37426449),
    (66172593, 2118896851), (1693876517, 34017048),
    (743220394, 1392248069), (1338486782, 1039910182),
    (1322454143, 995461690), (319018672, 196037792),
]

_LSH_COEFF_VALUES = ",\n      ".join(
    f"({j}, {a}, {b})" for j, (a, b) in enumerate(_LSH_PLANES)
)


@register(
    "ann_lsh_topk",
    oracle=f"""
    WITH coeffs(j, a, b) AS (VALUES
      {_LSH_COEFF_VALUES}
    ),
    emb AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings
    ),
    comps AS (
      SELECT u.vec_id, u.dim, u.m
      FROM (
        SELECT vec_id,
               unnest(list_transform(generate_series(1, len(e)),
                      i -> {{'dim': i,
                             'm': CAST(floor(e[i] * 1000000)
                                       AS BIGINT)}}),
                      recursive := true)
        FROM emb
      ) u
    ),
    dots AS (
      SELECT vec_id, j,
             sum(((a * dim + b) % 2147483647 - 1073741823) * m) AS dot
      FROM comps CROSS JOIN coeffs GROUP BY vec_id, j
    ),
    buckets AS (
      SELECT vec_id,
             sum(CASE WHEN dot > 0 AND j < 8 THEN 1 << j ELSE 0 END)
               AS b1,
             sum(CASE WHEN dot > 0 AND j >= 8 THEN 1 << (j - 8)
                      ELSE 0 END) AS b2
      FROM dots GROUP BY vec_id
    ),
    q AS (SELECT vec_id AS qid, b1, b2 FROM buckets
          WHERE vec_id < 10),
    cand AS (
      SELECT DISTINCT q.qid, x.vec_id
      FROM q JOIN buckets x
        ON (x.b1 = q.b1 OR x.b2 = q.b2) AND x.vec_id <> q.qid
    ),
    scored AS (
      SELECT c.qid, c.vec_id, e.label,
             round(list_cosine_similarity(e.e, qe.e), 6) AS cos_sim
      FROM cand c
      JOIN emb e ON e.vec_id = c.vec_id
      JOIN emb qe ON qe.vec_id = c.qid
    ),
    rk AS (
      SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY cos_sim DESC, vec_id ASC) AS r
      FROM scored
    )
    SELECT qid, vec_id, CAST(label AS INT) AS label, cos_sim
    FROM rk WHERE r <= 5
    """,
    description="LSH-bucketed approximate nearest neighbors, the third "
    "ANN strategy next to IVF and PQ and the first whose ENTIRE "
    "pipeline is value-checked against the oracle: 16 seeded random "
    "hyperplanes (engine-portable affine integer generators over "
    "micro-unit components — the sign test is exact int64 "
    "arithmetic, no float dot can flip a bucket cross-engine) give "
    "each vector two 8-bit sign buckets; candidates share either "
    "bucket with the query (2-band OR amplification, recall "
    "~1-(1-p^8)^2 for bit-agreement p); candidates are exactly "
    "rescored with the rounded cosine and top-5 per query survive. "
    "Scale: bucket assignment is one scan + one groupBy(vec_id); the "
    "candidate join is equi-keyed on the bucket value (two hash "
    "joins + distinct, never a cross join); rescoring touches only "
    "candidates — the classic sub-linear ANN shape",
    tags=("similarity", "topk", "lsh"),
)
@_cache_scoped
def ann_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load(spark, sf, "embeddings")
    comps = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.col("embedding"),
                lambda x: F.floor(x.cast("double") * 1_000_000).cast(
                    "bigint"
                ),
            )
        ).alias("dim0", "m"),
    ).select(
        "vec_id",
        (F.col("dim0").cast("bigint") + 1).alias("dim"),
        "m",
    )
    dot_aggs = []
    for j, (a, b) in enumerate(_LSH_PLANES):
        coeff = (
            (F.lit(a) * F.col("dim") + F.lit(b)) % F.lit(2147483647)
            - F.lit(1073741823)
        )
        dot_aggs.append(F.sum(coeff * F.col("m")).alias(f"dot{j}"))
    dots = comps.groupBy("vec_id").agg(*dot_aggs)
    b1 = sum(
        F.when(F.col(f"dot{j}") > 0, F.lit(1 << j)).otherwise(0)
        for j in range(8)
    )
    b2 = sum(
        F.when(F.col(f"dot{j}") > 0, F.lit(1 << (j - 8))).otherwise(0)
        for j in range(8, 16)
    )
    buckets = _scoped_cache(
        dots.select("vec_id", b1.alias("b1"), b2.alias("b2"))
    )
    q = buckets.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("b1").alias("qb1"),
        F.col("b2").alias("qb2"),
    )
    cand1 = buckets.join(
        F.broadcast(q), F.col("b1") == F.col("qb1")
    ).select("qid", "vec_id")
    cand2 = buckets.join(
        F.broadcast(q), F.col("b2") == F.col("qb2")
    ).select("qid", "vec_id")
    cand = (
        cand1.unionByName(cand2)
        .where(F.col("vec_id") != F.col("qid"))
        .distinct()
    )
    qe = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    scored = (
        cand.join(emb, "vec_id")
        .join(F.broadcast(qe), "qid")
        .select(
            "qid",
            "vec_id",
            "label",
            F.round(
                cosine_col(F.col("embedding"), F.col("qv")), 6
            ).alias("cos_sim"),
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("qid").orderBy(
            F.col("cos_sim").desc(), F.col("vec_id").asc()
        )
    )
    return (
        scored.withColumn("r", rk)
        .where(F.col("r") <= 5)
        .select(
            "qid",
            "vec_id",
            F.col("label").cast("int").alias("label"),
            "cos_sim",
        )
    )
