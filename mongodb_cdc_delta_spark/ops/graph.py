"""Iterative graph algebra as DataFrame ops: PageRank.

Applied here to the near-duplicate similarity graph: documents similar to
MANY other documents are template/boilerplate hubs — exactly what a
corpus pipeline wants to find and down-weight. The power iteration is
the canonical Spark shape:

- edges: (src, dst) both directions from the candidate-pair generator;
- one join + one aggregate per iteration — rank mass flows along edges
  with map-side partial aggregation;
- the rank vector (one double per vertex) is cached per iteration (NOT
  localCheckpoint — see the round-3 planning-cost lesson) so iteration
  i+1 starts from materialized data with known size;
- dangling/isolated vertices keep the teleport term only.

At 100 TB the vertex set is the corpus and each iteration is one
shuffle of (vertex, mass) pairs — the structure GraphX/Pregel would
give, with Catalyst handling the data motion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import load, register
from ._cache import cache_scoped as _cache_scoped
from ._cache import scoped_cache as _scoped_cache

DAMPING = 0.85
ITERS = 5


@_cache_scoped
def pagerank(edges: DataFrame, iters: int = ITERS) -> DataFrame:
    """(id, rank) from an undirected edge list (doc_a, doc_b).

    Normalized so ranks sum to 1 across vertices that appear in edges.
    """
    # scoped caches (ops/_cache.py): sym and verts stay cached THROUGH
    # the caller's action on the returned plan — each iteration's contrib
    # references sym, so an early unpersist (the pre-r8 shape) recomputed
    # the whole upstream pair pipeline once per iteration at action time —
    # and are released when the thread's next pipeline is constructed.
    sym = _scoped_cache(
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(
            edges.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .distinct()
    )
    sym.count()
    verts = _scoped_cache(
        sym.select(F.col("src").alias("id")).distinct()
    )
    n = verts.count()
    if n == 0:
        return verts.select("id", F.lit(0.0).alias("rank"))
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    ranks = verts.select("id", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contrib = (
            sym.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("mass"))
        )
        ranks = _scoped_cache(
            verts.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit((1.0 - DAMPING) / n)
                    + F.lit(DAMPING)
                    * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("rank"),
            )
            # materialized by iteration i+1's first action; truncates
            # recompute without paying an eager job per round
        )
    return ranks


from .dedup import _jaccard_pairs_sql  # noqa: E402


@register(
    "boilerplate_pagerank",
    oracle=_jaccard_pairs_sql(0.05)
    + """,
    sym AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    verts AS (SELECT DISTINCT src AS id FROM sym),
    nn AS (SELECT count(*) AS n FROM verts),
    deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
    r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM verts),
    c1 AS (
      SELECT s.dst AS id, sum(r.rank / d.deg) AS mass
      FROM sym s
      JOIN r0 r ON r.id = s.src
      JOIN deg d ON d.src = s.src
      GROUP BY s.dst
    ),
    r1 AS (
      SELECT v.id,
             0.15000000000000002 / (SELECT n FROM nn)
               + 0.85 * coalesce(c1.mass, 0.0) AS rank
      FROM verts v LEFT JOIN c1 ON c1.id = v.id
    ),
    c2 AS (
      SELECT s.dst AS id, sum(r.rank / d.deg) AS mass
      FROM sym s
      JOIN r1 r ON r.id = s.src
      JOIN deg d ON d.src = s.src
      GROUP BY s.dst
    ),
    r2 AS (
      SELECT v.id,
             0.15000000000000002 / (SELECT n FROM nn)
               + 0.85 * coalesce(c2.mass, 0.0) AS rank
      FROM verts v LEFT JOIN c2 ON c2.id = v.id
    ),
    c3 AS (
      SELECT s.dst AS id, sum(r.rank / d.deg) AS mass
      FROM sym s
      JOIN r2 r ON r.id = s.src
      JOIN deg d ON d.src = s.src
      GROUP BY s.dst
    ),
    r3 AS (
      SELECT v.id,
             0.15000000000000002 / (SELECT n FROM nn)
               + 0.85 * coalesce(c3.mass, 0.0) AS rank
      FROM verts v LEFT JOIN c3 ON c3.id = v.id
    ),
    c4 AS (
      SELECT s.dst AS id, sum(r.rank / d.deg) AS mass
      FROM sym s
      JOIN r3 r ON r.id = s.src
      JOIN deg d ON d.src = s.src
      GROUP BY s.dst
    ),
    r4 AS (
      SELECT v.id,
             0.15000000000000002 / (SELECT n FROM nn)
               + 0.85 * coalesce(c4.mass, 0.0) AS rank
      FROM verts v LEFT JOIN c4 ON c4.id = v.id
    ),
    c5 AS (
      SELECT s.dst AS id, sum(r.rank / d.deg) AS mass
      FROM sym s
      JOIN r4 r ON r.id = s.src
      JOIN deg d ON d.src = s.src
      GROUP BY s.dst
    ),
    r5 AS (
      SELECT v.id,
             0.15000000000000002 / (SELECT n FROM nn)
               + 0.85 * coalesce(c5.mass, 0.0) AS rank
      FROM verts v LEFT JOIN c5 ON c5.id = v.id
    )
    SELECT id, round(rank, 8) AS rank FROM r5
    ORDER BY rank DESC, id ASC LIMIT 20
    """,
    # 5 unrolled power iterations in plain SQL — float literals mirror the
    # Spark side bit-for-bit ((1.0-0.85) is 0.15000000000000002 in IEEE
    # double, NOT 0.15); add-order drift is ~1e-15, far under the round-8
    # emission. Equivalence with a pure-Python reference power iteration
    # is ALSO asserted in tests/test_graph.py.
    description="PageRank over the trigram-Jaccard near-dup graph: "
    "template/boilerplate hubs (docs similar to many others) surface "
    "with high rank. 5 power iterations, one (vertex, mass) shuffle "
    "each; rank vector cached per iteration. Top-20 by rank",
    tags=("dedup", "graph", "iterative"),
)
def boilerplate_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    from .dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        load(spark, sf, "documents"), n=3, threshold=0.05, max_shingle_df=100
    ).select("doc_a", "doc_b")
    pr = pagerank(pairs)
    return (
        pr.select("id", F.round("rank", 8).alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("id").asc())
        .limit(20)
    )


@register(
    "dedup_triangle_counts",
    oracle=_jaccard_pairs_sql(0.02)
    + """,
    tri AS (
      SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
      FROM pairs e1
      JOIN pairs e2 ON e2.doc_a = e1.doc_b
      JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
    FROM (SELECT a AS doc_id FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
    GROUP BY doc_id
    """,
    description="triangle participation per document over the near-dup "
    "graph (trigram Jaccard >= 0.02): docs in many similarity triangles "
    "sit inside DENSE duplicate neighborhoods (template families), a "
    "stronger signal than degree alone. The classic distributed motif "
    "count: edges stored a<b once, two joins enumerate wedges and close "
    "them — shuffle keys are vertex ids, work bounded by sum(deg^2), "
    "never corpus size.",
    tags=("dedup", "graph", "llm-pipeline"),
)
def dedup_triangle_counts(spark: SparkSession, sf: str) -> DataFrame:
    from .dedup import ngram_jaccard_pairs

    docs = load(spark, sf, "documents")
    pairs = ngram_jaccard_pairs(
        docs, n=3, threshold=0.02, max_shingle_df=100
    ).select("doc_a", "doc_b")
    # pairs feeds three join branches; materialize once so candidate
    # generation runs once, via localCheckpoint like connected_components
    # does for the same edge list — a cache() here would pin the blocks
    # for the rest of the session (nothing can unpersist after the lazy
    # result escapes), starving later queries' storage memory
    pairs = pairs.localCheckpoint(eager=True)
    e1 = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = pairs.select(F.col("doc_a").alias("b2"), F.col("doc_b").alias("c"))
    e3 = pairs.select(F.col("doc_a").alias("a3"), F.col("doc_b").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(
            e3,
            (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
        )
        .select("a", "b", "c")
    )
    # r10 OPT (guide §1.2): one explode over the three corners instead of
    # a 3-way union of selects — the union shape executed the two-join
    # triangle enumeration three times.
    members = tri.select(
        F.explode(F.array("a", "b", "c")).alias("doc_id")
    )
    return members.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
