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

DAMPING = 0.85
ITERS = 5


def pagerank(edges: DataFrame, iters: int = ITERS) -> DataFrame:
    """(id, rank) from an undirected edge list (doc_a, doc_b).

    Normalized so ranks sum to 1 across vertices that appear in edges.
    """
    sym = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(
            edges.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .distinct()
        .cache()
    )
    sym.count()
    verts = (
        sym.select(F.col("src").alias("id")).distinct().cache()
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
        ranks = (
            verts.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit((1.0 - DAMPING) / n)
                    + F.lit(DAMPING)
                    * F.coalesce(F.col("mass"), F.lit(0.0))
                ).alias("rank"),
            )
            .cache()  # materialized by iteration i+1's first action;
            # truncates recompute without paying an eager job per round
        )
    sym.unpersist()
    return ranks


@register(
    "boilerplate_pagerank",
    oracle=None,  # iterative float fixpoint; equivalence with a pure-
    # Python reference power iteration asserted in tests/test_graph.py
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
