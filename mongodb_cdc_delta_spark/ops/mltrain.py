"""In-engine training for the hashed linear quality classifier.

``quality_linear_classifier`` (textstats.py) SERVES a fixed hashed-weight
model; this module TRAINS one, as the fourth instance of the repo's
iterative-algorithm-as-DataFrame-ops family (k-means codebooks, BPE
merges, PageRank). The design goal is the same exactness discipline as
the rest of the registry: every quantity in the training loop is an
INTEGER (micro-units, ppm), every division is an explicit floor-division
with positive divisor, so a training run is bit-reproducible across
partitionings, run-to-run, and engines — no float gradient sum whose
value depends on aggregation order.

Model: hard-sigmoid logistic regression over hashing-trick bag-of-words
(Weinberger et al. 2009 feature hashing; hard sigmoid as in quantized
training practice):

    S_d        = Σ_b n_db · w_b                 (exact integer)
    margin_d   = floordiv(S_d, n_d)             (mean token weight, ppm)
    p_d        = clamp(500000 + floordiv(margin_d, 4), 0, 1e6)
    r_d        = p_d − y_d                      (y ∈ {0, 1e6})
    g_b        = Σ_d n_db · r_d                 (exact integer)
    w_b       ← w_b − floordiv(g_b, N·K)        (K = inverse learning rate)

Scale shape per iteration: ONE broadcast join of the (dim)-row weight
table against the cached (doc, bucket, n) features, one doc-keyed
aggregate for margins, one doc-keyed join back (co-partitioned — both
sides are corpus-keyed), one bucket-keyed aggregate for the gradient.
The driver holds only the weight vector (dim integers, bounded by
construction) — the same bounded-collect pattern as the PQ codebooks.

The driver-data corpus is deliberately NOT registered as a query for
this op: its languages share one uniform token vocabulary (a float
logistic tops out at ~0.58 train accuracy — measured), so a trained
model there would look vacuous. The tests train on seeded separable
corpora instead and assert exact-integer equivalence with a pure-Python
reference implementation plus run-to-run determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._cache import scoped_cache as _scoped_cache

#: polynomial token hash shared with quality_linear_classifier/cms
_TOK_POLY = (
    "aggregate(transform(sequence(1, length(tok)),"
    " i -> cast(ascii(substring(tok, i, 1)) as bigint)),"
    " 0L, (a, c) -> (a * 131 + c) % 2147483647)"
)

PPM = 1_000_000


def _fdiv_sql(num: str, den: str) -> str:
    """Exact floor-division SQL for a POSITIVE divisor, identical in any
    engine: subtract the positive modulus first so the remaining quotient
    has zero remainder (trunc == floor). `%` is truncation-signed in both
    Spark and DuckDB, so pmod is built inline."""
    return (
        f"cast(({num} - ((({num} % {den}) + {den}) % {den}))"
        f" / {den} as bigint)"
    )


def hashed_features(
    docs: DataFrame, dim: int
) -> tuple[DataFrame, DataFrame]:
    """(doc_id, bucket, n) token-bucket counts + (doc_id, n_tokens)."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    bucket = (F.expr(_TOK_POLY) % dim).cast("int")
    feats = (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("n"))
    )
    sizes = feats.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_tokens")
    )
    return feats, sizes


def train_quality_classifier(
    docs: DataFrame,
    dim: int = 1024,
    iters: int = 3,
    inv_lr: int = 50,
) -> list[int]:
    """Train on (doc_id, text, label) where label ∈ {0, 1}; returns the
    integer-ppm weight vector (length ``dim``). Deterministic by
    construction — see module docstring."""
    spark = docs.sparkSession
    feats, sizes = hashed_features(docs, dim)
    # r11 hygiene (r10 verdict #8): register the training cache in the
    # scoped registry so an exception mid-loop cannot leak it past the
    # next pipeline generation; the explicit unpersist in the finally
    # below still releases it eagerly on the normal path.
    base = _scoped_cache(
        feats.join(sizes, "doc_id")
        .join(
            docs.select(
                "doc_id", (F.col("label") * PPM).cast("long").alias("y")
            ),
            "doc_id",
        )
    )
    try:
        return _train_loop(spark, base, dim, iters, inv_lr)
    finally:
        base.unpersist()


def _train_loop(
    spark, base: DataFrame, dim: int, iters: int, inv_lr: int
) -> list[int]:
    n_docs = base.select("doc_id").distinct().count()
    if n_docs == 0:
        raise ValueError("empty training corpus")
    w = [0] * dim
    for _ in range(iters):
        wtab = spark.createDataFrame(
            [(b, int(w[b])) for b in range(dim)], "bucket int, wt long"
        )
        scored = base.join(F.broadcast(wtab), "bucket")
        margins = scored.groupBy("doc_id", "n_tokens", "y").agg(
            F.sum(F.col("n") * F.col("wt")).alias("s")
        )
        margin = F.expr(_fdiv_sql("s", "n_tokens"))
        p = F.greatest(
            F.lit(0),
            F.least(
                F.lit(PPM),
                F.lit(PPM // 2) + F.expr(_fdiv_sql("m", "4")),
            ),
        )
        resid = margins.select(
            "doc_id", margin.alias("m"), "y"
        ).select("doc_id", (p - F.col("y")).cast("long").alias("r"))
        grad = (
            base.join(resid, "doc_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("n") * F.col("r")).alias("g"))
            .collect()
        )  # bounded: at most `dim` rows — the gradient IS the tiny output
        denom = n_docs * inv_lr
        for row in grad:
            # Python's // is already floor-signed — this IS the floor
            # division _fdiv_sql emulates on the SQL side
            w[row["bucket"]] -= int(row["g"]) // denom
    return w


def score_with_weights(
    docs: DataFrame, weights: list[int], dim: int | None = None
) -> DataFrame:
    """(doc_id, margin_ppm, p_ppm, keep) under the trained weights —
    the serving pass, same arithmetic as training (weights broadcast).

    ``dim`` is derivable from ``weights``; if passed it must agree —
    a mismatched dim would silently rehash tokens into the wrong
    bucket space and score with a model that was never trained."""
    if dim is not None and dim != len(weights):
        raise ValueError(
            f"dim={dim} disagrees with len(weights)={len(weights)}"
        )
    dim = len(weights)
    spark = docs.sparkSession
    wtab = spark.createDataFrame(
        [(b, int(weights[b])) for b in range(dim)], "bucket int, wt long"
    )
    feats, sizes = hashed_features(docs, dim)
    margins = (
        feats.join(F.broadcast(wtab), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("n") * F.col("wt")).alias("s"))
        .join(sizes, "doc_id")
    )
    margin = F.expr(_fdiv_sql("s", "n_tokens"))
    p = F.greatest(
        F.lit(0),
        F.least(
            F.lit(PPM),
            F.lit(PPM // 2) + F.expr(_fdiv_sql("m", "4")),
        ),
    )
    return (
        margins.select("doc_id", margin.alias("m"))
        .select(
            "doc_id",
            F.col("m").alias("margin_ppm"),
            p.alias("p_ppm"),
        )
        .withColumn("keep", (F.col("p_ppm") >= PPM // 2).cast("int"))
    )
