"""Shared scoring primitives reused across sampling/curriculum ops (kept
out of textstats.py to avoid an import cycle with sampling.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CLF_BUCKETS = 64


def classifier_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, p): the linear-classifier keep probability per document —
    identical math to quality_linear_classifier (hashing-trick integer
    milli-weights, mean-pooled logit → sigmoid)."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    bucket = F.expr(
        "aggregate(transform(sequence(1, length(tok)),"
        " i -> cast(ascii(substring(tok, i, 1)) as bigint)),"
        " 0L, (a, c) -> (a * 131 + c) % 2147483647)"
        f" % {_CLF_BUCKETS}"
    )
    w = (bucket * F.lit(2654435761) + F.lit(7919)) % 1000 - 500
    per_doc = toks.select("doc_id", w.alias("w")).groupBy("doc_id").agg(
        F.count("*").alias("n"), F.sum("w").alias("sw")
    )
    logit = F.col("sw").cast("double") / (F.lit(1000.0) * F.col("n"))
    return per_doc.select(
        "doc_id",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("p"),
    )
