"""Corpus-shaping ops for LLM training pipelines: repetition filtering and
document chunking.

- repetition_signals: Gopher-style repetition screens (top-bigram mass
  fraction, distinct-token fraction). The bigram count is an explode +
  two-level aggregate — linear work with map-side partial aggregation, the
  pattern that survives 100 TB (a per-row higher-order-function count would
  be O(len²) interpreted work per document).
- doc_chunking: overlapping token-window chunks (size 64, stride 48), the
  standard pre-tokenization windowing step. sequence()+explode+slice is all
  JVM codegen; output rows ≈ n_tokens/stride per doc, partition-local (no
  shuffle at all).

Reference parity: the reference has no corpus ops (it is a CDC writer,
delta-writer/src/writer/*.py); these extend the engine toward the
training-data pipeline surface this project targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import load, register

CHUNK = 64
STRIDE = 48


@register(
    "repetition_signals",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), b AS (
      SELECT doc_id,
             unnest(list_transform(range(2, len(toks) + 1),
                                   i -> toks[i-1] || ' ' || toks[i])) AS bg
      FROM t WHERE len(toks) >= 2
    ), c AS (
      SELECT doc_id, bg, count(*) AS n FROM b GROUP BY doc_id, bg
    ), p AS (
      SELECT doc_id, CAST(max(n) AS BIGINT) AS top_bg,
             CAST(sum(n) AS BIGINT) AS n_bg
      FROM c GROUP BY doc_id
    ), s AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
      FROM t WHERE len(toks) >= 2
    )
    SELECT s.doc_id,
           n_tokens,
           round(CAST(top_bg AS DOUBLE) / n_bg, 6) AS top_bigram_frac,
           round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS distinct_frac,
           CASE WHEN CAST(top_bg AS DOUBLE) / n_bg > 0.10
                  OR CAST(n_distinct AS DOUBLE) / n_tokens < 0.30
                THEN 'repetitive' ELSE 'ok' END AS verdict
    FROM s JOIN p ON s.doc_id = p.doc_id
    """,
    description="Gopher-style repetition screen: top-bigram mass fraction + "
    "distinct-token fraction per doc; explode+agg (linear, map-side combine)",
    tags=("text", "quality", "llm-pipeline"),
)
def repetition_signals(spark: SparkSession, sf: str) -> DataFrame:
    base = (
        load(spark, sf, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .where(F.size("toks") >= 2)
    )
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 2),"
                " i -> concat(toks[i], ' ', toks[i + 1]))"
            )
        ).alias("bg"),
    )
    per_doc = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg(
            F.max("n").cast("long").alias("top_bg"),
            F.sum("n").cast("long").alias("n_bg"),
        )
    )
    stats = base.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
    )
    top_frac = F.col("top_bg").cast("double") / F.col("n_bg")
    dis_frac = F.col("n_distinct").cast("double") / F.col("n_tokens")
    return (
        stats.join(per_doc, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.round(top_frac, 6).alias("top_bigram_frac"),
            F.round(dis_frac, 6).alias("distinct_frac"),
            F.when((top_frac > 0.10) | (dis_frac < 0.30), F.lit("repetitive"))
            .otherwise(F.lit("ok"))
            .alias("verdict"),
        )
    )


@register(
    "doc_chunking",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), s AS (
      SELECT doc_id, toks,
             unnest(range(0, len(toks), {STRIDE})) AS start
      FROM t
    )
    SELECT doc_id,
           CAST(start // {STRIDE} AS BIGINT) AS chunk_idx,
           CAST(len(toks[start + 1 : start + {CHUNK}]) AS BIGINT)
             AS chunk_len,
           array_to_string(toks[start + 1 : start + {CHUNK}], ' ')
             AS chunk_text
    FROM s
    """,
    description=f"overlapping token-window chunking (size {CHUNK}, stride "
    f"{STRIDE}): sequence+explode+slice, zero-shuffle codegen",
    tags=("text", "llm-pipeline", "chunking"),
)
def doc_chunking(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.expr(f"sequence(0, size(toks) - 1, {STRIDE})")
            ).alias("start"),
        )
        .select(
            "doc_id",
            (F.col("start") / STRIDE).cast("long").alias("chunk_idx"),
            F.slice(F.col("toks"), F.col("start") + 1, CHUNK).alias("chunk"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.size("chunk").cast("long").alias("chunk_len"),
            F.array_join("chunk", " ").alias("chunk_text"),
        )
    )
