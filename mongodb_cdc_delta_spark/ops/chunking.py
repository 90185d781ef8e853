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

from ..queries import load, register, spread

CHUNK = 64
STRIDE = 48


VOCAB_CAP = 50_000


@register(
    "unigram_logprob_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), counts AS (
      SELECT tok, count(*) AS n FROM toks GROUP BY tok
    ), total AS (
      SELECT CAST(sum(n) AS DOUBLE) AS t FROM counts
    ), vocab AS (
      SELECT tok, n FROM (
        SELECT tok, n,
               row_number() OVER (ORDER BY n DESC, tok ASC) AS rk
        FROM counts
      ) WHERE rk <= {VOCAB_CAP}
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum(ln(coalesce(v.n, 1) / (SELECT t FROM total)))
                 / count(*), 6) AS avg_logprob
    FROM toks LEFT JOIN vocab v USING (tok)
    GROUP BY doc_id
    """,
    description="unigram LM quality score: corpus token distribution → "
    "per-doc mean log-probability (the perplexity-screen shape used for "
    "corpus filtering). The vocabulary is capped at the top-50k tokens "
    "(deterministic count-desc/token-asc rank) with a 1-count OOV floor, "
    "so the broadcast stays bounded on a web-scale corpus whose raw "
    "distinct-token count is unbounded (typos, ids, urls)",
    tags=("text", "quality", "llm-pipeline"),
)
def unigram_logprob_score(spark: SparkSession, sf: str) -> DataFrame:
    return unigram_score(
        load(spark, sf, "documents"), vocab_cap=VOCAB_CAP
    )


def unigram_score(
    docs: DataFrame, text_col: str = "text", vocab_cap: int = VOCAB_CAP
) -> DataFrame:
    """Mean unigram log-prob per doc over a top-``vocab_cap`` vocabulary;
    out-of-vocabulary tokens take a 1-count floor probability."""
    toks = docs.select(
        "doc_id", F.explode(F.split(text_col, " ")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").cast("double").alias("t"))
    # top-K via orderBy+limit, which compiles to TakeOrdered — a
    # tree-reduced DISTRIBUTED top-K. A row_number window would funnel the
    # whole distinct-token set through one partition, the exact bottleneck
    # a web-scale vocabulary (billions of distinct tokens) cannot afford.
    vocab = (
        counts.orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(vocab_cap)
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.log(F.coalesce(F.col("n"), F.lit(1)) / F.col("t")))
                / F.count("*"),
                6,
            ).alias("avg_logprob"),
        )
    )


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


@register(
    "fuzzy_levenshtein_pairs",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, source, substring(text, 1, 40) AS head
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.head, b.head) AS edit_dist
    FROM d a
    JOIN d b ON a.lang = b.lang AND a.source = b.source
            AND a.doc_id < b.doc_id
    WHERE levenshtein(a.head, b.head) <= 25
    """,
    description="fuzzy near-dup candidates: Levenshtein distance over "
    "40-char prefixes within (lang, source) blocks — O(block²) bounded by "
    "the blocking key, exact integer distances on both engines; the "
    "edit-distance rescoring stage that follows cheap candidate blocking. "
    "Scale guard (r7): (lang, source) cardinality is FIXED while blocks "
    "grow linearly with the corpus, so the pair space is genuinely "
    "quadratic in rows (measured 40.9x wall at 10x rows — ~100x pairs, "
    "sublinear in pair work). A one-aggregate pre-pass computes the "
    "exact block-pair space and raises above the budget with a pointer "
    "to the banded-LSH path, the same self-protection as the "
    "exact-Jaccard family",
    tags=("text", "dedup", "fuzzy"),
)
def fuzzy_levenshtein_pairs(spark: SparkSession, sf: str) -> DataFrame:
    return fuzzy_levenshtein_pairs_guarded(spark, sf)


#: each surviving pair runs a banded 40x25 edit-distance kernel — far
#: heavier than a hash-join row, so the budget sits well below the
#: Jaccard family's (50M pairs ~= a few minutes on 32 cores).
FUZZY_PAIR_BUDGET = 50_000_000


def fuzzy_levenshtein_pairs_guarded(
    spark: SparkSession, sf: str, pair_budget: int | None = FUZZY_PAIR_BUDGET
) -> DataFrame:
    d = load(spark, sf, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.substring("text", 1, 40).alias("head"),
    )
    if pair_budget is not None:
        est = (
            # null blocking keys can never satisfy the equi-join
            # (NULL == NULL is not true), so they contribute zero pairs
            # — counting them would spuriously trip the guard on
            # corpora with many lang/source-less documents
            d.where(
                F.col("lang").isNotNull() & F.col("source").isNotNull()
            )
            .groupBy("lang", "source")
            .agg(F.count("*").alias("n"))
            .agg(
                F.coalesce(
                    F.sum(F.expr("n * (n - 1) div 2")), F.lit(0)
                ).alias("pairs")
            )
            .collect()[0]["pairs"]
        )
        if int(est) > pair_budget:
            raise RuntimeError(
                f"fuzzy_levenshtein_pairs: block-pair space {est:,} "
                f"exceeds budget {pair_budget:,} — (lang, source) "
                "blocks grow linearly with the corpus, so this exact "
                "O(block^2) rescoring is quadratic in rows; use the "
                "banded-LSH candidate path (dedup_banded_fallback / "
                "dedup_minhash_lsh) to generate candidates and rescore "
                "only those, or raise pair_budget explicitly"
            )
    # a 1-file corpus reads as ONE input partition, and a broadcast join
    # inherits the streamed side's parallelism — without this spread every
    # edit distance runs in a single task; 5k rows make the Exchange free
    a = spread(d).alias("a")
    b = d.alias("b")
    # thresholded variant: early-exits once distance exceeds the cap
    # (returns -1), turning the per-pair cost from O(40x40) worst case
    # into O(40xcap-band) — the difference between hours and minutes on
    # million-pair blocks
    dist = F.levenshtein(F.col("a.head"), F.col("b.head"), 25)
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            # conjunct ORDER is load-bearing: the join condition evaluates
            # left to right, so the cheap id comparison must short-circuit
            # before the edit distance — a `.where(dist)` after the join
            # is pushed in FRONT of it and doubles the levenshtein work
            # across unordered pairs. `>= 0` alone is the full threshold
            # predicate (thresholded levenshtein returns -1 past the cap);
            # `>= 0 AND <= 25` would evaluate the distance twice per pair.
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (dist >= 0),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.alias("edit_dist"),
        )
    )


@register(
    "corpus_prep_pipeline",
    oracle="""
    WITH t AS (
      SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
    ), b AS (
      SELECT doc_id,
             unnest(list_transform(range(2, len(toks) + 1),
                                   i -> toks[i-1] || ' ' || toks[i])) AS bg
      FROM t WHERE len(toks) >= 2
    ), c AS (
      SELECT doc_id, bg, count(*) AS n FROM b GROUP BY doc_id, bg
    ), p AS (
      SELECT doc_id, max(n) AS top_bg, sum(n) AS n_bg FROM c GROUP BY doc_id
    ), ok AS (
      SELECT t.doc_id FROM t JOIN p USING (doc_id)
      WHERE NOT (CAST(top_bg AS DOUBLE) / n_bg > 0.10
                 OR CAST(len(list_distinct(toks)) AS DOUBLE)
                    / len(toks) < 0.30)
    ), keep AS (
      SELECT min(doc_id) AS doc_id FROM documents
      GROUP BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
    ), base AS (
      SELECT d.doc_id, d.text FROM documents d
      JOIN ok USING (doc_id) JOIN keep USING (doc_id)
    )
    SELECT CASE WHEN ((((doc_id % 100003) * 2654435761 + 7919)
                      % 2147483648) % 10000) < 500 THEN 'val'
                WHEN ((((doc_id % 100003) * 2654435761 + 7919)
                      % 2147483648) % 10000) < 1000 THEN 'test'
                ELSE 'train' END AS split,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM base GROUP BY 1
    """,
    description="the full corpus-prep story as ONE declarative plan: "
    "repetition screen -> normalized exact dedup -> deterministic "
    "train/val/test split -> per-split size accounting. Catalyst sees the "
    "whole pipeline (filters push into scans, the dedup keep-set is a "
    "semi-join, the split is a projection) — no intermediate "
    "materialization between stages",
    tags=("text", "llm-pipeline", "pipeline"),
)
def corpus_prep_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    from .sampling import three_way_split

    docs = load(spark, sf, "documents")
    base = docs.select("doc_id", F.split("text", " ").alias("toks")).where(
        F.size("toks") >= 2
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
        .agg(F.max("n").alias("top_bg"), F.sum("n").alias("n_bg"))
    )
    stats = base.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
    )
    ok = (
        stats.join(per_doc, "doc_id")
        .where(
            ~(
                (F.col("top_bg").cast("double") / F.col("n_bg") > 0.10)
                | (
                    F.col("n_distinct").cast("double") / F.col("n_tokens")
                    < 0.30
                )
            )
        )
        .select("doc_id")
    )
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    keep = (
        docs.groupBy(F.md5(norm).alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    surviving = (
        docs.join(ok, "doc_id", "left_semi")
        .join(keep, "doc_id", "left_semi")
    )
    return (
        three_way_split(surviving, "doc_id", 0.05, 0.05)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split("text", " ")))
            .cast("long")
            .alias("total_tokens"),
        )
    )


BIGRAM_CAP = 200_000
_LAM = 0.7


@register(
    "bigram_logprob_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), uni AS (
      SELECT tok, count(*) AS n FROM (
        SELECT unnest(ts) AS tok FROM toks) WHERE tok <> '' GROUP BY tok
    ), total AS (
      SELECT CAST(sum(n) AS DOUBLE) AS t FROM uni
    ), vocab AS (
      SELECT tok, n FROM (
        SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok ASC) AS rk
        FROM uni) WHERE rk <= {VOCAB_CAP}
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(2, len(ts)),
                    i -> struct_pack(p := ts[i-1], c := ts[i]))) AS e
      FROM toks
    ), bge AS (
      SELECT doc_id, e.p AS p, e.c AS c FROM bg
      WHERE e.p <> '' AND e.c <> ''
    ), bcounts AS (
      SELECT p, c, n FROM (
        SELECT p, c, count(*) AS n,
               row_number() OVER (ORDER BY count(*) DESC, p ASC, c ASC)
                 AS rk
        FROM bge GROUP BY p, c) WHERE rk <= {BIGRAM_CAP}
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(sum(ln({_LAM} * coalesce(b.n, 0)
                         / coalesce(vp.n, 1)
                     + {1 - _LAM} * coalesce(vc.n, 1)
                         / (SELECT t FROM total)))
                 / count(*), 6) AS avg_logprob
    FROM bge
    LEFT JOIN bcounts b ON b.p = bge.p AND b.c = bge.c
    LEFT JOIN vocab vp ON vp.tok = bge.p
    LEFT JOIN vocab vc ON vc.tok = bge.c
    GROUP BY doc_id
    """,
    description="interpolated bigram LM score: per-doc mean "
    "ln(0.7 P(w|prev) + 0.3 P(w)) — the stronger perplexity screen above "
    "the unigram one. Vocabulary capped at 50k and bigram table at 200k "
    "(deterministic rank), so BOTH model tables broadcast at any corpus "
    "size; OOV floors at count 1. One scan builds the tables, one scan "
    "scores",
    tags=("llm-pipeline", "textstats"),
)
def bigram_logprob_score(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("ts"))
    uni = (
        toks.select(F.explode("ts").alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    total = uni.agg(F.sum("n").cast("double").alias("t"))
    # top-K caps via orderBy+limit → TakeOrdered, a tree-reduced
    # DISTRIBUTED top-K (same shape as unigram_score). A row_number
    # window here would funnel the entire distinct-token / distinct-bigram
    # set through ONE partition — unbounded on a web-scale corpus.
    vocab = (
        uni.orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(VOCAB_CAP)
        .select("tok", "n")
    )
    bge = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(ts, 1, size(ts) - 1),"
                    " slice(ts, 2, size(ts) - 1),"
                    " (x, y) -> struct(x as p, y as c))"
                )
            ).alias("e"),
        )
        .select("doc_id", F.col("e.p").alias("p"), F.col("e.c").alias("c"))
        .where((F.col("p") != "") & (F.col("c") != ""))
    )
    bcounts = (
        bge.groupBy("p", "c")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("p").asc(), F.col("c").asc())
        .limit(BIGRAM_CAP)
        .select(
            F.col("p").alias("bp"),
            F.col("c").alias("bc"),
            F.col("n").alias("bn"),
        )
    )
    vp = vocab.select(F.col("tok").alias("p"), F.col("n").alias("pn"))
    vc = vocab.select(F.col("tok").alias("c"), F.col("n").alias("cn"))
    scored = (
        bge.join(
            F.broadcast(bcounts),
            (F.col("p") == F.col("bp")) & (F.col("c") == F.col("bc")),
            "left",
        )
        .join(F.broadcast(vp), "p", "left")
        .join(F.broadcast(vc), "c", "left")
        .crossJoin(F.broadcast(total))
    )
    lp = F.log(
        F.lit(_LAM)
        * F.coalesce(F.col("bn"), F.lit(0))
        / F.coalesce(F.col("pn"), F.lit(1))
        + F.lit(1 - _LAM)
        * F.coalesce(F.col("cn"), F.lit(1))
        / F.col("t")
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.sum(lp) / F.count("*"), 6).alias("avg_logprob"),
    )


_CTX_LENGTHS = (512, 1024, 2048, 4096)


@register(
    "context_truncation_report",
    oracle="""
    WITH toks AS (
      SELECT len(string_split(text, ' ')) AS n_tokens FROM documents
    ), lens AS (
      SELECT unnest([512, 1024, 2048, 4096]) AS context_len
    ), rep AS (
      SELECT l.context_len, t.n_tokens FROM lens l CROSS JOIN toks t
    )
    SELECT CAST(context_len AS BIGINT) AS context_len,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN n_tokens > context_len THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_truncated,
           CAST(sum(greatest(n_tokens - context_len, 0)) AS BIGINT)
             AS tokens_lost,
           CAST(sum(CASE WHEN n_tokens > context_len THEN 1 ELSE 0 END)
                * 1000000 AS BIGINT) // count(*) AS docs_truncated_ppm,
           CAST(sum(greatest(n_tokens - context_len, 0)) * 1000000
                AS BIGINT) // CAST(sum(n_tokens) AS BIGINT)
             AS tokens_lost_ppm
    FROM rep GROUP BY context_len
    """,
    description="context-length truncation report: for each candidate "
    "training context length (512/1024/2048/4096 tokens), how many "
    "documents exceed it and what fraction of corpus tokens a "
    "truncate-at-L policy would discard (integer ppm, engine-exact) — "
    "the one-scan table that decides packing vs chunking vs truncation "
    "for a corpus. Token counts computed once, replicated across the 4 "
    "constant lengths by explode, then a 4-group partial aggregate: "
    "map-side combine reduces everything to 4 rows before the shuffle.",
    tags=("llm-pipeline", "report", "agg"),
)
def context_truncation_report(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    toks = docs.select(
        F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    rep = toks.select(
        F.explode(
            F.array(*[F.lit(x) for x in _CTX_LENGTHS])
        ).alias("context_len"),
        "n_tokens",
    )
    over = (F.col("n_tokens") > F.col("context_len")).cast("long")
    lost = F.greatest(
        F.col("n_tokens") - F.col("context_len"), F.lit(0)
    ).cast("long")
    return (
        rep.groupBy("context_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(over).alias("docs_truncated"),
            F.sum(lost).alias("tokens_lost"),
        )
        .select(
            F.col("context_len").cast("long"),
            "n_docs",
            "total_tokens",
            "docs_truncated",
            "tokens_lost",
            F.expr("docs_truncated * 1000000 div n_docs").alias(
                "docs_truncated_ppm"
            ),
            F.expr("tokens_lost * 1000000 div total_tokens").alias(
                "tokens_lost_ppm"
            ),
        )
    )


TRIGRAM_CAP = 200_000
_BACKOFF = 0.4  # Brants et al. 2007's fixed stupid-backoff alpha


@register(
    "trigram_backoff_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), uni AS (
      SELECT tok, count(*) AS n FROM (
        SELECT unnest(ts) AS tok FROM toks) WHERE tok <> '' GROUP BY tok
    ), total AS (
      SELECT CAST(sum(n) AS DOUBLE) AS t FROM uni
    ), vocab AS (
      SELECT tok, n FROM (
        SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok ASC) AS rk
        FROM uni) WHERE rk <= {VOCAB_CAP}
    ), bge AS (
      SELECT doc_id, e.p AS p, e.c AS c FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(2, len(ts)),
                      i -> struct_pack(p := ts[i-1], c := ts[i]))) AS e
        FROM toks)
      WHERE e.p <> '' AND e.c <> ''
    ), bcounts AS (
      SELECT p, c, n FROM (
        SELECT p, c, count(*) AS n,
               row_number() OVER (ORDER BY count(*) DESC, p ASC, c ASC)
                 AS rk
        FROM bge GROUP BY p, c) WHERE rk <= {BIGRAM_CAP}
    ), tge AS (
      SELECT doc_id, e.p2 AS p2, e.p1 AS p1, e.c AS c FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(3, len(ts)),
                      i -> struct_pack(p2 := ts[i-2], p1 := ts[i-1],
                                       c := ts[i]))) AS e
        FROM toks)
      WHERE e.p2 <> '' AND e.p1 <> '' AND e.c <> ''
    ), tcounts AS (
      SELECT p2, p1, c, n FROM (
        SELECT p2, p1, c, count(*) AS n,
               row_number() OVER (ORDER BY count(*) DESC, p2 ASC, p1 ASC,
                                  c ASC) AS rk
        FROM tge GROUP BY p2, p1, c) WHERE rk <= {TRIGRAM_CAP}
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_trigrams,
           round(sum(ln(
             CASE WHEN t3.n IS NOT NULL AND bctx.n IS NOT NULL
                  THEN CAST(t3.n AS DOUBLE) / bctx.n
                  ELSE {_BACKOFF} * (
                    CASE WHEN bbak.n IS NOT NULL AND vp.n IS NOT NULL
                         THEN CAST(bbak.n AS DOUBLE) / vp.n
                         ELSE {_BACKOFF} * coalesce(vc.n, 1)
                              / (SELECT t FROM total)
                    END)
             END)) / count(*), 6) AS avg_logprob
    FROM tge
    LEFT JOIN tcounts t3
           ON t3.p2 = tge.p2 AND t3.p1 = tge.p1 AND t3.c = tge.c
    LEFT JOIN bcounts bctx ON bctx.p = tge.p2 AND bctx.c = tge.p1
    LEFT JOIN bcounts bbak ON bbak.p = tge.p1 AND bbak.c = tge.c
    LEFT JOIN vocab vp ON vp.tok = tge.p1
    LEFT JOIN vocab vc ON vc.tok = tge.c
    GROUP BY doc_id
    """,
    description="stupid-backoff trigram LM score (Brants et al. 2007, the "
    "canonical distributed web-scale LM): per-doc mean ln S(w|w-2,w-1) "
    "with S = count3/count2ctx, backing off at alpha=0.4 to the bigram "
    "relative frequency and then to the floored unigram. All three model "
    "tables are deterministically capped (50k/200k/200k by count-desc "
    "then lexicographic) so they BROADCAST at any corpus size; scoring "
    "is one scan with four broadcast hash joins — no shuffle of text, "
    "ever. The three-tier CASE is textually identical in both engines so "
    "the only cross-engine drift is sum order, absorbed by round(.,6).",
    tags=("llm-pipeline", "textstats"),
)
def trigram_backoff_score(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    # no spread() here: A/B at sf0.1 measured the round-robin exchange
    # as a net loss (2.6 s vs 1.6-2.0 s warm) — the gram explodes are
    # cheap relative to the capped-table TakeOrdereds, and the extra
    # Exchange is not reused across all four consumer branches.
    toks = docs.select("doc_id", F.split("text", " ").alias("ts"))
    # deliberately NOT cached: uni feeds four consumers, but A/B at
    # sf0.1 measured .cache() as a net loss (2.0-2.6 s vs 1.6-2.0 s
    # warm) — materializing the FULL distinct-token table costs more
    # than the re-derivations, whose shuffles Spark already reuses
    # (ReusedExchange) across the broadcast builds
    uni = (
        toks.select(F.explode("ts").alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )
    total = uni.agg(F.sum("n").cast("double").alias("t"))
    # all caps via orderBy+limit → TakeOrdered (distributed tree top-K);
    # a row_number window would single-partition the distinct-gram set.
    vocab = (
        uni.orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(VOCAB_CAP)
        .select("tok", "n")
    )
    bge = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(ts, 1, size(ts) - 1),"
                    " slice(ts, 2, size(ts) - 1),"
                    " (x, y) -> struct(x as p, y as c))"
                )
            ).alias("e"),
        )
        .select(F.col("e.p").alias("p"), F.col("e.c").alias("c"))
        .where((F.col("p") != "") & (F.col("c") != ""))
    )
    bcounts = (
        bge.groupBy("p", "c")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("p").asc(), F.col("c").asc())
        .limit(BIGRAM_CAP)
    )
    tge = (
        # size guard: sequence(0, n) DESCENDS when n < 0, so a 1-2 token
        # doc would index out of bounds (caught by the seeded edge test)
        toks.where(F.size("ts") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ts) - 3),"
                    " i -> struct(ts[i] as p2, ts[i+1] as p1,"
                    " ts[i+2] as c))"
                )
            ).alias("e"),
        )
        .select(
            "doc_id",
            F.col("e.p2").alias("p2"),
            F.col("e.p1").alias("p1"),
            F.col("e.c").alias("c"),
        )
        .where(
            (F.col("p2") != "") & (F.col("p1") != "") & (F.col("c") != "")
        )
    )
    tcounts = (
        tge.groupBy("p2", "p1", "c")
        .agg(F.count("*").alias("n"))
        .orderBy(
            F.col("n").desc(),
            F.col("p2").asc(),
            F.col("p1").asc(),
            F.col("c").asc(),
        )
        .limit(TRIGRAM_CAP)
        .select(
            F.col("p2").alias("t2"),
            F.col("p1").alias("t1"),
            F.col("c").alias("tc"),
            F.col("n").alias("n3"),
        )
    )
    bctx = bcounts.select(
        F.col("p").alias("xp"), F.col("c").alias("xc"), F.col("n").alias("n2ctx")
    )
    bbak = bcounts.select(
        F.col("p").alias("yp"), F.col("c").alias("yc"), F.col("n").alias("n2bak")
    )
    vp = vocab.select(F.col("tok").alias("vtp"), F.col("n").alias("p1n"))
    vc = vocab.select(F.col("tok").alias("vtc"), F.col("n").alias("cn"))
    scored = (
        tge.join(
            F.broadcast(tcounts),
            (F.col("p2") == F.col("t2"))
            & (F.col("p1") == F.col("t1"))
            & (F.col("c") == F.col("tc")),
            "left",
        )
        .join(
            F.broadcast(bctx),
            (F.col("p2") == F.col("xp")) & (F.col("p1") == F.col("xc")),
            "left",
        )
        .join(
            F.broadcast(bbak),
            (F.col("p1") == F.col("yp")) & (F.col("c") == F.col("yc")),
            "left",
        )
        .join(F.broadcast(vp), F.col("p1") == F.col("vtp"), "left")
        .join(F.broadcast(vc), F.col("c") == F.col("vtc"), "left")
        .crossJoin(F.broadcast(total))
    )
    bigram_rel = (
        F.lit(_BACKOFF)
        * F.when(
            F.col("n2bak").isNotNull() & F.col("p1n").isNotNull(),
            F.col("n2bak").cast("double") / F.col("p1n"),
        ).otherwise(
            F.lit(_BACKOFF) * F.coalesce(F.col("cn"), F.lit(1)) / F.col("t")
        )
    )
    score = F.when(
        F.col("n3").isNotNull() & F.col("n2ctx").isNotNull(),
        F.col("n3").cast("double") / F.col("n2ctx"),
    ).otherwise(bigram_rel)
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_trigrams"),
        F.round(F.sum(F.log(score)) / F.count("*"), 6).alias("avg_logprob"),
    )
