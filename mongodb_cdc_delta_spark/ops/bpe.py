"""Distributed BPE tokenizer training (byte-pair-encoding merge learning).

The classic corpus step Sennrich et al. 2016 run single-node: learn the
top-K symbol-pair merges from corpus word frequencies. Spark-first shape:

- The corpus is collapsed to a (word, freq) table ONCE — at 100 TB the
  token stream is huge but the distinct-word table is ~10^7 rows, so every
  subsequent iteration touches only that aggregated table, never the raw
  corpus again.
- Each merge iteration is one explode + one weighted aggregate (map-side
  partial) to rank pairs, a single-ROW collect of the winning pair (the
  merge table itself is the tiny output by definition — same bounded-
  driver-data argument as the k-means centroids in similarity.py), and a
  pure-JVM fold (``aggregate`` HOF) that rewrites each word's symbol array
  greedily left-to-right — exactly the reference algorithm's merge
  semantics, with no Python in the loop.
- ``localCheckpoint`` after each iteration truncates the lineage so K
  merges cost K short jobs, not one 2^K-deep plan. On a real cluster this
  would be a reliable-storage checkpoint; the call site is one line.

Reference parity: the reference (a CDC writer) has no tokenizer surface;
this extends the training-data-pipeline story (SURVEY.md §2 extensions)
alongside unigram_logprob_score / text_bpe_token_count, which only *count*
pre-tokenized units. Here we *learn* the merge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries import load, register
from ._cache import scoped_cache as _scoped_cache

N_MERGES = 6
EOW = "</w>"

# Greedy left-to-right merge of one (pa, pb) pair inside a symbol array —
# the exact single-pass semantics of the reference BPE algorithm. Nested
# CASE (not AND) so element_at never sees an empty array under ANSI mode.
_MERGE_FOLD = """
aggregate(
  s,
  cast(array() as array<string>),
  (acc, x) -> CASE
    WHEN size(acc) = 0 THEN array(x)
    WHEN element_at(acc, -1) = pa AND x = pb
      THEN concat(slice(acc, 1, size(acc) - 1), array(pm))
    ELSE concat(acc, array(x))
  END)
"""

_PAIRS = (
    "zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1),"
    " (x, y) -> struct(x as a, y as b))"
)


def word_symbol_table(docs: DataFrame) -> DataFrame:
    """(word, freq, s): corpus word frequencies with initial symbol arrays
    (characters, last one tagged with the end-of-word marker)."""
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    chars = F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    )
    return words.select("word", "freq", chars.alias("s0")).select(
        "word",
        "freq",
        F.expr(
            "concat(slice(s0, 1, size(s0) - 1),"
            f" array(concat(element_at(s0, -1), '{EOW}')))"
        ).alias("s"),
    )


def pair_counts(words: DataFrame) -> DataFrame:
    """(lhs, rhs, cnt): adjacent-symbol pair frequencies weighted by word
    freq. One explode + one aggregate; partial aggregation applies."""
    return (
        words.select("freq", F.explode(F.expr(_PAIRS)).alias("p"))
        .groupBy(
            F.col("p.a").alias("lhs"), F.col("p.b").alias("rhs")
        )
        .agg(F.sum("freq").alias("cnt"))
    )


def _with_merge_cols(words: DataFrame, lhs: str, rhs: str) -> DataFrame:
    """Bind one merge's (pa, pb, pm) as literal columns for _MERGE_FOLD.

    r10 OPT (guide §2.4): the old shape crossJoin(broadcast(1-row df))
    per merge paid a BroadcastExchange job per iteration; literals make
    the fold a pure projection — zero exchanges, zero extra jobs."""
    return words.withColumns(
        {
            "pa": F.lit(lhs),
            "pb": F.lit(rhs),
            "pm": F.lit(lhs + rhs),
        }
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = N_MERGES,
    return_words: bool = False,
):
    """Learn ``n_merges`` BPE merges; returns [(step, lhs, rhs, cnt)],
    or (merges, words) when ``return_words`` — ``words`` being the
    (word, freq, s) table with every learned merge already applied (the
    exact table ``bpe_apply`` would rebuild, but already materialized).

    r10 OPT (guide §1.2 per-round job count / §1.4 caveat): each
    iteration's round output is scoped-cached and MATERIALIZED by the
    next iteration's top-pair collect — one job per merge where
    localCheckpoint(eager) + collect was two, and without
    localCheckpoint's second non-AQE plan compile. A parent table is
    unpersisted only after its child is materialized, so no iteration
    ever recomputes the fold chain."""
    words = _scoped_cache(word_symbol_table(docs))
    merges: list[tuple[int, str, str, int]] = []
    prev: DataFrame | None = None
    for step in range(1, n_merges + 1):
        top = (
            pair_counts(words)
            .orderBy(
                F.col("cnt").desc(),
                F.col("lhs").asc(),
                F.col("rhs").asc(),
            )
            .limit(1)
            .collect()
        )
        # `words` is materialized now; its parent can be released
        if prev is not None:
            prev.unpersist()
            prev = None
        if not top:
            break
        lhs, rhs, cnt = top[0]["lhs"], top[0]["rhs"], int(top[0]["cnt"])
        merges.append((step, lhs, rhs, cnt))
        nxt = _scoped_cache(
            _with_merge_cols(words, lhs, rhs).select(
                "word", "freq", F.expr(_MERGE_FOLD).alias("s")
            )
        )
        prev = words
        words = nxt
    if return_words:
        return merges, words
    return merges


@register(
    "bpe_pair_counts",
    oracle=f"""
    WITH words AS (
      SELECT tok AS word, count(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE tok <> '' GROUP BY tok
    ), syms AS (
      SELECT freq,
             list_transform(generate_series(1, len(word)),
                            i -> substring(word, i, 1)) AS s0
      FROM words
    ), tagged AS (
      SELECT freq,
             list_concat(s0[1:len(s0) - 1],
                         [s0[len(s0)] || '{EOW}']) AS s
      FROM syms
    ), pairs AS (
      SELECT freq,
             unnest(list_transform(generate_series(1, len(s) - 1),
                    i -> struct_pack(a := s[i], b := s[i + 1]))) AS p
      FROM tagged
    )
    SELECT p.a AS lhs, p.b AS rhs, CAST(sum(freq) AS BIGINT) AS cnt
    FROM pairs GROUP BY p.a, p.b
    ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 20
    """,
    description="BPE training iteration 0: corpus-weighted adjacent "
    "character-pair frequencies over the aggregated word table, top-20. "
    "The raw token stream collapses to (word, freq) first, so pair "
    "counting touches vocabulary-sized data — the property that makes "
    "merge learning iterable at 100 TB",
    tags=("llm-pipeline", "bpe"),
)
def bpe_pair_counts(spark: SparkSession, sf: str) -> DataFrame:
    words = word_symbol_table(load(spark, sf, "documents"))
    return (
        pair_counts(words)
        .orderBy(
            F.col("cnt").desc(), F.col("lhs").asc(), F.col("rhs").asc()
        )
        .limit(20)
    )


@register(
    "bpe_train_merges",
    oracle=None,  # iterative greedy algorithm — not SQL-expressible;
    # equivalence with a pure-Python reference BPE is asserted in
    # tests/test_bpe.py instead
    description="learn the top-6 BPE merges from the corpus (Sennrich-"
    "style greedy pair merging, JVM fold per iteration, lineage "
    "checkpointed). Output is the merge table (step, lhs, rhs, cnt)",
    tags=("llm-pipeline", "bpe"),
)
def bpe_train_merges(spark: SparkSession, sf: str) -> DataFrame:
    merges = bpe_train(load(spark, sf, "documents"), N_MERGES)
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, cnt long"
    ).orderBy("step")


def bpe_apply(
    docs: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Tokenize the corpus with a learned merge table: (word, freq, s)
    with ``s`` the final symbol sequence after applying every merge in
    learned order.

    Each merge is one pure-JVM fold over the vocabulary-sized word table
    (the same greedy pass used during training), so applying K merges is K
    narrow map stages — no shuffle at all after the initial word count."""
    words = word_symbol_table(docs)
    for lhs, rhs in merges:
        words = _with_merge_cols(words, lhs, rhs).select(
            "word", "freq", F.expr(_MERGE_FOLD).alias("s")
        )
    return words


@register(
    "bpe_token_frequencies",
    oracle=None,  # depends on the iteratively-learned merge table; exact
    # equivalence with the pure-Python reference pipeline (train + apply +
    # count) is asserted in tests/test_bpe.py
    description="train 6 BPE merges, tokenize the corpus with them, and "
    "return the resulting token vocabulary with corpus frequencies "
    "(top-30 by count desc, token asc) — the end-to-end learn-then-apply "
    "tokenizer pipeline",
    tags=("llm-pipeline", "bpe"),
)
def bpe_token_frequencies(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    # r10 OPT (guide §1.2): training already materialized the fully-
    # merged symbol table — reuse it instead of re-deriving the word
    # table from the corpus and re-applying all six folds (bpe_apply
    # builds the identical table by construction; the re-derivation was
    # a full second corpus pass + shuffle + six fold projections)
    merges, toks = bpe_train(docs, N_MERGES, return_words=True)
    return (
        toks.select("freq", F.explode("s").alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(30)
    )
