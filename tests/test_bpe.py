"""BPE merge learning: equivalence with a pure-Python reference
implementation (the Sennrich et al. 2016 algorithm, verbatim semantics:
weighted pair counts, deterministic (count desc, pair asc) selection,
greedy left-to-right single-pass merge)."""

from __future__ import annotations

from collections import Counter

import pytest

from mongodb_cdc_delta_spark.ops.bpe import EOW, bpe_train, word_symbol_table


def ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Pure-Python reference BPE trainer."""
    vocab = {
        tuple(list(w[:-1]) + [w[-1] + EOW]): f
        for w, f in word_freqs.items()
        if w
    }
    merges = []
    for step in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, a, b, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def corpus_freqs(texts: list[str]) -> dict[str, int]:
    c: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                c[w] += 1
    return dict(c)


def test_merges_match_reference_on_testdata(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    expected = ref_bpe(corpus_freqs(texts), 6)
    got = bpe_train(docs.select("doc_id", "text"), 6)
    assert got == expected


def test_merges_on_classic_tiny_corpus(spark):
    # the canonical low/lower/newest/widest example
    texts = ["low low low low low lower lower newest newest newest "
             "newest newest newest widest widest widest"]
    docs = spark.createDataFrame(
        [(1, texts[0])], "doc_id long, text string"
    )
    expected = ref_bpe(corpus_freqs(texts), 5)
    got = bpe_train(docs, 5)
    assert got == expected
    # first learned merge must be the most frequent pair: e+s from
    # newest(6)+widest(3)
    assert (got[0][1], got[0][2]) == ("e", "s")


def test_repeated_symbol_greedy_merge(spark):
    # "aaaa" + merge (a,a): greedy left-to-right gives (aa)(aa), not
    # (a)(aa)(a) — the fold must match the reference exactly
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa")], "doc_id long, text string"
    )
    expected = ref_bpe(corpus_freqs(["aaaa aaaa aaaa"]), 3)
    got = bpe_train(docs, 3)
    assert got == expected


def test_symbol_table_tags_eow(spark):
    docs = spark.createDataFrame([(1, "ab a")], "doc_id long, text string")
    rows = {
        r.word: (r.freq, r.s)
        for r in word_symbol_table(docs).collect()
    }
    assert rows["ab"] == (1, ["a", "b" + EOW])
    assert rows["a"] == (1, ["a" + EOW])


def ref_tokenize(word_freqs, merges):
    """Apply merges in order; returns token → corpus frequency."""
    from collections import Counter

    counts: Counter = Counter()
    for w, f in word_freqs.items():
        syms = list(w[:-1]) + [w[-1] + EOW]
        for _step, a, b, _cnt in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        for s in syms:
            counts[s] += f
    return dict(counts)


def test_apply_matches_reference_token_frequencies(spark, sf_smoke):
    from mongodb_cdc_delta_spark.ops.bpe import bpe_apply
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").select(
        "doc_id", "text"
    )
    texts = [r.text for r in docs.select("text").collect()]
    freqs = corpus_freqs(texts)
    merges = ref_bpe(freqs, 6)
    expected = ref_tokenize(freqs, merges)
    got = (
        bpe_apply(docs, [(m[1], m[2]) for m in merges])
        .select("freq", F.explode("s").alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").alias("cnt"))
        .collect()
    )
    assert {r.token: r.cnt for r in got} == expected
