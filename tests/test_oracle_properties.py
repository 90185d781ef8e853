"""DuckDB-only property tests for edge-rich text oracles against pure
Python references (the triangle-closing pattern of
TestTrigramBackoffProperty: Spark == oracle is hash-proven by the parity
suite at two SFs; oracle == reference here, over random corpora the
generated driver data never produces — empty docs, empty tokens, single
tokens, chunk-boundary lengths)."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from mongodb_cdc_delta_spark.ops.chunking import CHUNK, STRIDE
from mongodb_cdc_delta_spark.queries import all_queries

REG = all_queries()


def _con(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": [d for d, _ in docs],
                "text": [t for _, t in docs],
                "n_chars": [len(t) for _, t in docs],
            }
        ),
    )
    return con


_word = st.text(alphabet="abz19", min_size=0, max_size=4)
# lengths straddle the CHUNK/STRIDE boundaries: 0, 1, stride, stride+1,
# chunk, chunk+1, chunk+stride, and a random tail
_doc = st.one_of(
    st.lists(_word, min_size=0, max_size=3).map(" ".join),
    st.integers(min_value=0, max_value=3).flatmap(
        lambda pad: st.sampled_from(
            [0, 1, STRIDE, STRIDE + 1, CHUNK, CHUNK + 1, CHUNK + STRIDE]
        ).map(lambda n: " ".join(f"w{i}" for i in range(n + pad)))
    ),
)


def _ref_chunks(doc_id, text):
    toks = text.split(" ")
    out = []
    for start in range(0, max(len(toks), 1), STRIDE):
        if start >= len(toks):
            break
        chunk = toks[start : start + CHUNK]
        out.append(
            (doc_id, start // STRIDE, len(chunk), " ".join(chunk))
        )
    return out


class TestDocChunkingProperty:
    def test_oracle_matches_reference(self):
        oracle = REG["doc_chunking"].oracle

        @settings(max_examples=30, deadline=None)
        @given(st.lists(_doc, min_size=1, max_size=4))
        def run(texts):
            docs = list(enumerate(texts))
            got = sorted(
                tuple(r) for r in _con(docs).execute(oracle).fetchall()
            )
            want = sorted(
                c for d, t in docs for c in _ref_chunks(d, t)
            )
            assert got == want

        run()


def _ref_fingerprint(text):
    fp = 7
    for w in text.split(" "):
        v = (ord(w[0]) if w else 0) * 131 + len(w)
        fp = (fp * 31 + v) % 1000000007
    return fp


class TestDocFingerprintProperty:
    def test_oracle_matches_reference(self):
        oracle = REG["doc_fingerprint"].oracle

        @settings(max_examples=30, deadline=None)
        @given(st.lists(_doc, min_size=1, max_size=4))
        def run(texts):
            docs = list(enumerate(texts))
            got = dict(_con(docs).execute(oracle).fetchall())
            for d, t in docs:
                assert got[d] == _ref_fingerprint(t), (t, got[d])

        run()
