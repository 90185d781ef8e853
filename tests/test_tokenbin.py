"""Packed-token .bin/.idx shards (ops/tokenbin.py).

Contracts pinned here:
- round-trip: write → format("tokenbin") read recovers every document's
  token sequence in order
- index layout: magic/version/dtype/sizes/pointers parse standalone and
  pointers are byte offsets (sizes · itemsize prefix sums)
- determinism: two writes produce byte-identical shards
- dtype safety: out-of-range ids raise instead of wrapping
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from mongodb_cdc_delta_spark.ops.tokenbin import (
    _IDX_MAGIC,
    _read_idx,
    read_tokenbin_manifest,
    register_tokenbin_source,
    write_token_shards,
)


def _frame(spark, n=30):
    rows = [(i, [i % 7, (i * 3) % 11, 65000, i % 2]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id bigint, token_ids array<int>")


class TestTokenBin:
    def test_roundtrip_order_exact(self, spark, tmp_path):
        out = str(tmp_path / "tb")
        man = write_token_shards(_frame(spark), out, key="doc_id",
                                 n_shards=3)
        assert man["total_docs"] == 30
        assert man["total_tokens"] == 120
        register_tokenbin_source(spark)
        back = spark.read.format("tokenbin").load(out)
        # per shard, ordinals follow ascending doc_id; rebuild the global
        # multiset of sequences and check each expected sequence appears
        got = sorted(
            tuple(r["token_ids"]) for r in back.collect()
        )
        want = sorted(
            (i % 7, (i * 3) % 11, 65000, i % 2) for i in range(30)
        )
        assert got == want

    def test_idx_layout_parses_standalone(self, spark, tmp_path):
        out = str(tmp_path / "tb")
        write_token_shards(_frame(spark), out, key="doc_id", n_shards=1)
        idx = os.path.join(out, "shard-00000.idx")
        with open(idx, "rb") as f:
            assert f.read(len(_IDX_MAGIC)) == _IDX_MAGIC
            assert struct.unpack("<Q", f.read(8))[0] == 1  # version
            assert struct.unpack("<B", f.read(1))[0] == 8  # uint16 code
        dtype, sizes, pointers = _read_idx(idx)
        assert dtype == np.dtype("uint16")
        assert sizes.tolist() == [4] * 30
        # pointers are byte offsets: prefix sums of sizes * itemsize
        assert pointers.tolist() == [i * 4 * 2 for i in range(30)]
        bin_sz = os.path.getsize(os.path.join(out, "shard-00000.bin"))
        assert bin_sz == 30 * 4 * 2

    def test_deterministic_bytes(self, spark, tmp_path):
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        for out in (a, b):
            write_token_shards(_frame(spark), out, key="doc_id", n_shards=3)
        for name in sorted(os.listdir(a)):
            if name == "manifest.json":
                continue
            with open(os.path.join(a, name), "rb") as fa, open(
                os.path.join(b, name), "rb"
            ) as fb:
                assert fa.read() == fb.read(), name

    def test_manifest_and_empty_doc(self, spark, tmp_path):
        out = str(tmp_path / "tb")
        df = spark.createDataFrame(
            [(1, [5, 6]), (2, []), (3, None)],
            "doc_id bigint, token_ids array<int>",
        )
        man = write_token_shards(df, out, key="doc_id", n_shards=1)
        assert man == read_tokenbin_manifest(out)
        assert man["total_docs"] == 3
        assert man["total_tokens"] == 2
        register_tokenbin_source(spark)
        back = {
            r["ordinal"]: r["token_ids"]
            for r in spark.read.format("tokenbin").load(out).collect()
        }
        assert sorted(len(v) for v in back.values()) == [0, 0, 2]

    def test_out_of_range_raises(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, [70000])], "doc_id bigint, token_ids array<int>"
        )
        with pytest.raises(Exception, match="out of range"):
            write_token_shards(
                df, str(tmp_path / "x"), key="doc_id", n_shards=1
            )

    def test_int32_dtype(self, spark, tmp_path):
        out = str(tmp_path / "tb32")
        df = spark.createDataFrame(
            [(1, [70000, 1 << 20])], "doc_id bigint, token_ids array<int>"
        )
        write_token_shards(df, out, key="doc_id", n_shards=1, dtype="int32")
        dtype, sizes, _ = _read_idx(os.path.join(out, "shard-00000.idx"))
        assert dtype == np.dtype("int32") and sizes.tolist() == [2]
        register_tokenbin_source(spark)
        rows = spark.read.format("tokenbin").load(out).collect()
        assert rows[0]["token_ids"] == [70000, 1 << 20]


class TestSubShardFoldEquivalence:
    """r11: the registered export reports write W sub-shards (W a multiple
    of the logical shard count) and fold the read-back by sub % base.
    Pin the identity that makes that safe: portable_shard(key, W) % base
    == portable_shard(key, base) whenever base | W, and the folded
    per-logical-shard aggregates over a W-sub-shard write equal the
    aggregates over a direct base-shard write."""

    def test_portable_shard_fold_identity(self, spark):
        from pyspark.sql import functions as F

        from mongodb_cdc_delta_spark.ops.webdataset import portable_shard

        df = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
        bad = df.select(
            (
                F.pmod(portable_shard(F.col("doc_id"), 32), F.lit(4))
                != portable_shard(F.col("doc_id"), 4)
            ).alias("diff")
        ).where("diff").count()
        assert bad == 0

    def test_folded_report_equals_base_shard_report(self, spark, tmp_path):
        from pyspark.sql import functions as F

        def report(out, n_shards, base):
            write_token_shards(
                _frame(spark, n=200), out, key="doc_id", n_shards=n_shards
            )
            register_tokenbin_source(spark)
            back = spark.read.format("tokenbin").load(out)
            rows = (
                back.select(
                    F.pmod(
                        F.regexp_extract("shard", r"shard-(\d+)", 1)
                        .cast("int"),
                        F.lit(base),
                    ).alias("shard"),
                    F.size("token_ids").alias("n_tok"),
                )
                .groupBy("shard")
                .agg(
                    F.count("*").alias("n_docs"),
                    F.sum("n_tok").alias("n_tokens"),
                )
                .collect()
            )
            return sorted((r["shard"], r["n_docs"], r["n_tokens"]) for r in rows)

        direct = report(str(tmp_path / "base4"), n_shards=4, base=4)
        folded = report(str(tmp_path / "sub16"), n_shards=16, base=4)
        assert direct == folded
