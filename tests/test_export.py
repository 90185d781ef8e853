"""Sharded JSONL export: determinism, manifest accuracy, roundtrip."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.ops.export import (
    export_sharded_jsonl,
    read_manifest,
)
from mongodb_cdc_delta_spark.queries import load

SF = "/root/testdata/sf0.001"


class TestShardedExport:
    def test_roundtrip_and_manifest(self, spark, tmp_path):
        docs = load(spark, SF, "documents").select("doc_id", "text", "lang")
        out = str(tmp_path / "corpus")
        manifest = export_sharded_jsonl(docs, out, key="doc_id", n_shards=4)

        # manifest row counts sum to the corpus
        n = docs.count()
        assert sum(m["rows"] for m in manifest.values()) == n
        disk = read_manifest(out)
        assert disk["total_rows"] == n
        assert disk["n_shards"] == 4

        # roundtrip: reading the shards back recovers every row exactly
        back = spark.read.json(out).select("doc_id", "text", "lang")
        assert back.count() == n
        assert (
            docs.exceptAll(back).count() == 0
            and back.exceptAll(docs).count() == 0
        )

        # one output file per shard directory (task-per-shard layout)
        for d in glob.glob(os.path.join(out, "shard=*")):
            files = [
                f for f in os.listdir(d)
                if f.startswith("part-") and f.endswith(".json")
            ]
            assert len(files) == 1, d

    def test_deterministic_across_runs(self, spark, tmp_path):
        docs = load(spark, SF, "documents").select("doc_id", "text")
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        ma = export_sharded_jsonl(docs, a, key="doc_id", n_shards=3)
        mb = export_sharded_jsonl(docs, b, key="doc_id", n_shards=3)
        assert ma == mb
        # shard files are byte-identical between runs
        for d in sorted(os.listdir(a)):
            if not d.startswith("shard="):
                continue
            fa = sorted(glob.glob(os.path.join(a, d, "part-*.json")))
            fb = sorted(glob.glob(os.path.join(b, d, "part-*.json")))
            assert len(fa) == len(fb) == 1
            with open(fa[0], "rb") as f1, open(fb[0], "rb") as f2:
                assert f1.read() == f2.read()

    def test_read_back_validates_manifest(self, spark, tmp_path):
        docs = load(spark, SF, "documents").select("doc_id", "text")
        out = str(tmp_path / "c")
        export_sharded_jsonl(docs, out, key="doc_id", n_shards=2)
        from mongodb_cdc_delta_spark.ops.export import read_sharded_jsonl

        back = read_sharded_jsonl(spark, out)
        assert back.count() == docs.count()

        # corrupt: delete one shard directory -> validation must raise
        import shutil

        shard_dir = sorted(
            d for d in os.listdir(out) if d.startswith("shard=")
        )[0]
        shutil.rmtree(os.path.join(out, shard_dir))
        import pytest

        with pytest.raises(ValueError, match="manifest"):
            read_sharded_jsonl(spark, out)


class TestCompressionRatio:
    def test_separates_repetition_and_is_deterministic(self, spark):
        from mongodb_cdc_delta_spark.ops.textstats import compression_ratios

        df = spark.createDataFrame(
            [
                (1, "spam " * 200),
                (2, " ".join(f"w{i}x{i * 7 % 97}" for i in range(200))),
                (3, ""),
            ],
            "doc_id long, text string",
        )
        a = {r.doc_id: r for r in compression_ratios(df).collect()}
        b = {r.doc_id: r for r in compression_ratios(df).collect()}
        assert a[1].ratio < a[2].ratio / 3  # repetition compresses far better
        assert a[3].ratio == 1.0 and a[3].n_bytes == 0  # empty-doc guard
        assert {k: v.ratio for k, v in a.items()} == {
            k: v.ratio for k, v in b.items()
        }  # deterministic across runs
        assert all(r.comp_bytes > 0 for r in a.values())
