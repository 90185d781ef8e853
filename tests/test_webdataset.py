"""WebDataset tar-shard writer/reader (ops/webdataset.py).

Contracts pinned here:
- round-trip: write → format("webdataset") read recovers every member
  byte-for-byte, grouped by key with ext = everything after the first dot
- determinism: two writes of the same frame produce byte-identical tars
  (zeroed tar metadata + key-ordered members + hash shard assignment)
- parallelism: one input partition per shard
- manifest: totals match rows, sha256 matches the bytes on disk
"""

from __future__ import annotations

import hashlib
import os
import tarfile

import pytest

from mongodb_cdc_delta_spark.ops.webdataset import (
    WebDatasetDataSource,
    portable_shard,
    read_wds_manifest,
    register_webdataset_source,
    write_webdataset_shards,
)


def _frame(spark, n=40):
    rows = [
        (i, f"text body {i}", b"\x89BIN" + bytes([i % 256]) * 3)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, img binary")


class TestWriteRead:
    def test_roundtrip_bytes_exact(self, spark, tmp_path):
        out = str(tmp_path / "wds")
        df = _frame(spark)
        man = write_webdataset_shards(
            df, out, key="doc_id",
            members={"text": "txt", "img": "png"}, n_shards=4,
        )
        assert man["total_keys"] == 40
        register_webdataset_source(spark)
        back = spark.read.format("webdataset").load(out)
        got = {r["key"]: r["members"] for r in back.collect()}
        assert len(got) == 40
        for i in range(40):
            k = f"{i:012d}"
            assert got[k]["txt"] == f"text body {i}".encode()
            assert got[k]["png"] == b"\x89BIN" + bytes([i % 256]) * 3

    def test_one_partition_per_shard(self, spark, tmp_path):
        out = str(tmp_path / "wds")
        write_webdataset_shards(
            _frame(spark), out, key="doc_id",
            members={"text": "txt"}, n_shards=4,
        )
        n_tars = len([n for n in os.listdir(out) if n.endswith(".tar")])
        register_webdataset_source(spark)
        back = spark.read.format("webdataset").load(out)
        assert back.rdd.getNumPartitions() == n_tars

    def test_deterministic_bytes(self, spark, tmp_path):
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        for out in (a, b):
            write_webdataset_shards(
                _frame(spark), out, key="doc_id",
                members={"text": "txt", "img": "png"}, n_shards=4,
            )
        tars = sorted(n for n in os.listdir(a) if n.endswith(".tar"))
        assert tars == sorted(n for n in os.listdir(b) if n.endswith(".tar"))
        for t in tars:
            with open(os.path.join(a, t), "rb") as fa, open(
                os.path.join(b, t), "rb"
            ) as fb:
                assert fa.read() == fb.read(), t

    def test_manifest_matches_disk(self, spark, tmp_path):
        out = str(tmp_path / "wds")
        man = write_webdataset_shards(
            _frame(spark), out, key="doc_id",
            members={"text": "txt"}, n_shards=4,
        )
        assert man == read_wds_manifest(out)
        for sid, s in man["shards"].items():
            p = os.path.join(out, f"shard-{int(sid):05d}.tar")
            with open(p, "rb") as f:
                assert hashlib.sha256(f.read()).hexdigest() == s["sha256"]
            assert os.path.getsize(p) == s["tar_bytes"]
        assert man["total_keys"] == sum(
            s["n_keys"] for s in man["shards"].values()
        )

    def test_shard_assignment_is_portable_hash(self, spark, tmp_path):
        out = str(tmp_path / "wds")
        df = _frame(spark)
        write_webdataset_shards(
            df, out, key="doc_id", members={"text": "txt"}, n_shards=4,
        )
        from pyspark.sql import functions as F

        expect = {
            r["doc_id"]: r["s"]
            for r in df.select(
                "doc_id", portable_shard(F.col("doc_id"), 4).alias("s")
            ).collect()
        }
        register_webdataset_source(spark)
        for r in spark.read.format("webdataset").load(out).collect():
            sid = int(r["shard"].split("-")[1].split(".")[0])
            assert expect[int(r["key"])] == sid

    def test_ext_is_after_first_dot(self, spark, tmp_path):
        # WebDataset rule: "sample.seg.json" → key "sample", ext "seg.json"
        out = str(tmp_path / "t")
        os.makedirs(out)
        with tarfile.open(os.path.join(out, "shard-00000.tar"), "w") as tf:
            for name, payload in [
                ("sample.seg.json", b"{}"),
                ("sample.txt", b"hi"),
                ("other.txt", b"yo"),
            ]:
                ti = tarfile.TarInfo(name)
                ti.size = len(payload)
                import io

                tf.addfile(ti, io.BytesIO(payload))
        register_webdataset_source(spark)
        rows = {
            r["key"]: r["members"]
            for r in spark.read.format("webdataset").load(out).collect()
        }
        assert rows["sample"] == {"seg.json": b"{}", "txt": b"hi"}
        assert rows["other"] == {"txt": b"yo"}

    def test_null_member_skipped(self, spark, tmp_path):
        out = str(tmp_path / "wds")
        df = spark.createDataFrame(
            [(1, "a", b"x"), (2, None, b"y")],
            "doc_id bigint, text string, img binary",
        )
        man = write_webdataset_shards(
            df, out, key="doc_id",
            members={"text": "txt", "img": "png"}, n_shards=1,
        )
        assert sum(s["n_members"] for s in man["shards"].values()) == 3
        register_webdataset_source(spark)
        got = {
            r["key"]: r["members"]
            for r in spark.read.format("webdataset").load(out).collect()
        }
        assert "txt" not in got[f"{2:012d}"]
        assert got[f"{2:012d}"]["png"] == b"y"

    def test_errors(self, spark, tmp_path):
        df = _frame(spark)
        with pytest.raises(ValueError, match="at least one"):
            write_webdataset_shards(df, str(tmp_path), "doc_id", {})
        with pytest.raises(ValueError, match="not in frame"):
            write_webdataset_shards(
                df, str(tmp_path), "doc_id", {"nope": "txt"}
            )
        register_webdataset_source(spark)
        with pytest.raises(Exception):
            spark.read.format("webdataset").load(
                str(tmp_path / "missing")
            ).collect()

    def test_datasource_name(self):
        assert WebDatasetDataSource.name() == "webdataset"
