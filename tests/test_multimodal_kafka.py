"""Multimodal resize plumbing + Kafka source option contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.ops.multimodal import (
    as_media_table,
    resize_media,
    resize_stub,
)
from mongodb_cdc_delta_spark.queries import load
from mongodb_cdc_delta_spark.streaming import CDCStreamPipeline


class TestResize:
    def test_stub_shapes(self):
        assert len(resize_stub(b"abc", 4, 4)) == 16
        assert len(resize_stub(b"x" * 1000, 4, 4)) == 16
        assert resize_stub(b"ab", 2, 2) == b"abab"

    def test_resize_media_plumbing(self, spark):
        media = as_media_table(
            load(spark, "/root/testdata/sf0.001", "documents").limit(20)
        )
        out = resize_media(media, width=8, height=8)
        assert out.schema == media.schema  # metadata columns preserved
        rows = out.select(
            F.octet_length("payload").alias("n"), "width", "height", "n_bytes"
        ).collect()
        assert all(r.n == 64 and r.width == 8 and r.n_bytes == 64 for r in rows)


class TestKafkaOptions:
    def test_reference_consumer_semantics(self, spark, tmp_path):
        pipe = CDCStreamPipeline(spark, str(tmp_path / "lake"))
        opts = pipe.kafka_options("broker1:9092,broker2:9092")
        # reference event_consumer.py:58-67 + config.py:18/21
        assert opts["subscribePattern"] == "mongodb.*"
        assert opts["kafka.isolation.level"] == "read_committed"
        assert opts["maxOffsetsPerTrigger"] == "2000"
        assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
        assert opts["failOnDataLoss"] == "false"

    def test_overrides(self, spark, tmp_path):
        pipe = CDCStreamPipeline(
            spark, str(tmp_path / "lake"), max_events_per_trigger=500
        )
        opts = pipe.kafka_options(
            "b:9092", subscribe_pattern="cdc.*", starting_offsets="latest"
        )
        assert opts["subscribePattern"] == "cdc.*"
        assert opts["startingOffsets"] == "latest"
        assert opts["maxOffsetsPerTrigger"] == "500"


class TestPerceptualHash:
    def test_kernel_properties(self):
        import numpy as np

        from mongodb_cdc_delta_spark.ops.multimodal import (
            _dct_matrix,
            phash_batch,
        )

        # orthonormal basis: D @ D.T == I
        d = _dct_matrix()
        assert np.allclose(d @ d.T, np.eye(32), atol=1e-10)

        a = b"payload with some variety 0123456789 abcdefghij" * 5
        near = bytearray(a)
        near[3] ^= 0x01  # one-bit image perturbation
        far = b"completely different content 9876543210!!!" * 6
        h = phash_batch(np.array([a, a, bytes(near), far], dtype=object))
        assert h[0] == h[1]  # deterministic
        ham_near = bin(int(h[0]) ^ int(h[2])).count("1")
        ham_far = bin(int(h[0]) ^ int(h[3])).count("1")
        assert ham_near <= 6  # robust to tiny perturbation
        assert ham_far > 6  # separates unrelated content
        assert all(0 <= x < (1 << 63) for x in h)

    def test_pairs_include_exact_dups(self, spark):
        from mongodb_cdc_delta_spark.ops.multimodal import (
            as_media_table,
            phash_media,
        )
        from mongodb_cdc_delta_spark.queries import all_queries

        # exact-duplicate payloads must land at Hamming 0 in the pair list
        docs = load(spark, "/root/testdata/sf0.001", "documents")
        dup_texts = [
            r["text"]
            for r in docs.groupBy("text")
            .count()
            .where(F.col("count") > 1)
            .select("text")
            .limit(1)
            .collect()
        ]
        pairs = all_queries()["multimodal_phash_pairs"].fn(
            spark, "/root/testdata/sf0.001"
        )
        got = {(r.doc_a, r.doc_b): r.hamming for r in pairs.collect()}
        if dup_texts:  # corpus has at least one exact dup at this sf
            dup_ids = sorted(
                r.doc_id
                for r in docs.where(F.col("text") == dup_texts[0])
                .select("doc_id")
                .collect()
            )
            assert got[(dup_ids[0], dup_ids[1])] == 0
        # hashes are 63-bit non-negative longs
        fps = phash_media(as_media_table(docs.limit(50))).collect()
        assert all(r.phash >= 0 for r in fps)
