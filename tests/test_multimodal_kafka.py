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
