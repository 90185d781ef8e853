"""Salted skew join equivalence, S3A config mapping, table properties."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.ops.skew import salted_join
from mongodb_cdc_delta_spark.sinks import LakeTable
from mongodb_cdc_delta_spark.sinks.s3 import configure_s3


class TestSaltedJoin:
    def test_equivalent_to_plain_join_under_skew(self, spark):
        # 90% of fact rows share one hot key
        fact = spark.createDataFrame(
            [(1 if i % 10 else i % 5, f"v{i}") for i in range(1000)],
            "k int, v string",
        )
        dim = spark.createDataFrame(
            [(i, f"dim{i}") for i in range(5)], "k int, name string"
        )
        plain = fact.join(dim, "k").groupBy("k", "name").agg(
            F.count("*").alias("n")
        )
        salted = salted_join(fact, dim, "k", n_salts=8).groupBy(
            "k", "name"
        ).agg(F.count("*").alias("n"))
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        )

    def test_left_join_keeps_unmatched(self, spark):
        fact = spark.createDataFrame([(1, "a"), (99, "b")], "k int, v string")
        dim = spark.createDataFrame([(1, "d1")], "k int, name string")
        out = salted_join(fact, dim, "k", n_salts=4, how="left").collect()
        rows = {r.k: r.name for r in out}
        assert rows == {1: "d1", 99: None}
        assert len(out) == 2  # replication must not duplicate fact rows


class TestS3Config:
    def test_minio_style_config(self, spark):
        applied = configure_s3(
            spark,
            endpoint="http://minio:9000",
            access_key="ak",
            secret_key="sk",
        )
        assert applied["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
        assert applied["spark.hadoop.fs.s3a.path.style.access"] == "true"
        # http endpoint → ssl off (MinIO local stack)
        assert applied["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "false"
        assert applied["spark.hadoop.fs.s3a.secret.key"] == "***"  # redacted
        assert spark.conf.get("spark.hadoop.fs.s3a.access.key") == "ak"


class TestTableProperties:
    def test_properties_accumulate_and_override(self, spark, tmp_path):
        t = LakeTable(spark, str(tmp_path / "t"))
        t.append(spark.createDataFrame([(1,)], "id long"))
        t.set_properties({"schema.version": "1", "target.file.size": "128m"})
        t.set_properties({"schema.version": "2"})
        props = t.properties()
        assert props == {"schema.version": "2", "target.file.size": "128m"}
        # metadata-only commits never disturb data or time travel
        assert t.read().count() == 1
        assert t.read(version_as_of=0).count() == 1
        assert t.history()[0].operation == "SET_TBLPROPERTIES"
