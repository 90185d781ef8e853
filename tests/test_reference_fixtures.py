"""Replays of the reference's own test fixtures (FIXTURES.md, distilled
from tests/fixtures/sample_documents.json and
schema_evolution_samples.json): the canonical `users` shape with BSON
wrapper types, and the five schema-evolution sample groups."""

from __future__ import annotations

import json
import time

import pytest

from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.cdc.pipeline import CDCIngestor

NOW_MS = int(time.time() * 1000)


# r11 fast-tier: moved to the slow (full-battery) lane in r11 so the default fast tier stays <15 min; this surface remains covered by the full battery and by the oracle-parity/plan-gate suites that stay in the fast lane
pytestmark = pytest.mark.slow

def envelope(doc, coll="users", op="c"):
    payload = {
        "op": op,
        "ts_ms": NOW_MS,
        "source": {"db": "app", "collection": coll},
        "after": json.dumps(doc),
    }
    return json.dumps({"payload": payload})


def ingest(spark, tmp_path, docs, coll="users", batch_id=0):
    ing = CDCIngestor(spark, str(tmp_path / "lake"))
    raw = spark.createDataFrame(
        [(envelope(d, coll),) for d in docs], "value string"
    )
    ing.ingest_batch(raw, batch_id=batch_id)
    return ing


class TestUsersCanonical:
    """FIXTURES.md §1: nested address.coordinates, tags, BSON ObjectId ids
    and datetime timestamps — final lake types must match the reference's
    contract schema (test_delta_schema.py:16-31)."""

    def docs(self):
        base = 1706054400000
        people = [
            ("60d5ec49f1b2c8b1f8e4c1a1", "Alice Johnson", 28, "New York", True),
            ("60d5ec49f1b2c8b1f8e4c1a2", "Bob Smith", 35, "San Francisco", True),
            ("60d5ec49f1b2c8b1f8e4c1a3", "Charlie Davis", 42, "Seattle", False),
        ]
        return [
            {
                "_id": {"$oid": oid},
                "name": name,
                "email": f"{name.split()[0].lower()}@example.com",
                "age": age,
                "address": {
                    "street": "1 Main St",
                    "city": city,
                    "state": "XX",
                    "zip": "00000",
                    "coordinates": {"lat": 40.7 + i, "lon": -74.0 - i},
                },
                "tags": ["customer", "active"] if active else [],
                "is_active": active,
                "created_at": {"$date": {"$numberLong": str(base + i)}},
                "updated_at": {"$date": {"$numberLong": str(base + 1000 + i)}},
            }
            for i, (oid, name, age, city, active) in enumerate(people)
        ]

    def test_schema_and_values(self, spark, tmp_path):
        ing = ingest(spark, tmp_path, self.docs())
        df = ing.table("app_users").read()
        types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        # reference contract schema (FIXTURES.md §1)
        assert types["_id"] == "string"
        assert types["age"] == "bigint"
        assert types["is_active"] == "boolean"
        assert types["tags"] == "array<string>"
        assert types["created_at"] == "timestamp"  # BSON datetime, not long
        assert types["updated_at"] == "timestamp"
        assert types["address"].startswith("struct<")
        assert "coordinates:struct<lat:double,lon:double>" in types["address"]

        alice = df.where(F.col("name") == "Alice Johnson").first()
        assert alice["_id"] == "60d5ec49f1b2c8b1f8e4c1a1"
        assert alice["address"]["coordinates"]["lat"] == 40.7
        assert alice["created_at"].year >= 2024
        # the reference's flagship user flow (README.md:73-78)
        assert (
            df.where("name = 'Alice Johnson' AND is_active").count() == 1
        )


class TestSchemaEvolutionSamples:
    """FIXTURES.md §3: the five sample groups."""

    def test_nested_three_levels(self, spark, tmp_path):
        docs = [
            {
                "_id": "n1",
                "user": {
                    "profile": {
                        "bio": {"summary": "dev", "skills": ["py", "sql"]}
                    },
                    "settings": {
                        "notifications": {"email": True, "sms": False, "push": True}
                    },
                },
            }
        ]
        ing = ingest(spark, tmp_path, docs)
        row = ing.table("app_users").read().first()
        assert row["user"]["profile"]["bio"]["skills"] == ["py", "sql"]
        assert row["user"]["settings"]["notifications"]["sms"] is False

    def test_missing_fields_surface_as_nulls(self, spark, tmp_path):
        docs = [
            {"_id": "m1", "name": "a", "email": "a@x.com", "age": 30, "phone": "1"},
            {"_id": "m2", "name": "b"},  # omits email/age/phone
        ]
        ing = ingest(spark, tmp_path, docs)
        m2 = ing.table("app_users").read().where("_id = 'm2'").first()
        assert m2["email"] is None and m2["age"] is None and m2["phone"] is None

    def test_type_variations_widen(self, spark, tmp_path):
        # value: long + string + double → string (AUTO: conflict fallback);
        # price: double + long → double
        docs_a = [{"_id": "t1", "value": 42, "price": 9.99}]
        docs_b = [{"_id": "t2", "value": "42", "price": 7}]
        docs_c = [{"_id": "t3", "value": 42.5, "price": 5}]
        ing = ingest(spark, tmp_path, docs_a, batch_id=0)
        raw_b = spark.createDataFrame(
            [(envelope(d),) for d in docs_b], "value string"
        )
        ing.ingest_batch(raw_b, batch_id=1)
        raw_c = spark.createDataFrame(
            [(envelope(d),) for d in docs_c], "value string"
        )
        ing.ingest_batch(raw_c, batch_id=2)
        df = ing.table("app_users").read()
        types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        assert types["value"] == "string"
        assert types["price"] == "double"
        vals = {r["_id"]: r["value"] for r in df.collect()}
        assert vals == {"t1": "42", "t2": "42", "t3": "42.5"}

    def test_array_variations_including_empty(self, spark, tmp_path):
        docs = [
            {"_id": "a1", "tags": ["x", "y"], "items": [{"id": 1, "name": "p"}]},
            {"_id": "a2", "tags": [], "items": []},
        ]
        ing = ingest(spark, tmp_path, docs)
        df = ing.table("app_users").read()
        rows = {r["_id"]: r for r in df.collect()}
        assert rows["a1"]["items"][0]["name"] == "p"
        assert rows["a2"]["tags"] == [] and rows["a2"]["items"] == []

    def test_four_version_sequence(self, spark, tmp_path):
        versions = [
            {"_id": "v1", "version": 1, "name": "n", "email": "e@x.com"},
            {"_id": "v2", "version": 2, "name": "n", "email": "e@x.com",
             "phone": "555"},
            {"_id": "v3", "version": 3, "name": "n", "email": "e@x.com",
             "phone": "555",
             "address": {"street": "s", "city": "c", "zip": "z"}},
            {"_id": "v4", "version": 4, "name": "n", "email": "e@x.com",
             "phone": "555",
             "address": {"street": "s", "city": "c", "zip": "z"},
             "roles": ["admin", "user"]},
        ]
        ing = None
        for i, doc in enumerate(versions):
            if ing is None:
                ing = ingest(spark, tmp_path, [doc], batch_id=i)
            else:
                raw = spark.createDataFrame(
                    [(envelope(doc),)], "value string"
                )
                ing.ingest_batch(raw, batch_id=i)
        df = ing.table("app_users").read()
        names = {f.name for f in df.schema.fields}
        assert {"phone", "address", "roles"} <= names
        v1 = df.where("_id = 'v1'").first()
        assert v1["phone"] is None and v1["address"] is None and v1["roles"] is None
        v4 = df.where("_id = 'v4'").first()
        assert v4["roles"] == ["admin", "user"]
        assert v4["address"]["city"] == "c"


class TestSchemalessEdges:
    """SURVEY §7.3 watch list (reference bson_to_delta.py:130-147): empty
    arrays default to array<string>; empty structs cannot land in parquet
    and fall back to their JSON string; all-null fields become string."""

    def test_empty_array_empty_struct_all_null(self, spark, tmp_path):
        docs = [
            {"_id": "x1", "tags": [], "meta": {}, "nothing": None},
            {"_id": "x2", "tags": [], "meta": {}, "nothing": None},
        ]
        ing = ingest(spark, tmp_path, docs)
        df = ing.table("app_users").read()
        types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        assert types["tags"] == "array<string>"
        assert types["meta"] == "string"  # '{}' preserved, not dropped
        assert types["nothing"] == "string"
        r = df.where("_id = 'x1'").first()
        assert r["tags"] == [] and r["meta"] == "{}" and r["nothing"] is None
