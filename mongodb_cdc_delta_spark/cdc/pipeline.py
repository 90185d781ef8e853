"""Debezium CDC event pipeline: raw Kafka value → per-collection lake tables.

Re-expresses the reference's delta-writer data plane as one declarative
DataFrame transformation per micro-batch (reference lifecycle §3.1:
event_handler.py parse/classify/extract, bson_to_delta.py normalization,
batch_processor.py routing, delta_writer.py write):

- envelope parse: single typed ``from_json`` for scalars + ``get_json_object``
  for the document body, which uniformly handles Debezium-Mongo's
  string-encoded ``after`` and the inline-object fixture shape
  (reference tests/contract/test_debezium_events.py:20-56)
- op classify c/r→insert, u→update, d→delete, unknown→dropped
  (reference event_handler.py:102-124)
- document extract: after for insert/update, before-else-key for delete
  (reference event_handler.py:126-166)
- Mongo extended-JSON normalization ($oid/$date/$numberX/$binary) as
  vectorized regexp rewrites on the JSON text — the whole-stage-codegen
  equivalent of the reference's per-value Python recursion
  (reference bson_to_delta.py:24-84)
- CDC metadata columns (reference event_handler.py:168-214,
  schema_inferrer.py:463-501)
- dirty-data / oversize / stale policies → DLQ with the reference's reason
  enum (reference dlq_writer.py:24-34, spec FR-015/FR-024/FR-056)
- per-collection schema inference via ``schema_of_variant_agg`` (one JVM
  aggregate, no Python loop — replaces schema_inferrer.py:62-125), widened
  against the live table schema (schema/types.py), then an idempotent
  transactional append (sinks/table.py)

Scale notes: everything before the write is one shuffle-free narrow pipeline
over the Kafka batch; the only driver-side loop is over *distinct
collections* in the batch (bounded by topic count, not rows). Schema
inference is a JVM aggregate per collection. At 1000 executors this is scan →
filter → append, exactly what the 10k events/s/collection target
(BASELINE.md) wants.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..schema import MergeMode, cast_to_schema, merge_schemas
from ..sinks.table import LakeTable

MAX_DOCUMENT_BYTES = 16 * 1024 * 1024  # MongoDB's 16 MB document cap
STALE_DAYS_DEFAULT = 7  # spec FR-024 (spec.md:302-305)
#: per-collection append task sizing: one write task per ~this many clean
#: rows (see _ingest_collection — the routed-lane headroom fix, r10)
ROWS_PER_WRITE_TASK = 20_000

#: CDC metadata columns appended to every table
#: (reference schema_inferrer.py:463-501, event_handler.py:200-213)
CDC_META_COLUMNS = [
    "_cdc_timestamp",
    "_cdc_operation",
    "_ingestion_timestamp",
    "_kafka_offset",
    "_kafka_partition",
    "_kafka_topic",
    "_ingestion_date",
    "_source_database",
    "_source_collection",
]


class DLQReason(str, Enum):
    """Verbatim from reference dlq_writer.py:24-34, plus the spec'd
    stale-event policy (FR-024)."""

    MAX_RETRIES_EXCEEDED = "max_retries_exceeded"
    CORRUPTED_DATA = "corrupted_data"
    SCHEMA_VALIDATION_FAILED = "schema_validation_failed"
    OVERSIZED_DOCUMENT = "oversized_document"
    INVALID_BSON = "invalid_bson"
    TRANSFORMATION_ERROR = "transformation_error"
    MINIO_ERROR = "minio_error"
    DELTA_WRITE_ERROR = "delta_write_error"
    UNHANDLED_EXCEPTION = "unhandled_exception"
    STALE_EVENT = "stale_event"


DLQ_SCHEMA = StructType(
    [
        StructField("original_event", StringType(), True),
        StructField("reason", StringType(), True),
        StructField("error_message", StringType(), True),
        StructField("source_topic", StringType(), True),
        StructField("partition", LongType(), True),
        StructField("offset", LongType(), True),
        StructField("retry_count", LongType(), True),
        StructField("_ingestion_timestamp", TimestampType(), True),
    ]
)

# typed scalar extraction — one parse; after/before handled separately
ENVELOPE_SCHEMA = StructType(
    [
        StructField(
            "payload",
            StructType(
                [
                    StructField("op", StringType(), True),
                    StructField("ts_ms", LongType(), True),
                    StructField(
                        "source",
                        StructType(
                            [
                                StructField("db", StringType(), True),
                                StructField("collection", StringType(), True),
                                StructField("snapshot", StringType(), True),
                                StructField("ts_ms", LongType(), True),
                            ]
                        ),
                        True,
                    ),
                ]
            ),
            True,
        )
    ]
)


def normalize_extended_json(col):
    """Rewrite MongoDB extended-JSON wrappers to plain JSON scalars, as
    vectorized regexes over the document text (reference bson_to_delta.py:
    24-84 does this per-value in Python: ObjectId→hex string, Decimal128→
    decimal, Binary→base64 string, $date→timestamp millis)."""
    c = col
    # {"$oid": "24-hex"} → "24-hex"
    c = F.regexp_replace(
        c, r'\{\s*"\$oid"\s*:\s*("[0-9a-fA-F]{24}")\s*\}', r"$1"
    )
    # {"$date": {"$numberLong": "123"}} → 123 (epoch millis)
    c = F.regexp_replace(
        c,
        r'\{\s*"\$date"\s*:\s*\{\s*"\$numberLong"\s*:\s*"(-?\d+)"\s*\}\s*\}',
        r"$1",
    )
    # {"$date": "ISO8601"} → "ISO8601"
    c = F.regexp_replace(c, r'\{\s*"\$date"\s*:\s*("[^"]*")\s*\}', r"$1")
    # {"$date": 123} → 123 (legacy bare epoch-millis form; refine_bson_markers
    # already types it (timestamp, long))
    c = F.regexp_replace(c, r'\{\s*"\$date"\s*:\s*(-?\d+)\s*\}', r"$1")
    # {"$numberLong|Int": "123"} → 123
    c = F.regexp_replace(
        c, r'\{\s*"\$number(?:Long|Int)"\s*:\s*"(-?\d+)"\s*\}', r"$1"
    )
    # {"$numberDouble|Decimal": "1.5"} → 1.5 — the exponent sign group
    # matters: "1.5e-3" must unwrap too, or from_json sees an object where
    # the parse schema expects a double and silently nulls the field.
    # NaN/±Infinity pass through unquoted: from_json's Jackson parser
    # accepts non-numeric doubles (the inference path never sees them —
    # it reads the RAW wrapper text, which is valid JSON).
    c = F.regexp_replace(
        c,
        r'\{\s*"\$number(?:Double|Decimal)"\s*:\s*'
        r'"(-?(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][+-]?\d+)?|NaN|-?Infinity)"\s*\}',
        r"$1",
    )
    # {"$binary": {"base64": "...", "subType": "xx"}} → base64 string
    c = F.regexp_replace(
        c,
        r'\{\s*"\$binary"\s*:\s*\{\s*"base64"\s*:\s*("[^"]*")\s*,\s*"subType"\s*:\s*"[^"]*"\s*\}\s*\}',
        r"$1",
    )
    # {"$uuid": "xxxx-..."} → "xxxx-..." (canonical string form)
    c = F.regexp_replace(c, r'\{\s*"\$uuid"\s*:\s*("[0-9a-fA-F-]{36}")\s*\}', r"$1")
    # {"$timestamp": {"t": secs, "i": ordinal}} → secs (BSON internal
    # timestamp; the reference's unknown-type fallback would stringify it —
    # epoch seconds preserve orderability instead)
    c = F.regexp_replace(
        c,
        r'\{\s*"\$timestamp"\s*:\s*\{\s*"t"\s*:\s*(\d+)\s*,\s*"i"\s*:\s*\d+\s*\}\s*\}',
        r"$1",
    )
    return c


def _ensure_kafka_columns(raw_df: DataFrame) -> DataFrame:
    """Accept either a Kafka source frame (topic/partition/offset present) or
    a bare `value` frame (file source in tests); normalize value to string.

    Offset-less sources get synthetic per-partition offsets (monotonic in
    read order) so intra-batch per-key ordering — which Kafka guarantees
    via offsets — holds for file replay too (current-state materialization
    and `current_state` order on `_kafka_offset`)."""
    df = raw_df
    if "value" not in df.columns:
        raise ValueError("raw event frame must have a `value` column")
    df = df.withColumn("value", F.col("value").cast("string"))
    if "topic" not in df.columns:
        df = df.withColumn("topic", F.lit(None).cast("string"))
    if "partition" not in df.columns:
        df = df.withColumn("partition", F.spark_partition_id())
    if "offset" not in df.columns:
        df = df.withColumn("offset", F.monotonically_increasing_id())
    return df


def parse_events(
    raw_df: DataFrame,
    now=None,
    stale_days: int = STALE_DAYS_DEFAULT,
    max_doc_bytes: int = MAX_DOCUMENT_BYTES,
) -> tuple[DataFrame, DataFrame]:
    """Split a raw event batch into (clean, dlq).

    clean: db, collection, doc (normalized JSON string) + CDC_META_COLUMNS.
    dlq:   DLQ_SCHEMA rows (corrupted / oversized / stale).
    Unknown ops are dropped, matching the reference (event_handler.py:121-124
    returns None → skip, not DLQ).
    """
    _parsed, clean, dlq = _parse_events_full(
        raw_df, now=now, stale_days=stale_days, max_doc_bytes=max_doc_bytes
    )
    return clean, dlq


def _parse_events_full(
    raw_df: DataFrame,
    now=None,
    stale_days: int = STALE_DAYS_DEFAULT,
    max_doc_bytes: int = MAX_DOCUMENT_BYTES,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """``parse_events`` plus the shared parsed parent frame.

    ``ingest_batch`` persists the PARENT so the clean branch (inference +
    append) and the dlq branch (count + append) both read one cached parse —
    caching only ``clean`` would make ``dlq.count()`` re-parse every raw
    envelope a second time (measured ~15% of batch wall time).

    Optional provenance channel: when the raw frame carries ``__src_db`` /
    ``__src_coll`` columns (the snapshot bulk loader knows every line's
    collection from file discovery), they back-fill db/collection for rows
    whose ENVELOPE failed to parse — so a corrupt line dead-letters
    attributed to its collection instead of the (null, null) residue
    bucket (r9 verdict #6)."""
    now_expr = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
    df = _ensure_kafka_columns(raw_df)

    # ONE JSON parse per event: the envelope lands in a variant column and
    # every field is a cheap variant extraction (the previous from_json +
    # 3x get_json_object formulation re-parsed the full event text 4x).
    df = df.withColumn("__v", F.try_parse_json(F.col("value")))
    v = F.col("__v")

    def vstr(path):
        return F.try_variant_get(v, path, "string")

    def vlong(path):
        return F.try_variant_get(v, path, "long")

    def vdoc(path):
        """Document body as a JSON string: Debezium-Mongo string-encodes
        after/before (variant string → cast), fixture shapes inline the
        object (variant object → to_json); one coalesce covers both."""
        node = F.try_variant_get(v, path, "variant")
        return F.coalesce(
            F.try_variant_get(v, path, "string"),
            F.when(node.isNotNull(), F.to_json(node)),
        )

    op_raw = vstr("$.payload.op")
    operation = (
        F.when(op_raw.isin("c", "r"), F.lit("insert"))
        .when(op_raw == "u", F.lit("update"))
        .when(op_raw == "d", F.lit("delete"))
    )
    after = vdoc("$.payload.after")
    before = vdoc("$.payload.before")
    # key-only delete doc: Debezium string-encodes payload._id (the string
    # CONTENT is raw JSON, quotes included), so the string cast is used
    # verbatim; non-string variants (inline numbers/objects) re-serialize
    key_json = F.coalesce(
        F.try_variant_get(v, "$.payload._id", "string"),
        F.to_json(F.try_variant_get(v, "$.payload._id", "variant")),
    )
    key_doc = F.when(
        key_json.isNotNull(),
        F.concat(F.lit('{"_id": '), key_json, F.lit("}")),
    )
    doc = F.when(
        operation.isin("insert", "update"), after
    ).when(operation == "delete", F.coalesce(before, key_doc))

    cdc_ts = F.timestamp_millis(
        F.coalesce(vlong("$.payload.ts_ms"), vlong("$.payload.source.ts_ms"))
    )

    db_expr = vstr("$.payload.source.db")
    coll_expr = vstr("$.payload.source.collection")
    if "__src_db" in df.columns:
        db_expr = F.coalesce(db_expr, F.col("__src_db"))
    if "__src_coll" in df.columns:
        coll_expr = F.coalesce(coll_expr, F.col("__src_coll"))

    parsed = df.select(
        "value",
        "topic",
        "partition",
        "offset",
        db_expr.alias("db"),
        coll_expr.alias("collection"),
        op_raw.alias("op_raw"),
        operation.alias("_cdc_operation"),
        doc.alias("doc"),
        cdc_ts.alias("_cdc_timestamp"),
    )

    reason = (
        F.when(
            F.length("value") > max_doc_bytes,
            F.lit(DLQReason.OVERSIZED_DOCUMENT.value),
        )
        .when(
            F.col("db").isNull()
            | F.col("collection").isNull()
            | F.col("op_raw").isNull(),
            F.lit(DLQReason.CORRUPTED_DATA.value),
        )
        .when(
            F.col("_cdc_operation").isNotNull() & F.col("doc").isNull(),
            F.lit(DLQReason.CORRUPTED_DATA.value),
        )
        .when(
            F.col("_cdc_timestamp")
            < now_expr - F.make_dt_interval(F.lit(stale_days)),
            F.lit(DLQReason.STALE_EVENT.value),
        )
    )
    parsed = parsed.withColumn("_dlq_reason", reason)

    # doc stays RAW here: schema inference reads the extended-JSON wrapper
    # markers ($oid/$date/...) to assign real lake types (timestamp, not
    # millis-long); normalization happens at parse time in ingest_batch
    clean = (
        parsed.where(
            F.col("_dlq_reason").isNull() & F.col("_cdc_operation").isNotNull()
        )
        .select(
            "db",
            "collection",
            F.col("doc"),
            "_cdc_timestamp",
            "_cdc_operation",
            now_expr.alias("_ingestion_timestamp"),
            F.col("offset").alias("_kafka_offset"),
            F.col("partition").cast("int").alias("_kafka_partition"),
            F.col("topic").alias("_kafka_topic"),
            F.date_format(now_expr, "yyyy-MM-dd").alias("_ingestion_date"),
            F.col("db").alias("_source_database"),
            F.col("collection").alias("_source_collection"),
        )
    )

    dlq = parsed.where(F.col("_dlq_reason").isNotNull()).select(
        F.col("value").alias("original_event"),
        F.col("_dlq_reason").alias("reason"),
        F.lit(None).cast("string").alias("error_message"),
        F.col("topic").alias("source_topic"),
        F.col("partition").cast("long").alias("partition"),
        F.col("offset").alias("offset"),
        F.lit(0).cast("long").alias("retry_count"),
        now_expr.alias("_ingestion_timestamp"),
    )
    return parsed, clean, dlq


def _decimals_to_double(t):
    """JSON fractional numbers are BSON doubles (reference bson_to_delta.py
    maps double→float64); variant inference yields DECIMAL — normalize.
    Scale-0 decimals included: variant only emits DECIMAL when the literal
    had a decimal point (`-74.0` → decimal(2,0)); pure integers are BIGINT."""
    from pyspark.sql.types import ArrayType, DecimalType, DoubleType

    if isinstance(t, DecimalType):
        return DoubleType()
    if isinstance(t, ArrayType):
        return ArrayType(_decimals_to_double(t.elementType), True)
    if isinstance(t, StructType):
        return StructType(
            [
                StructField(f.name, _decimals_to_double(f.dataType), True)
                for f in t.fields
            ]
        )
    return t


def infer_doc_schema(docs_df: DataFrame, col: str = "doc") -> StructType | None:
    """Batch-level schema inference as one JVM aggregate
    (replaces reference schema_inferrer.py:62-125's per-doc Python fold).
    Returns None when no parseable docs exist."""
    ddl = docs_df.select(
        F.schema_of_variant_agg(F.try_parse_json(F.col(col))).alias("s")
    ).first()[0]
    if ddl is None or not ddl.startswith("OBJECT<"):
        return None
    schema = StructType.fromDDL(ddl.replace("OBJECT<", "STRUCT<"))
    return _decimals_to_double(schema)


def refine_bson_markers(t):
    """Map extended-JSON wrapper structs in a RAW-doc inferred schema to the
    reference's BSON→lake types (bson_to_delta.py:42-84: ObjectId→string,
    datetime→timestamp, Decimal128→numeric, Binary→base64 string).

    Returns (target_type, parse_type): target is the stored type; parse is
    the physical type `normalize_extended_json` leaves in the JSON text
    ($date millis → long parsed then cast to timestamp; $date ISO → string
    that from_json parses into timestamp directly).

    Also resolves the schemaless edge cases (SURVEY §7.3, reference
    bson_to_delta.py:130-147): all-empty arrays (element VOID) →
    array<string>; empty structs → string (parquet rejects zero-field
    structs; the string keeps the '{}' payload); bare VOID → string."""
    from pyspark.sql.types import (
        ArrayType,
        DataType,
        DoubleType,
        NullType,
    )

    if isinstance(t, NullType):
        return StringType(), StringType()
    if isinstance(t, StructType):
        if not t.fields:  # empty struct: parquet can't store it
            return StringType(), StringType()
        names = {f.name for f in t.fields}
        inner = {f.name: f.dataType for f in t.fields}
        if names == {"$oid"} or names == {"$uuid"}:
            return StringType(), StringType()
        if names == {"$date"}:
            v = inner["$date"]
            if isinstance(v, StructType):  # {"$date": {"$numberLong": "..."}}
                return TimestampType(), LongType()
            if isinstance(v, StringType):  # ISO-8601 form
                return TimestampType(), TimestampType()
            return TimestampType(), LongType()  # numeric millis
        if names == {"$numberLong"} or names == {"$numberInt"}:
            return LongType(), LongType()
        if names == {"$numberDouble"} or names == {"$numberDecimal"}:
            return DoubleType(), DoubleType()
        if names == {"$binary"}:
            return StringType(), StringType()
        if names == {"$timestamp"}:
            return LongType(), LongType()
        tgt_fields, parse_fields = [], []
        for f in t.fields:
            tgt, prs = refine_bson_markers(f.dataType)
            tgt_fields.append(StructField(f.name, tgt, True))
            parse_fields.append(StructField(f.name, prs, True))
        return StructType(tgt_fields), StructType(parse_fields)
    if isinstance(t, ArrayType):
        tgt, prs = refine_bson_markers(t.elementType)
        return ArrayType(tgt, True), ArrayType(prs, True)
    return t, t


def millis_cast_rule(col, src, dst):
    """Scalar cast override for cast_to_schema: long→timestamp means epoch
    millis in CDC data (Debezium convention), not Spark CAST's seconds."""
    if isinstance(src, LongType) and isinstance(dst, TimestampType):
        return F.timestamp_millis(col)
    return None


def locked_parse_schema(t):
    """Parse schema for LOCKED mode, derived from the TARGET schema alone
    (no inference saw the wire form): every timestamp parses as STRING —
    after normalize_extended_json a $date is either a bare millis number
    or an ISO string, and from_json coerces both JSON tokens to string —
    then `locked_cast_rule` disambiguates by shape. Everything else
    parses as its target type directly. Recurses through every container
    type that can carry a timestamp — struct, array, AND map (ADVICE r6:
    a pinned map<_, timestamp> previously kept TimestampType in the
    parse schema, so epoch-millis wire forms silently nulled)."""
    from pyspark.sql.types import ArrayType, MapType

    if isinstance(t, TimestampType):
        return StringType()
    if isinstance(t, StructType):
        return StructType(
            [
                StructField(f.name, locked_parse_schema(f.dataType), True)
                for f in t.fields
            ]
        )
    if isinstance(t, ArrayType):
        return ArrayType(locked_parse_schema(t.elementType), True)
    if isinstance(t, MapType):
        # JSON map keys are always strings on the wire; only the value
        # type can hide a timestamp
        return MapType(t.keyType, locked_parse_schema(t.valueType), True)
    return t


def locked_cast_rule(col, src, dst):
    """millis_cast_rule plus the LOCKED string→timestamp disambiguation:
    an all-digits string is epoch millis, anything else is a datetime
    literal (ISO-8601 forms) via try_cast — a producer drifting a pinned
    timestamp field to garbage must degrade to NULL (which the post-cast
    type-drift probe COUNTS) rather than raise mid-batch under ANSI and
    take every collection in the micro-batch down with it."""
    got = millis_cast_rule(col, src, dst)
    if got is not None:
        return got
    if isinstance(src, StringType) and isinstance(dst, TimestampType):
        return F.when(
            col.rlike(r"^-?\d+$"),
            F.timestamp_millis(col.cast("bigint")),
        ).otherwise(col.try_cast("timestamp"))
    return None


@dataclass
class IngestStats:
    collections: dict[str, dict[str, Any]] = field(default_factory=dict)
    dlq_rows: int = 0
    #: rows beyond the per-batch DLQ cap that were counted but not stored
    dlq_overflow: int = 0
    #: dead-letter counts attributed per source, keyed "db.collection";
    #: rows whose envelope carried no recoverable source (and no
    #: provenance channel backfilled one) land under "_unattributed".
    #: Sum always equals dlq_rows. (r9 verdict #6 / ADVICE #5.)
    dlq_by_collection: dict[str, int] = field(default_factory=dict)
    dropped_unknown_ops: int = 0
    #: tables whose stored schema widened this batch (reference
    #: prometheus_metrics.py schema-evolution counter)
    schema_evolutions: list[str] = field(default_factory=list)
    #: LOCKED mode only (ADVICE r6): per table, rows where a pinned
    #: top-level field was PRESENT on the wire but parsed to NULL under
    #: the pinned type (value-level type drift — e.g. a producer starts
    #: sending strings where the table has long). LOCKED never evolves
    #: the table, so without this counter that drift is silent NULL
    #: data loss; with it, governance can alert on the first bad batch.
    type_drift_rows: dict[str, int] = field(default_factory=dict)


class CDCIngestor:
    """Per-collection CDC batch writer over a lake root directory; one
    LakeTable per `{db}_{collection}` (reference event_consumer.py:232-247
    table URIs) plus a `_dlq` table (reference dlq_writer.py)."""

    def __init__(
        self,
        spark: SparkSession,
        lake_root: str,
        mode: MergeMode = MergeMode.AUTO,
        stale_days: int = STALE_DAYS_DEFAULT,
        partition_by: tuple[str, ...] = ("_ingestion_date",),
        retry_config=None,
        circuit_breaker=None,
        materialize_current: bool = False,
        key_col: str = "_id",
        control_plane=None,
        collection_parallelism: int = 1,
        dlq_max_rows_per_batch: int = 10_000,
        coalesce_commits: bool = True,
    ):
        import os

        from ..quality.reliability import RetryConfig
        from ..sinks.txn import recover as _txn_recover

        self.spark = spark
        self.lake_root = lake_root
        #: one write JOB + one txn manifest per same-schema collection
        #: GROUP instead of one job + one commit per collection — the
        #: routed-lane headroom fix (r9 verdict #1); per-table behavior
        #: (txn markers, evolution, stats shape) is identical. Grouping
        #: applies only where safe: AUTO/STRICT, batch_id set, no
        #: current-state materialization, no per-table bloom/generated
        #: properties; everything else falls back per collection.
        self.coalesce_commits = coalesce_commits
        # roll forward any coalesced txn a previous process left mid-
        # finalize (manifest present ⇒ the batch MUST complete), and
        # sweep stage dirs orphaned by a crash before prepare()
        self._txn_dir = os.path.join(lake_root, "_txn")
        self._txn_stage_dir = os.path.join(lake_root, "_txn_stage")
        _txn_recover(spark, self._txn_dir)
        self._sweep_stale_stages()
        self.mode = mode
        self.stale_days = stale_days
        self.partition_by = list(partition_by)
        self.retry_config = retry_config or RetryConfig()
        self.circuit_breaker = circuit_breaker
        #: reference dlq_writer rate limit analogue (10k/min → per-batch)
        self.dlq_max_rows_per_batch = dlq_max_rows_per_batch
        #: >1 routes collections to driver worker threads — each append is
        #: an independent Spark job on its own table (the reference's
        #: per-collection batch_processor threads, B2); 1 = serial
        self.collection_parallelism = collection_parallelism
        #: optional ControlPlane: each ingest batch writes ONE audit entry
        #: (per-collection row/dlq stats as JSON details) — the reference
        #: audits every management op (api/src/routers/admin.py:148-185);
        #: here the data plane self-reports its writes the same way
        self.control_plane = control_plane
        #: SURVEY §1.4: the append log is primary; optionally each batch
        #: also MERGEs the latest row per key into a `<table>__current`
        #: table (upsert for insert/update, key removal for delete) — the
        #: standard Spark CDC materialized current-state view.
        self.materialize_current = materialize_current
        self.key_col = key_col

    def _guarded_append(self, table: LakeTable, rows, **kwargs):
        """Sink write under retry (transient + schema errors, reference
        error_handler.py R1 + delta_writer.py:166-201 R3) and an optional
        circuit breaker (R2)."""
        from ..quality.reliability import (
            is_retryable,
            is_schema_error,
            retry_call,
        )

        def write():
            return table.append(rows, **kwargs)

        def attempt():
            if self.circuit_breaker is not None:
                return self.circuit_breaker.call(write)
            return write()

        from ..sinks.table import ConcurrentWriteError

        return retry_call(
            attempt,
            self.retry_config,
            # lost optimistic-concurrency races re-replay the log and retry
            retry_if=lambda e: isinstance(e, ConcurrentWriteError)
            or is_retryable(e)
            or is_schema_error(e),
        )

    def table(self, name: str) -> LakeTable:
        import os

        return LakeTable(self.spark, os.path.join(self.lake_root, name))

    def ingest_batch(
        self,
        raw_df: DataFrame,
        batch_id: int | None = None,
        now=None,
        dlq_app_id: str = "cdc-_dlq",
    ) -> IngestStats:
        """Process one micro-batch: parse → split → route → append.

        Idempotent under retries when batch_id is given (foreachBatch
        exactly-once: txn app_id per table + batch_id as txn version).
        ``dlq_app_id`` namespaces the shared ``_dlq`` table's txn marker:
        callers that split ONE logical batch_id across several
        ingest_batch calls (the python-reader snapshot path runs one per
        collection) must pass distinct ids, or the second call's DLQ
        append is skipped as an already-committed replay.
        """
        stats = IngestStats()
        # ONE cached parse: both branches (clean → inference + append, dlq →
        # count + append) read the persisted parsed parent, so each raw
        # envelope's variant parse runs exactly once per batch
        parsed, clean, dlq = _parse_events_full(
            raw_df, now=now, stale_days=self.stale_days
        )
        parsed = parsed.persist()
        try:
            # ONE aggregate job yields every collection in the batch, its
            # inferred doc schema, AND the DLQ row count (vs. one distinct
            # + one inference job per collection + a separate dlq.count()):
            # at N collections this is 1 pass over the batch, not N+2.
            # Per-batch job count is the throughput ceiling when many
            # pipelines share one driver (each job is a driver-serialized
            # round trip), so the hot path keeps it minimal.
            clean_flag = F.col("_dlq_reason").isNull() & F.col(
                "_cdc_operation"
            ).isNotNull()
            if self.mode == MergeMode.LOCKED:
                # LOCKED: the schema is pinned to each live table, so the
                # variant-inference aggregate is replaced by a plain count
                # rollup (discovery + DLQ count). The batch's dominant
                # cost — materializing the envelope parse — is shared by
                # both modes, so the measured saving is ~6% on small
                # envelopes, growing with document size/nesting; the real
                # point of LOCKED is schema GOVERNANCE: no producer drift
                # can evolve the table.
                inferred = (
                    parsed.groupBy("db", "collection")
                    .agg(
                        F.sum(clean_flag.cast("int")).alias("n_clean"),
                        F.sum(
                            F.when(
                                F.col("_dlq_reason").isNotNull(), 1
                            ).otherwise(0)
                        ).alias("n_dlq"),
                    )
                    .collect()
                )
                n_dlq = sum(r["n_dlq"] for r in inferred)
                schemas = {}
                for r in inferred:
                    if not r["n_clean"]:
                        continue
                    live = self.table(
                        f"{r['db']}_{r['collection']}"
                    ).schema()
                    if live is None:
                        raise ValueError(
                            f"LOCKED mode: no existing table for "
                            f"{r['db']}.{r['collection']} — create it "
                            "with one AUTO/STRICT batch first"
                        )
                    target = StructType(
                        [
                            f
                            for f in live.fields
                            if f.name not in CDC_META_COLUMNS
                        ]
                    )
                    schemas[(r["db"], r["collection"])] = (
                        target,
                        locked_parse_schema(target),
                    )
            else:
                inferred = (
                    parsed.groupBy("db", "collection")
                    .agg(
                        F.schema_of_variant_agg(
                            F.try_parse_json(F.when(clean_flag, F.col("doc")))
                        ).alias("ddl"),
                        F.sum(clean_flag.cast("int")).alias("n_clean"),
                        F.sum(
                            F.when(
                                F.col("_dlq_reason").isNotNull(), 1
                            ).otherwise(0)
                        ).alias("n_dlq"),
                    )
                    .collect()
                )
                n_dlq = sum(r["n_dlq"] for r in inferred)
                schemas = {}
                for r in inferred:
                    ddl = r["ddl"]
                    if ddl is not None and ddl.startswith("OBJECT<"):
                        raw_schema = _decimals_to_double(
                            StructType.fromDDL(
                                ddl.replace("OBJECT<", "STRUCT<")
                            )
                        )
                        # wrapper markers → real lake types (target) + the
                        # physical post-normalization types (parse)
                        schemas[
                            (r["db"], r["collection"])
                        ] = refine_bson_markers(raw_schema)
            for r in inferred:
                if r["n_dlq"]:
                    key = (
                        f"{r['db']}.{r['collection']}"
                        if r["db"] is not None and r["collection"] is not None
                        else "_unattributed"
                    )
                    stats.dlq_by_collection[key] = (
                        stats.dlq_by_collection.get(key, 0) + r["n_dlq"]
                    )
            n_clean_by_key = {
                (r["db"], r["collection"]): r["n_clean"] for r in inferred
            }
            items = sorted(schemas.items())
            use_grouped = (
                self.coalesce_commits
                and batch_id is not None
                and self.mode != MergeMode.LOCKED
                and not self.materialize_current
                and len(items) > 1
            )
            if use_grouped:
                results = self._ingest_grouped(
                    clean, items, batch_id, n_clean_by_key
                )
            elif self.collection_parallelism > 1 and len(items) > 1:
                # per-collection worker threads (reference batch_processor's
                # per-collection threading, B2): each collection's append is
                # an independent Spark job on its own table, so jobs run
                # concurrently from driver threads; results merge after.
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(
                    max_workers=self.collection_parallelism
                ) as pool:
                    results = list(
                        pool.map(
                            lambda kv: self._ingest_collection(
                                clean,
                                kv[0],
                                kv[1],
                                batch_id,
                                n_rows_hint=n_clean_by_key.get(kv[0]),
                            ),
                            items,
                        )
                    )
            else:
                results = [
                    self._ingest_collection(
                        clean,
                        key,
                        sch,
                        batch_id,
                        n_rows_hint=n_clean_by_key.get(key),
                    )
                    for key, sch in items
                ]
            for table_name, res, evolved, drift_rows in results:
                stats.collections[table_name] = res
                if evolved:
                    stats.schema_evolutions.append(table_name)
                if drift_rows:
                    stats.type_drift_rows[table_name] = drift_rows
            stats.dlq_rows = n_dlq
            if n_dlq:
                # rate guard (reference dlq_writer.py:121-332 limits DLQ
                # writes to 10k/min): a poison storm — e.g. a producer
                # suddenly emitting garbage — must not turn the DLQ table
                # into the write bottleneck. Keep a deterministic prefix
                # (by kafka coordinates) and count the overflow; the
                # storm's shape is diagnosable from the kept sample.
                if n_dlq > self.dlq_max_rows_per_batch:
                    stats.dlq_overflow = n_dlq - self.dlq_max_rows_per_batch
                    dlq = (
                        dlq.orderBy("source_topic", "partition", "offset")
                        .limit(self.dlq_max_rows_per_batch)
                    )
                txn = (dlq_app_id, batch_id) if batch_id is not None else None
                self._guarded_append(
                    self.table("_dlq"), dlq, partition_by=[], txn=txn
                )
        finally:
            parsed.unpersist()
        if self.control_plane is not None:
            import json as _json

            try:
                self.control_plane.record_audit(
                    actor="cdc-ingestor",
                    action="ingest_batch",
                    resource=self.lake_root,
                    details=_json.dumps(
                        {
                            "batch_id": batch_id,
                            "collections": stats.collections,
                            "dlq_rows": stats.dlq_rows,
                            "schema_evolutions": stats.schema_evolutions,
                        },
                        default=str,
                    ),
                )
            except Exception:
                pass  # audit is best-effort; never fail the data write
        return stats

    def _ingest_collection(
        self,
        clean: DataFrame,
        key: tuple[str, str],
        schemas: tuple[StructType, StructType],
        batch_id: int | None,
        n_rows_hint: int | None = None,
    ) -> tuple[str, dict, bool, int]:
        """Route + evolve + append one collection's slice of the batch.
        Returns (table_name, append result, schema_evolved,
        type_drift_rows) — the last is LOCKED-mode-only and 0 elsewhere."""
        db, coll = key
        doc_schema, parse_schema = schemas
        table_name = f"{db}_{coll}"
        sub = clean.where(
            (F.col("db") == db) & (F.col("collection") == coll)
        ).drop("db", "collection")
        if n_rows_hint is not None:
            # Right-size this slice's tasks. A routed batch fans N
            # collections out of ONE cached scan, so every slice inherits
            # the source partition count — at 10 collections x ~30 input
            # partitions that is ~300 tasks for a 40k-row trigger, and
            # per-task overhead (not data) dominates batch wall time;
            # this headroom loss is what breached the routed-lane lag
            # SLO on a degraded host (r9 verdict #1). ~20k rows per
            # write task keeps a small slice at ONE task (and one
            # output file) while a large backlog slice still fans out.
            want = (n_rows_hint + ROWS_PER_WRITE_TASK - 1) // (
                ROWS_PER_WRITE_TASK
            )
            sub = sub.coalesce(max(1, want))
        table = self.table(table_name)
        evolved = False
        live = None if self.mode == MergeMode.LOCKED else table.schema()
        if live is not None:
            data_schema = StructType(
                [f for f in live.fields if f.name not in CDC_META_COLUMNS]
            )
            doc_schema = merge_schemas(data_schema, doc_schema, self.mode)
            evolved = doc_schema != data_schema
        normalized = F.when(
            F.col("doc").contains('"$'),
            normalize_extended_json(F.col("doc")),
        ).otherwise(F.col("doc"))
        obs = None
        if self.mode == MergeMode.LOCKED:
            parsed_rows = sub.select(
                F.from_json(normalized, parse_schema).alias("d"),
                normalized.alias("__wire"),
                *CDC_META_COLUMNS,
            ).select("d.*", "__wire", *CDC_META_COLUMNS)
        else:
            parsed_rows = sub.select(
                F.from_json(normalized, parse_schema).alias("d"),
                *CDC_META_COLUMNS,
            ).select("d.*", *CDC_META_COLUMNS)
        # millis-longs → timestamps + align to the merged schema; in
        # LOCKED mode the parse schema read timestamps as strings (wire
        # form unknown without inference), so the rule also resolves
        # digit-strings → epoch millis vs ISO literals
        meta_fields = [parsed_rows.schema[c] for c in CDC_META_COLUMNS]
        full_target = StructType(list(doc_schema.fields) + meta_fields)
        rule = (
            locked_cast_rule
            if self.mode == MergeMode.LOCKED
            else millis_cast_rule
        )
        if self.mode == MergeMode.LOCKED:
            # ADVICE r6 + r7 review: value-level type drift in LOCKED
            # mode (wire token present, value nulled by the pinned-type
            # parse OR by the pinned-type cast — timestamps parse as
            # strings, so cast-level nulling is the only signal for
            # them) must not be silent. The raw envelope rides through
            # the cast as a passthrough column; the probe compares the
            # wire token against the FINAL post-cast value and sums via
            # observe(), which piggybacks the metric on the append job
            # itself — zero extra Spark jobs on the hot path. Fields
            # whose names JSONPath can't address verbatim (dots,
            # quotes — legal in MongoDB) are skipped from the probe
            # rather than miscounted.
            from pyspark.sql import Observation

            cast_target = StructType(
                list(full_target.fields)
                + [StructField("__wire", StringType(), True)]
            )
            rows = cast_to_schema(
                parsed_rows, cast_target, scalar_rule=rule
            )
            # Allowlist probe-safe names (r7 ADVICE): JSONPath has more
            # metacharacters than the old '.'/quote denylist covered
            # ('[', ']', '*', '$', whitespace — all legal in MongoDB
            # field names); get_json_object on such a path is
            # engine-defined, so those fields are SKIPPED from the
            # probe rather than mis-probed.
            probed = [
                f.name
                for f in doc_schema.fields
                if re.fullmatch(r"[A-Za-z0-9_]+", f.name)
            ]
            if probed:
                drift_row_flag = (
                    sum(
                        (
                            F.get_json_object(
                                F.col("__wire"), f"$.{name}"
                            ).isNotNull()
                            & F.col(name).isNull()
                        ).cast("int")
                        for name in probed
                    )
                    > 0
                ).cast("int")
                obs = Observation()
                rows = rows.observe(
                    obs,
                    F.coalesce(F.sum(drift_row_flag), F.lit(0)).alias(
                        "type_drift_rows"
                    ),
                )
            rows = rows.drop("__wire")
        else:
            rows = cast_to_schema(parsed_rows, full_target, scalar_rule=rule)
        txn = (f"cdc-{table_name}", batch_id) if batch_id is not None else None
        res = self._guarded_append(
            table,
            rows,
            partition_by=self.partition_by,
            mode=self.mode,
            txn=txn,
        )
        # run the __current merge even when the main append was skipped as
        # a duplicate: a retry that crashed between the two commits would
        # otherwise never materialize this batch. The merge's own txn
        # (cdc-current-<table>, batch_id) makes re-merges no-ops.
        if self.materialize_current:
            self._merge_current_state(table_name, rows, batch_id)
        drift_rows = 0
        if obs is not None and not res.get("skipped"):
            # the append executed, so the observed metric is available
            # without blocking (a skipped duplicate txn runs no job and
            # the observation never fires — reading it would hang)
            drift_rows = int(obs.get.get("type_drift_rows") or 0)
        return table_name, res, evolved, drift_rows

    def _sweep_stale_stages(self, max_age_sec: float = 3600.0) -> None:
        """Remove ``_txn_stage`` dirs older than ``max_age_sec`` with no
        surviving manifest (recover() just drained those): leftovers of a
        crash before ``prepare()``, whose files were never adopted. The
        age guard protects a CONCURRENT live writer's in-flight stage."""
        import os
        import shutil
        import time as _time

        if not os.path.isdir(self._txn_stage_dir):
            return
        cutoff = _time.time() - max_age_sec
        for name in os.listdir(self._txn_stage_dir):
            p = os.path.join(self._txn_stage_dir, name)
            try:
                if os.path.getmtime(p) < cutoff:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass

    def _ingest_grouped(
        self,
        clean: DataFrame,
        items: list,
        batch_id: int,
        n_clean_by_key: dict,
    ) -> list[tuple[str, dict, bool, int]]:
        """Route + append a multi-collection batch with ONE Spark write
        job and ONE txn manifest per same-schema collection group.

        The per-collection path costs one driver-scheduled job plus one
        commit per collection per trigger; at the reference's routed
        shape (10 collections × 5k ev/s, spec.md:283-288) that driver
        fan-out — not data volume — capped throughput and breached the
        lag SLO on a degraded host (r9 verdict #1, BENCH_r09 p50 28.8 s).
        Here collections whose post-evolution schema agrees are written
        by a single job partitioned on a ``__route`` column (files land
        under ``_txn_stage/<txn>/__route=<table>/<hive parts>``), the
        files are adopted into each table's directory unpublished, and
        one MultiTableTxn manifest publishes every table's commit with
        its normal ``cdc-<table>`` marker — so a 10-collection trigger
        pays ~1 job + 1 manifest + 10 O(1) log appends, crash-atomic by
        the manifest (recover() rolls forward; sweep reaps pre-manifest
        orphans). Collections that can't share a job (disagreeing
        schemas, bloom/generated-column table properties, layout change)
        fall back to the per-collection append, same batch."""
        from ..quality.reliability import (
            is_retryable,
            is_schema_error,
            retry_call,
        )
        from ..sinks.table import ConcurrentWriteError

        results: list[tuple[str, dict, bool, int]] = []
        groups: dict[tuple[str, str], list[dict]] = {}
        singles: list[tuple] = []
        for key, (doc_schema, parse_schema) in items:
            db, coll = key
            table_name = f"{db}_{coll}"
            table = self.table(table_name)
            if table.txn_version(f"cdc-{table_name}") >= batch_id:
                results.append(
                    (
                        table_name,
                        {
                            "rows": 0,
                            "files": 0,
                            "version": table.version(),
                            "skipped": True,
                        },
                        False,
                        0,
                    )
                )
                continue
            snap = table._replay()
            if (snap.files and list(snap.partition_by) != self.partition_by) or (
                table.properties().get("bloom.filter.columns")
                or table._generated_columns()
            ):
                # layout change (append's error message applies) or
                # per-table write options a shared job can't honor
                singles.append((key, (doc_schema, parse_schema)))
                continue
            evolved = False
            if snap.schema is not None:
                data_schema = StructType(
                    [
                        f
                        for f in snap.schema.fields
                        if f.name not in CDC_META_COLUMNS
                    ]
                )
                doc_schema = merge_schemas(data_schema, doc_schema, self.mode)
                evolved = doc_schema != data_schema
            plan = {
                "key": key,
                "table_name": table_name,
                "doc_schema": doc_schema,
                "parse_schema": parse_schema,
                "evolved": evolved,
                "n": int(n_clean_by_key.get(key, 0)),
            }
            groups.setdefault(
                (doc_schema.json(), parse_schema.json()), []
            ).append(plan)
        for gkey, members in sorted(groups.items()):
            if len(members) == 1:
                m = members[0]
                singles.append((m["key"], (m["doc_schema"], m["parse_schema"])))
                continue

            def run_group(members=members):
                return self._write_group(clean, members, batch_id)

            results.extend(
                retry_call(
                    run_group,
                    self.retry_config,
                    retry_if=lambda e: isinstance(e, ConcurrentWriteError)
                    or is_retryable(e)
                    or is_schema_error(e),
                )
            )
        for key, sch in singles:
            results.append(
                self._ingest_collection(
                    clean,
                    key,
                    sch,
                    batch_id,
                    n_rows_hint=n_clean_by_key.get(key),
                )
            )
        return results

    def _write_group(
        self, clean: DataFrame, members: list[dict], batch_id: int
    ) -> list[tuple[str, dict, bool, int]]:
        """One grouped write attempt: job → adopt files → manifest commit.
        Retried whole by _ingest_grouped; files from a failed attempt are
        unpublished orphans (vacuum's orphan sweep / stage sweep reap)."""
        import os
        import uuid
        from urllib.parse import unquote

        from pyspark.sql import Observation

        from ..sinks.table import _collect_file_stats
        from ..sinks.txn import MultiTableTxn

        parse_schema = members[0]["parse_schema"]
        doc_schema = members[0]["doc_schema"]
        names = [m["table_name"] for m in members]
        total = sum(m["n"] for m in members)
        route = F.concat(F.col("db"), F.lit("_"), F.col("collection"))
        sub = clean.where(route.isin(names)).coalesce(
            max(1, (total + ROWS_PER_WRITE_TASK - 1) // ROWS_PER_WRITE_TASK)
        )
        normalized = F.when(
            F.col("doc").contains('"$'),
            normalize_extended_json(F.col("doc")),
        ).otherwise(F.col("doc"))
        parsed_rows = sub.select(
            F.from_json(normalized, parse_schema).alias("d"),
            route.alias("__route"),
            *CDC_META_COLUMNS,
        ).select("d.*", "__route", *CDC_META_COLUMNS)
        meta_fields = [parsed_rows.schema[c] for c in CDC_META_COLUMNS]
        full_target = StructType(list(doc_schema.fields) + meta_fields)
        cast_target = StructType(
            list(full_target.fields)
            + [StructField("__route", StringType(), False)]
        )
        rows = cast_to_schema(
            parsed_rows, cast_target, scalar_rule=millis_cast_rule
        )
        txn_id = uuid.uuid4().hex
        stage = os.path.join(self._txn_stage_dir, txn_id)
        obs = Observation(f"group-{txn_id}")
        (
            rows.observe(obs, F.count(F.lit(1)).alias("rows"))
            .write.mode("overwrite")
            .partitionBy("__route", *self.partition_by)
            .parquet(stage)
        )
        written = int(obs.get["rows"])
        if written != total:
            raise RuntimeError(
                f"grouped append integrity: wrote {written} rows, "
                f"inference counted {total}"
            )
        # adopt: move each file under its table root, preserving the hive
        # partition subpath below the __route level
        adds: dict[str, list[dict]] = {n: [] for n in names}
        seq = 0
        for route_dir in sorted(os.listdir(stage)):
            if not route_dir.startswith("__route="):
                continue
            tname = unquote(route_dir[len("__route=") :])
            if tname not in adds:
                raise RuntimeError(
                    f"grouped append routed unknown table {tname!r}"
                )
            rbase = os.path.join(stage, route_dir)
            troot = os.path.join(self.lake_root, tname)
            for dirpath, _dirs, fnames in os.walk(rbase):
                for fname in sorted(fnames):
                    if not fname.endswith(".parquet"):
                        continue
                    src = os.path.join(dirpath, fname)
                    rel_part = os.path.relpath(dirpath, rbase)
                    part_dir = (
                        troot
                        if rel_part == "."
                        else os.path.join(troot, rel_part)
                    )
                    os.makedirs(part_dir, exist_ok=True)
                    dst = os.path.join(
                        part_dir, f"part-{txn_id}-{seq:05d}.parquet"
                    )
                    seq += 1
                    os.rename(src, dst)
                    adds[tname].append(
                        {
                            "path": os.path.relpath(dst, troot),
                            "size": os.path.getsize(dst),
                            "stats": _collect_file_stats(dst),
                        }
                    )
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
        txn = MultiTableTxn(
            self.spark, self._txn_dir, app_id="cdc", version=batch_id
        )
        schema_json = full_target.jsonValue()
        for m in members:
            txn.stage_adopted(
                root=os.path.join(self.lake_root, m["table_name"]),
                add=adds[m["table_name"]],
                rows=m["n"],
                schema=schema_json,
                partition_by=self.partition_by,
                app_id=f"cdc-{m['table_name']}",
            )
        published = txn.commit()
        out = []
        for m, pub in zip(members, published):
            out.append(
                (
                    m["table_name"],
                    {
                        "rows": 0 if pub.get("skipped") else m["n"],
                        "files": len(adds[m["table_name"]]),
                        "version": pub.get("version"),
                        "skipped": bool(pub.get("skipped")),
                    },
                    m["evolved"],
                    0,
                )
            )
        return out

    def _merge_current_state(
        self, table_name: str, rows: DataFrame, batch_id: int | None
    ) -> None:
        """Collapse the batch to the latest row per key and MERGE it into
        `<table>__current`: upsert for insert/update, key removal for
        delete. Only files containing touched keys rewrite (LakeTable.merge
        file pruning), so cost scales with the batch, not the table."""
        if self.key_col not in rows.columns:
            return
        from pyspark.sql import Window

        w = Window.partitionBy(self.key_col).orderBy(
            F.col("_kafka_offset").desc_nulls_last(),
            F.col("_cdc_timestamp").desc_nulls_last(),
        )
        latest = (
            rows.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        txn = (
            (f"cdc-current-{table_name}", batch_id)
            if batch_id is not None
            else None
        )
        cur = self.table(f"{table_name}__current")
        # document ids are random (ObjectId/UUID), so min/max stats cannot
        # prune the merge's key scan — parquet bloom filters on the key
        # restore row-group skipping. Set once; every later file gets them.
        if (
            cur.exists()
            and "bloom.filter.columns" not in cur.properties()
        ):
            cur.set_properties({"bloom.filter.columns": self.key_col})
        cur.merge(
            latest,
            self.key_col,
            delete_expr="_cdc_operation = 'delete'",
            mode=self.mode,
            txn=txn,
        )

    def snapshot_load(
        self,
        docs_df: DataFrame,
        database: str,
        collection: str,
        batch_id: int | None = None,
        doc_col: str = "value",
    ) -> IngestStats:
        """Initial snapshot load (reference S8: Debezium snapshot.mode=
        initial emits op='r' reads, spec SC-008 '1 TB ≤ 24 h').

        Takes a DataFrame with one JSON document per row (e.g.
        ``spark.read.text(dump.jsonl)``) and ingests it through the normal
        pipeline as synthetic op='r' envelopes — snapshot rows land exactly
        like streamed inserts (same typing, metadata, schema evolution,
        idempotent txns), so a snapshot followed by streaming is seamless.
        Scale: the envelope wrap is two string concats per row; throughput
        is the ingest path's (~10k docs/s/worker here, cluster-linear)."""
        import json as _json
        import time as _time

        # names are json.dumps-escaped: a db/collection derived from a
        # directory name containing `"` or `\` must not produce a
        # malformed envelope that dead-letters the whole file (ADVICE r9)
        prefix = (
            '{"payload": {"op": "r", "ts_ms": '
            + str(int(_time.time() * 1000))
            + ', "source": {"db": '
            + _json.dumps(database)
            + ', "collection": '
            + _json.dumps(collection)
            + '}, "after": '
        )
        # docs inline as raw JSON objects (valid JSON text needs no
        # escaping; the parser accepts both inline and string-encoded
        # after). __src_* provenance attributes any dead-lettered line to
        # this collection even when its JSON is unparseable.
        wrapped = docs_df.select(
            F.concat(
                F.lit(prefix), F.col(doc_col).cast("string"), F.lit("}}")
            ).alias("value"),
            F.lit(database).alias("__src_db"),
            F.lit(collection).alias("__src_coll"),
        )
        # DLQ txn marker namespaced per collection: snapshot loads of
        # SEVERAL collections legitimately share one batch_id (they are
        # one logical bulk load), and the shared _dlq table must not
        # treat the second collection's dead letters as a replay of the
        # first's. Replaying the SAME collection stays idempotent.
        return self.ingest_batch(
            wrapped,
            batch_id=batch_id,
            dlq_app_id=f"cdc-_dlq-{database}.{collection}",
        )

    def snapshot_load_dump(
        self,
        dump_dir: str,
        batch_id: int | None = None,
        split_size_mb: int = 64,
        reader: str = "text",
    ) -> dict[str, "IngestStats"]:
        """Bulk-load a mongodump/mongoexport directory
        (``<dir>/<db>/<collection>.json``, one extended-JSON doc per
        line) through the normal snapshot path (reference S8 initial
        load / SC-008 bulk targets). Collections route to their own
        tables exactly like streamed events; per-table txn app ids make
        ``batch_id`` idempotence-safe per collection.

        ``reader="text"`` (default, the SC-008 throughput path): ONE
        native ``spark.read.text`` scan over every discovered file —
        the JVM line reader gives the same newline-aligned byte-range
        split contract as the Python connector (``split_size_mb`` maps
        to ``spark.sql.files.maxPartitionBytes`` for the load's
        duration) at none of its per-row Python cost (measured 4.3x on
        the scan), provenance (db, collection) joins in from the
        discovery listing by file path, and ALL collections ingest as
        one routed batch (P6), so per-collection appends run under
        ``collection_parallelism`` threads instead of serializing one
        ingest_batch per collection. ``reader="python"`` keeps the
        portable ``format("mongodump")`` DataSource, one
        ``snapshot_load`` per collection (see cdc/mongodump.py).

        Returns per-``db.collection`` stats in both modes, each with its
        own attributed ``dlq_rows`` (a corrupt line's collection is known
        from file provenance even when its JSON is not parseable — r9
        verdict #6). A ``"_dlq"`` key appears ONLY for the truly
        unattributable residue (none, for either reader, under normal
        operation) or a nonzero DLQ overflow."""
        from .mongodump import _discover, register_mongodump_source

        files = sorted(_discover(dump_dir))
        if reader == "python":
            register_mongodump_source(self.spark)
            out: dict[str, IngestStats] = {}
            for path, db, coll in files:
                docs = (
                    self.spark.read.format("mongodump")
                    .option("path", path)
                    .option("splitSizeMb", str(split_size_mb))
                    .load()
                )
                out[f"{db}.{coll}"] = self.snapshot_load(
                    docs, db, coll, batch_id=batch_id
                )
            return out
        if reader != "text":
            raise ValueError("reader must be 'text' or 'python'")
        if not files:
            raise ValueError(f"no .json dump files under {dump_dir}")

        import json as _json
        import os
        import time as _time

        from pyspark.sql import Observation

        # (abs path → db, coll) provenance from the same discovery the
        # python connector uses, joined on the DECODED _metadata.file_path.
        # Spark surfaces the path URI-encoded (`file:/a/b%20c.json` for
        # `/a/b c.json`), so the raw string only equals os.path.abspath
        # for paths free of spaces/%/non-ASCII — any other file silently
        # matched nothing under the old inner join (r9 ADVICE, high).
        # url_decode restores the filesystem path; literal `+` is first
        # protected as %2B because a URI keeps `+` verbatim while
        # url_decode is form-decoding (`+` → space). Envelope names ride
        # pre-escaped (json.dumps) so a db/coll containing `"` or `\`
        # cannot malform the envelope.
        prov = self.spark.createDataFrame(
            [
                (
                    os.path.abspath(p),
                    db,
                    coll,
                    _json.dumps(db),
                    _json.dumps(coll),
                )
                for p, db, coll in files
            ],
            "__path string, __src_db string, __src_coll string, "
            "__db_json string, __coll_json string",
        )
        conf = self.spark.conf
        prev_mpb = conf.get("spark.sql.files.maxPartitionBytes")
        conf.set(
            "spark.sql.files.maxPartitionBytes",
            str(split_size_mb * 1024 * 1024),
        )
        try:
            decoded = F.url_decode(
                F.regexp_replace(
                    F.regexp_replace(
                        F.col("_metadata.file_path"), "^file:", ""
                    ),
                    r"\+",
                    "%2B",
                )
            )
            # read paths are Hadoop GLOBS: a literal *?[]{}\ in a file
            # name must be backslash-escaped or the read 404s (or worse,
            # silently matches other files)
            import re as _re

            def _glob_escape(p: str) -> str:
                return _re.sub(r"([*?\[\]{}\\])", r"\\\1", p)

            lines = self.spark.read.text(
                [_glob_escape(p) for p, _, _ in files]
            ).select(
                "value",
                F.regexp_replace(decoded, "^/+", "/").alias("__path"),
            )
            ts_ms = int(_time.time() * 1000)
            # left join + observation: a decode/join regression must FAIL
            # LOUDLY, not silently drop files. The observation rides the
            # ingest's own first action — zero extra scan at 1 TB.
            obs = Observation("snapshot-prov-guard")
            joined = (
                lines.where(F.length(F.trim("value")) > 0)
                .join(F.broadcast(prov), "__path", "left")
                .observe(
                    obs,
                    F.sum(
                        F.when(F.col("__src_db").isNull(), 1).otherwise(0)
                    ).alias("unmatched"),
                )
            )
            wrapped = joined.where(F.col("__src_db").isNotNull()).select(
                F.concat(
                    F.lit('{"payload": {"op": "r", "ts_ms": '),
                    F.lit(str(ts_ms)),
                    F.lit(', "source": {"db": '),
                    F.col("__db_json"),
                    F.lit(', "collection": '),
                    F.col("__coll_json"),
                    F.lit('}, "after": '),
                    F.trim(F.col("value")),
                    F.lit("}}"),
                ).alias("value"),
                # provenance channel: dead-lettered lines attribute to
                # their collection even when their JSON is unparseable
                "__src_db",
                "__src_coll",
            )
            batch = self.ingest_batch(wrapped, batch_id=batch_id)
            unmatched = int(obs.get.get("unmatched") or 0)
            if unmatched:
                raise RuntimeError(
                    f"snapshot_load_dump: {unmatched} line(s) scanned from "
                    f"{dump_dir} matched no discovered file after "
                    "URL-decoding _metadata.file_path — provenance join "
                    "regression; matched collections WERE ingested "
                    "(idempotent under the same batch_id), unmatched "
                    "lines were NOT"
                )
        finally:
            conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)

        out = {}
        for _path, db, coll in files:
            table = f"{db}_{coll}"
            dlq_key = f"{db}.{coll}"
            n_dlq = batch.dlq_by_collection.get(dlq_key, 0)
            per = IngestStats(
                collections={
                    k: v for k, v in batch.collections.items() if k == table
                },
                dlq_rows=n_dlq,
                dlq_by_collection={dlq_key: n_dlq} if n_dlq else {},
                schema_evolutions=[
                    t for t in batch.schema_evolutions if t == table
                ],
                type_drift_rows={
                    k: v
                    for k, v in batch.type_drift_rows.items()
                    if k == table
                },
                dropped_unknown_ops=0,
            )
            out[dlq_key] = per
        residue = batch.dlq_by_collection.get("_unattributed", 0)
        if residue or batch.dlq_overflow:
            out["_dlq"] = IngestStats(
                dlq_rows=residue, dlq_overflow=batch.dlq_overflow
            )
        return out

    def replay_dlq(
        self,
        reasons: list[str] | None = None,
        batch_id: int | None = None,
        purge: bool = True,
    ) -> IngestStats:
        """Reprocess dead-lettered events (the operational recovery loop the
        reference's DLQ design implies: fix the cause, replay the queue).

        Events matching ``reasons`` (default: all) re-enter ingest_batch
        with their original Kafka coordinates. Events that fail again are
        re-appended to the DLQ with a fresh timestamp; with ``purge`` the
        successfully drained originals are deleted from the DLQ table —
        guarded by the replay start time so re-failures written during this
        replay survive."""
        import datetime

        dlq_table = self.table("_dlq")
        dlq = dlq_table.read()
        if reasons:
            quoted = ", ".join(f"'{r}'" for r in reasons)
            dlq = dlq.where(f"reason IN ({quoted})")
        start = datetime.datetime.now(datetime.timezone.utc).replace(
            tzinfo=None
        )
        raw = dlq.select(
            F.col("original_event").alias("value"),
            F.col("source_topic").alias("topic"),
            F.col("partition").cast("int").alias("partition"),
            F.col("offset"),
        )
        stats = self.ingest_batch(raw, batch_id=batch_id)
        if purge:
            cond = (
                "_ingestion_timestamp < "
                f"TIMESTAMP '{start.isoformat(sep=' ')}'"
            )
            if reasons:
                cond = f"reason IN ({quoted}) AND {cond}"
            dlq_table.delete_where(cond)
        return stats
