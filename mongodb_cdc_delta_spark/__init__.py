"""mongodb_cdc_delta_spark — a PySpark-native rebuild of the capabilities of
NhaLeTruc/mongodb-cdc-delta (MongoDB CDC → Delta Lake pipeline + analytics).

Architecture (Spark-first, not a port):

- ``cdc``        — Debezium envelope parsing, op classification, type
                   normalization, CDC metadata projection (reference:
                   delta-writer/src/consumer/event_handler.py,
                   delta-writer/src/transformers/bson_to_delta.py).
- ``schema``     — dynamic schema inference + widening merge with
                   AUTO/STRICT/PERMISSIVE modes (reference:
                   delta-writer/src/transformers/schema_inferrer.py,
                   type_resolver.py).
- ``sinks``      — transactional append tables on parquet with a JSON commit
                   log ("deltalite": time travel, compaction, vacuum, history),
                   plus a DLQ sink (reference: delta-writer/src/writer/).
- ``streaming``  — Structured Streaming ingestion wrapper (readStream →
                   foreachBatch → per-collection sink), stateful operators
                   (session/tumbling windows, applyInPandasWithState), and
                   the metrics listener (reference:
                   delta-writer/src/consumer/event_consumer.py,
                   shared/metrics/prometheus_metrics.py).
- ``reconcile``  — source/target reconciliation: count, bucketed-hash,
                   record-level diff, repair (reference spec:
                   specs/001-mongodb-cdc-delta/research.md:659-855).
- ``quality``    — validation rules, field renaming, date conversion, PII
                   masking (reference spec FR-057..059).
- ``ops``        — large-scale training-data pipeline operators: dedup
                   (exact/MinHash-LSH/SimHash/ngram-Jaccard/embedding),
                   similarity search, text analysis, multimodal plumbing.
- ``queries``    — the declared analytical query surface (SURVEY.md §2.7)
                   as oracle-checkable (spark_fn, duckdb_sql) pairs.
"""

__version__ = "0.1.0"
