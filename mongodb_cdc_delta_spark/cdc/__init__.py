"""CDC ingestion core: Debezium envelope parsing, operation classification,
document extraction, BSON/extended-JSON normalization, CDC metadata
projection, and per-collection routing.

Reference behavior being re-expressed (not ported):
- delta-writer/src/consumer/event_handler.py (parse/classify/extract/enrich)
- delta-writer/src/transformers/bson_to_delta.py (type normalization)
"""
