"""Streaming CDC: readStream (Kafka or files) → foreachBatch ingest → lake.

Replaces the reference's entire hand-rolled runtime loop with framework
features (reference delta-writer/src/consumer/event_consumer.py:112-159
consume loop, batch_processor.py:12-283 size/time batching + per-collection
threads, utils/checkpointing.py:149-343 offset store):

- micro-batching: ``trigger(processingTime=...)`` + ``maxOffsetsPerTrigger``
  instead of the 2000-record/10 s batcher (defaults preserved)
- checkpoint/resume: ``option("checkpointLocation", ...)`` — Spark's offset
  WAL + commit log replace the atomic-rename JSON checkpoint files
- exactly-once: checkpoint replay + per-table idempotent txns
  (app_id=cdc-<table>, version=batch_id) in LakeTable.append — the
  foreachBatch pattern Delta documents as txnAppId/txnVersion
- graceful shutdown: ``query.stop()`` — an interrupted batch replays and is
  skipped by the txn guard (reference event_consumer.py:249-272 flush logic
  is unnecessary)

Scale notes: one streaming query per pipeline; Kafka partitions map 1:1 to
input tasks, so throughput scales with topic partitioning exactly as the
reference's "horizontal scaling via Kafka partitions" plan (plan.md:63). The
per-collection fan-out happens inside the batch as narrow filters over one
cached scan.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..cdc.pipeline import CDCIngestor, IngestStats
from ..schema import MergeMode

DEFAULT_TRIGGER_SECONDS = 10.0  # reference batch_timeout (event_consumer.py:29)
DEFAULT_MAX_EVENTS_PER_TRIGGER = 2000  # reference batch_size (event_consumer.py:28)


class CDCStreamPipeline:
    """Wire a streaming event source into CDCIngestor.ingest_batch.

    Sources:
    - ``from_kafka``: Debezium topics matching ``mongodb.*`` (reference
      config.py:18 topic pattern). Requires the spark-sql-kafka package on
      the classpath; construction is declarative so environments without it
      fail only at ``start``.
    - ``from_files``: newline-delimited event JSON under a directory — the
      test harness path, same contract (a ``value`` string column).
    """

    def __init__(
        self,
        spark: SparkSession,
        lake_root: str,
        checkpoint_dir: str | None = None,
        mode: MergeMode = MergeMode.AUTO,
        trigger_seconds: float = DEFAULT_TRIGGER_SECONDS,
        max_events_per_trigger: int = DEFAULT_MAX_EVENTS_PER_TRIGGER,
        materialize_current: bool = False,
    ):
        self.spark = spark
        self.lake_root = lake_root
        self.checkpoint_dir = checkpoint_dir or os.path.join(
            lake_root, "_checkpoints", "cdc"
        )
        self.ingestor = CDCIngestor(
            spark, lake_root, mode=mode,
            materialize_current=materialize_current,
        )
        self.trigger_seconds = trigger_seconds
        self.max_events_per_trigger = max_events_per_trigger
        self.last_stats: IngestStats | None = None

    # ------------------------------------------------------------- sources

    def kafka_options(
        self,
        bootstrap_servers: str,
        subscribe_pattern: str = "mongodb.*",
        starting_offsets: str = "earliest",
    ) -> dict[str, str]:
        """Kafka source options with the reference consumer's semantics
        (event_consumer.py:58-67: pattern subscribe `mongodb.*`
        config.py:18, read_committed isolation, bounded poll of 2000)."""
        return {
            "kafka.bootstrap.servers": bootstrap_servers,
            "subscribePattern": subscribe_pattern,
            "startingOffsets": starting_offsets,
            "kafka.isolation.level": "read_committed",
            "maxOffsetsPerTrigger": str(self.max_events_per_trigger),
            "failOnDataLoss": "false",
        }

    def from_kafka(self, bootstrap_servers: str, **kwargs: Any) -> DataFrame:
        """Kafka streaming source (requires spark-sql-kafka on the
        classpath; options testable separately via ``kafka_options``)."""
        reader = self.spark.readStream.format("kafka")
        for k, v in self.kafka_options(bootstrap_servers, **kwargs).items():
            reader = reader.option(k, v)
        return reader.load()

    def from_files(
        self, source_dir: str, max_files_per_trigger: int = 16
    ) -> DataFrame:
        """File source for tests/replay: each line one envelope JSON.

        ``max_files_per_trigger`` bounds per-batch input like the Kafka
        source's maxOffsetsPerTrigger; it is also the CATCH-UP rate cap —
        a pipeline that fell behind can only drain backlog this many
        files per trigger, so size it to several seconds of producer
        output when lag SLOs matter."""
        return (
            self.spark.readStream.format("text")
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .load(source_dir)
        )

    # -------------------------------------------------------------- runner

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self.last_stats = self.ingestor.ingest_batch(batch_df, batch_id=batch_id)

    def start(
        self,
        source_df: DataFrame,
        query_name: str = "cdc-ingest",
        available_now: bool = False,
    ):
        """Start the streaming query. ``available_now=True`` drains all
        currently-available input then stops (test/backfill mode);
        otherwise runs continuously on the processing-time trigger."""
        writer = (
            source_df.writeStream.queryName(query_name)
            .foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(
                processingTime=f"{self.trigger_seconds} seconds"
            )
        return writer.start()

    def run_available(self, source_df: DataFrame, timeout: float = 120.0) -> None:
        """Drain-available convenience: start, await, stop."""
        q = self.start(source_df, available_now=True)
        try:
            q.awaitTermination(timeout)
        finally:
            if q.isActive:
                q.stop()

    # ------------------------------------------------------------- queries

    def read_table(self, name: str, **kwargs: Any) -> DataFrame:
        return self.ingestor.table(name).read(**kwargs)
