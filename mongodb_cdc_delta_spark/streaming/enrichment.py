"""Stream-static enrichment with CURRENT-dimension semantics.

The naive pattern — ``stream.join(dim_df)`` inside writeStream — pins the
static side to the file listing captured when ``dim_df`` was built: a
dimension row added or updated AFTER the query starts is invisible to
every subsequent micro-batch (Spark re-executes the static plan per
batch, but against the original snapshot of files). For a
slowly-changing dimension (user profiles, routing tables, unit-cost
tables) that is a silent correctness bug, not a performance detail.

This enricher does the join inside foreachBatch against a FRESH
``LakeTable.read()`` snapshot per micro-batch, so each batch is enriched
with the dimension AS OF that batch's processing time — the semantics a
production pipeline actually wants for SCD-style lookups. The dimension
is broadcast (it is dimension-sized by definition); unmatched stream
rows pass through with null enrichment columns (left join) so late
dimension arrivals never DROP facts — they enrich later facts only,
which is the standard processing-time SCD trade documented here rather
than hidden.

Exactly-once: the enriched append is txn-keyed on the micro-batch id
(same device as the CDC sink), so checkpoint-recovery replays are
no-ops.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sinks.table import LakeTable

_HISTORY_MAX = 1000


@dataclass
class StreamEnricher:
    """foreachBatch left-broadcast-join against a fresh dim snapshot."""

    dim: LakeTable
    out: LakeTable
    key: str
    app_id: str = "stream-enricher"
    history: deque = field(
        default_factory=lambda: deque(maxlen=_HISTORY_MAX)
    )

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        # a fresh read() per batch is the whole point: it snapshots the
        # dimension's CURRENT version, not the version at query start
        dim_now = self.dim.read()
        enriched = batch.join(F.broadcast(dim_now), self.key, "left")
        res = self.out.append(enriched, txn=(self.app_id, batch_id))
        self.history.append(
            {
                "batch_id": batch_id,
                "dim_version": self.dim.version(),
                "replayed": bool(res.get("skipped")),
            }
        )

    def attach(self, stream: DataFrame, checkpoint: str, **trigger):
        """Wire onto a streaming fact DataFrame; returns the
        StreamingQuery (availableNow by default, like the other gates)."""
        if not trigger:
            trigger = {"availableNow": True}
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(**trigger)
            .start()
        )
