"""Streaming contamination gate: screen incoming documents against the
benchmark/eval corpus BEFORE they reach the training set.

The batch pipeline decontaminates retroactively (suffix_run_flags /
cut_contaminated_spans over the whole corpus); a continuously-ingesting
corpus wants the same guarantee at the door. Each micro-batch runs the
identical batch operator against the (small, static) eval set — the gram
table broadcasts exactly as in batch, there is NO state store and NO
watermark because contamination of a doc depends only on that doc and
the static eval side. Flagged docs land in a quarantine table with their
run metrics; clean docs pass through to the corpus table. Both writes
are LakeTable appends with per-table txn idempotence keyed on the
micro-batch id, so a replayed batch (checkpoint recovery) is a no-op —
the same exactly-once device the CDC sink uses.

Scale: per-tick cost is O(batch chars) gram emission dying in a
broadcast join (hit rate ~0), identical to the batch operator's shape;
the eval set is pinned once per micro-batch and is benchmark-sized by
construction.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ops.dedup import _SR_L, suffix_run_flags
from ..sinks.table import LakeTable

#: per-batch history entries kept on the driver — bounded so an always-on
#: stream (the advertised deployment) cannot leak driver memory one dict
#: per micro-batch forever
_HISTORY_MAX = 1000


@dataclass
class ContaminationGate:
    """foreachBatch splitter: flagged → quarantine, clean → corpus."""

    eval_set: DataFrame
    corpus: LakeTable
    quarantine: LakeTable
    gram: int = _SR_L
    app_id: str = "contamination-gate"
    #: last _HISTORY_MAX per-batch counters for observability
    history: deque = field(
        default_factory=lambda: deque(maxlen=_HISTORY_MAX)
    )

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        batch = batch.cache()
        flags = None
        try:
            flags = suffix_run_flags(
                batch, self.eval_set, gram=self.gram
            ).cache()
            flagged = batch.join(flags, "doc_id").select(
                *batch.columns, "n_runs", "longest_run", "first_pos"
            )
            clean = batch.join(flags, "doc_id", "left_anti")
            qr = self.quarantine.append(
                flagged, txn=(f"{self.app_id}-q", batch_id)
            )
            cr = self.corpus.append(
                clean, txn=(f"{self.app_id}-c", batch_id)
            )
            self.history.append(
                {
                    "batch_id": batch_id,
                    "flagged": qr.get("rows", 0),
                    "clean": cr.get("rows", 0),
                    "replayed": bool(qr.get("skipped"))
                    and bool(cr.get("skipped")),
                }
            )
        finally:
            # unpersist BOTH caches: an always-on stream would otherwise
            # accumulate one cached flags plan per micro-batch forever
            if flags is not None:
                flags.unpersist()
            batch.unpersist()

    def attach(self, stream: DataFrame, checkpoint: str, **trigger):
        """Wire the gate onto a streaming documents DataFrame. Returns
        the StreamingQuery; callers pick the trigger (availableNow for
        drain-and-stop, processingTime for continuous)."""
        if not trigger:
            trigger = {"availableNow": True}
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(**trigger)
            .start()
        )
