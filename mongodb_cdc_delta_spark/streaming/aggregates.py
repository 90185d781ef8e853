"""Incrementally-maintained aggregate tables over a CDC/event stream.

The reference's analytics story re-scans Delta tables per query
(research.md:576-634). For always-hot rollups (per-customer totals,
per-day revenue) a 100 TB append log is the wrong thing to re-aggregate:
an ``IncrementalAggregate`` folds each micro-batch's PARTIAL aggregate
into a small materialized table instead —

- per batch: one partial aggregation of just the batch (map-side combined),
  then a key-pruned MERGE into the aggregate table. Cost scales with the
  batch and the touched keys, never with history.
- additive measures only (count / sum; avg = sum÷count at read) — the
  classic self-maintainable aggregate restriction, which is exactly what
  makes O(delta) maintenance possible.
- replay-safe: the MERGE carries the foreachBatch txn, so a redelivered
  batch is a no-op instead of double-counting (the failure mode hand-rolled
  increment pipelines hit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sinks.table import LakeTable


class IncrementalAggregate:
    """Maintain ``table`` = SELECT keys, count(*), sum(measures...) GROUP BY
    keys, folded incrementally from micro-batches.

    ``measures`` maps output column → source expression (summed). The
    stored schema is ``keys + n_rows + <measure columns>``.
    """

    def __init__(
        self,
        table: LakeTable,
        keys: list[str],
        measures: dict[str, str],
        txn_app_id: str = "incr-agg",
    ):
        self.table = table
        self.keys = list(keys)
        self.measures = dict(measures)
        self.txn_app_id = txn_app_id
        if not self.keys or not self.measures:
            raise ValueError("keys and measures must be non-empty")

    def _partial(self, batch: DataFrame) -> DataFrame:
        aggs = [F.count("*").cast("long").alias("n_rows")] + [
            F.sum(F.expr(expr)).alias(name)
            for name, expr in self.measures.items()
        ]
        return batch.groupBy(*self.keys).agg(*aggs)

    def apply_batch(
        self, batch: DataFrame, batch_id: int | None = None
    ) -> dict:
        """Fold one micro-batch into the aggregate table.

        Combines the batch partial with the CURRENT stored values for the
        touched keys (a key-pruned read — LakeTable.merge file pruning
        applies on the write side; the read side semi-joins on the batch's
        key set), then MERGEs the combined rows. With ``batch_id`` the
        merge is exactly-once under replays."""
        return self._fold(self._partial(batch), batch_id)

    def apply_changes(
        self, changes: DataFrame, batch_id: int | None = None
    ) -> dict:
        """Fold a change-feed batch (``LakeTable.read_changes`` output)
        into the aggregate: inserts add, deletes subtract.

        This upgrades the aggregate from "rollup of an append log" to an
        incrementally-maintained view of a MUTABLE table — updates arrive
        as delete(pre-image)+insert(post-image) pairs, so the additive
        fold stays exact under UPDATE/DELETE/MERGE upstream. Still
        O(changes), still replay-safe via the merge txn."""
        sign = F.when(
            F.col("_change_type") == "insert", F.lit(1)
        ).otherwise(F.lit(-1))
        delta = changes.groupBy(*self.keys).agg(
            F.sum(sign).cast("long").alias("n_rows"),
            *[
                F.sum(sign * F.expr(expr)).alias(name)
                for name, expr in self.measures.items()
            ],
        )
        return self._fold(delta, batch_id)

    def _fold(self, delta: DataFrame, batch_id: int | None = None) -> dict:
        if not self.table.exists() or self.table.schema() is None:
            combined = delta
        else:
            current = self.table.read().join(
                F.broadcast(delta.select(*self.keys).distinct()),
                self.keys,
                "left_semi",
            )
            value_cols = ["n_rows", *self.measures]
            d = delta
            for c in value_cols:
                d = d.withColumnRenamed(c, f"__d_{c}")
            combined = (
                current.join(d, self.keys, "full_outer")
                .select(
                    *self.keys,
                    *[
                        (
                            F.coalesce(F.col(c), F.lit(0))
                            + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
                        ).alias(c)
                        for c in value_cols
                    ],
                )
            )
        txn = (self.txn_app_id, batch_id) if batch_id is not None else None
        # single-column merge key: composite keys collapse to a struct-free
        # concat surrogate kept in the table (merge joins on one column)
        if len(self.keys) == 1:
            return self.table.merge(combined, self.keys[0], txn=txn)
        combined = combined.withColumn(
            "__agg_key", F.concat_ws("\x1f", *self.keys)
        )
        return self.table.merge(combined, "__agg_key", txn=txn)

    def read(self) -> DataFrame:
        df = self.table.read()
        return df.drop("__agg_key") if "__agg_key" in df.columns else df


class ChangeFeedTail:
    """Micro-batch tail of a LakeTable's change feed.

    ``poll()`` returns (changes, start_version, end_version) for commits
    published since the last poll, or None when caught up — the
    building block for driving downstream incremental views off table
    mutations without Kafka in the middle (the lakehouse-native CDC relay).
    ``end_version`` is monotonic, so passing it as the fold's batch_id
    makes downstream maintenance exactly-once under restarts."""

    def __init__(self, table: LakeTable, from_version: int = -1):
        self.table = table
        self.last_seen = from_version

    def poll(self) -> tuple[DataFrame, int, int] | None:
        cur = self.table.version()
        if cur <= self.last_seen:
            return None
        start = self.last_seen + 1
        changes = self.table.read_changes(start, cur)
        self.last_seen = cur
        return changes, start, cur


def maintain_from_changes(
    tail: ChangeFeedTail, agg: IncrementalAggregate
) -> int:
    """Drain the tail into the aggregate; returns versions processed."""
    n = 0
    while (batch := tail.poll()) is not None:
        changes, _start, end = batch
        agg.apply_changes(changes, batch_id=end)
        n += 1
    return n
