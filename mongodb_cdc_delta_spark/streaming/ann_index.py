"""Incrementally-maintained IVF (inverted-file) ANN index.

The batch ANN path (ops/similarity.py ann_ivf_topk) re-assigns the whole
corpus to cells per build; a mutable 100 TB embedding corpus cannot
afford that per refresh. This module keeps the IVF posting table —
(vec_id, centroid_id, cos_sim, embedding) — fresh from the corpus
table's change feed instead, mirroring IncrementalLshIndex:

- inserts/updates: assign ONLY the changed vectors to their nearest
  centroid (the same literal-centroid argmax as the batch path —
  ``ops.similarity.assign_to_centroids`` — so index contents are
  bit-identical to a full rebuild; asserted in tests/test_ann_index.py);
- deletes: each vector owns exactly one posting row keyed by vec_id, so
  deletions enumerate their keys without reading the index;
- both land in ONE ``merge`` with ``delete_expr`` — file-pruned
  copy-on-write, exactly-once via the change feed's monotonic end
  version as the txn batch id.

Centroids are FIXED index configuration (the production IVF shape:
retraining centroids is an offline decision that rebuilds the index;
day-to-day mutation only moves postings). Cost per refresh: O(changed
vectors), not O(corpus).

Serving: ``topk_for`` probes the ``nprobe`` nearest cells only — the
scan shrinks by ~ncells/nprobe; with nprobe == ncells it degrades to
exact brute force (asserted in tests), which bounds the recall loss to
cell-boundary effects only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ops.similarity import assign_to_centroids, cosine_col
from ..sinks.table import LakeTable
from .aggregates import ChangeFeedTail


class IncrementalIvfIndex:
    """IVF posting table maintained from an embeddings change feed."""

    def __init__(
        self,
        index: LakeTable,
        centroids: Sequence[tuple[int, Sequence[float]]],
        txn_app_id: str = "ivf-index",
    ):
        if not centroids:
            raise ValueError("IVF index needs at least one centroid")
        self.index = index
        self.centroids = [(int(c), [float(x) for x in v]) for c, v in centroids]
        self.txn_app_id = txn_app_id

    # ------------------------------------------------------------- build

    def assignments_for(self, vecs: DataFrame) -> DataFrame:
        """(vec_id, embedding, centroid_id, cos_sim) for a set of
        vectors — identical math to the batch assignment path."""
        return assign_to_centroids(
            vecs.select("vec_id", "embedding"), self.centroids
        )

    def bootstrap(self, vecs: DataFrame) -> dict:
        """Initial build for a pre-existing corpus (empty index table)."""
        return self.index.append(
            self.assignments_for(vecs).withColumn("op", F.lit("upsert"))
        )

    # ------------------------------------------------------------ refresh

    def apply_changes(self, changes: DataFrame, batch_id: int) -> dict:
        """Fold one change-feed batch (LakeTable.read_changes output).

        A batch may span MULTIPLE commit versions (ChangeFeedTail.poll
        returns every unpolled version at once), so changes are first
        collapsed to the LATEST state per key by ``_commit_version``:
        the newest insert wins over older deletes, a newer delete wins
        over older inserts, and within one version (an update = delete
        of the pre-image + insert of the post-image) the insert wins.
        Without the collapse, insert-then-delete across versions would
        resurrect the vector and update-then-update would leave two
        postings — the multi-version fold bug a cron-driven refresh
        hits on its very first busy tick."""
        ins = changes.where(F.col("_change_type") == "insert").select(
            "vec_id", "embedding", "_commit_version"
        )
        dels = changes.where(F.col("_change_type") == "delete").select(
            "vec_id", "_commit_version"
        )
        last_ins = ins.groupBy("vec_id").agg(
            F.max("_commit_version").alias("iv"),
            F.max_by("embedding", "_commit_version").alias("embedding"),
        )
        last_del = dels.groupBy("vec_id").agg(
            F.max("_commit_version").alias("dv")
        )
        state = last_ins.join(last_del, "vec_id", "full_outer")
        inserted = state.where(
            F.col("iv").isNotNull()
            & (F.col("dv").isNull() | (F.col("iv") >= F.col("dv")))
        ).select("vec_id", "embedding")
        deleted_ids = state.where(
            F.col("dv").isNotNull()
            & (F.col("iv").isNull() | (F.col("dv") > F.col("iv")))
        ).select("vec_id")
        upserts = self.assignments_for(inserted).withColumn(
            "op", F.lit("upsert")
        )
        deletes = deleted_ids.select(
            "vec_id",
            F.lit(None).cast("array<float>").alias("embedding"),
            F.lit(None).cast("long").alias("centroid_id"),
            F.lit(None).cast("double").alias("cos_sim"),
            F.lit("delete").alias("op"),
        )
        return self.index.merge(
            upserts.unionByName(deletes),
            "vec_id",
            delete_expr="op = 'delete'",
            txn=(self.txn_app_id, batch_id),
        )

    def maintain(self, tail: ChangeFeedTail) -> int:
        """Drain a corpus change-feed tail into the index; returns the
        number of versions folded. Wire into MaintenanceLoop via
        ``MaintenanceJob(job_id, cron, lambda: idx.maintain(tail))``."""
        n = 0
        while (batch := tail.poll()) is not None:
            changes, _s, end = batch
            self.apply_changes(changes, batch_id=end)
            n += 1
        return n

    # ------------------------------------------------------------- query

    def postings(self) -> DataFrame:
        return self.index.read().select(
            "vec_id", "embedding", "centroid_id", "cos_sim"
        )

    def _nearest_cells(self, query_vec: Sequence[float], nprobe: int):
        """Driver-side nprobe cell selection — the centroid table is tiny
        by construction, the one place driver math is the right call."""
        import math

        qv = [float(x) for x in query_vec]
        qn = math.sqrt(sum(x * x for x in qv)) or 1.0

        def cos(v):
            vn = math.sqrt(sum(x * x for x in v)) or 1.0
            return sum(a * b for a, b in zip(qv, v)) / (qn * vn)

        ranked = sorted(
            self.centroids, key=lambda cv: (-cos(cv[1]), cv[0])
        )
        return [c for c, _v in ranked[:nprobe]]

    def topk_for(
        self, query_vec: Sequence[float], k: int = 10, nprobe: int = 2
    ) -> DataFrame:
        """(vec_id, cos_sim): exact cosine top-k WITHIN the nprobe
        nearest cells — partition pruning on centroid_id does the scan
        shrinking; TakeOrdered does the distributed top-k."""
        cells = self._nearest_cells(query_vec, nprobe)
        qlit = F.array(*[F.lit(float(x)) for x in query_vec])
        return (
            self.postings()
            .where(F.col("centroid_id").isin(cells))
            .select(
                "vec_id",
                F.round(cosine_col(F.col("embedding"), qlit), 6).alias(
                    "cos_sim"
                ),
            )
            .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
            .limit(k)
        )
