"""Incrementally-maintained MinHash-LSH dedup index.

The batch dedup path (ops/dedup.py) recomputes signatures for the whole
corpus; at 100 TB a mutable corpus cannot afford that per refresh. This
module keeps the LSH posting table — (doc_id, band, band_hash) — fresh
from the corpus table's change feed instead:

- inserts/updates: recompute signatures for ONLY the changed documents
  (shingle → minhash → band: the same helpers as the batch path, so index
  contents are bit-identical to a full rebuild — asserted in
  tests/test_dedup_index.py);
- deletes: every document owns exactly ``bands`` posting rows with a
  known surrogate key (doc_id:band), so deletions enumerate their keys
  without reading the index at all;
- both land in ONE ``merge`` with ``delete_expr`` — file-pruned
  copy-on-write, exactly-once via the change feed's monotonic end version
  as the txn batch id.

Cost per refresh: O(changed docs), not O(corpus). Combined with
MaintenanceLoop.add_mv_refresh-style cron driving (see maintain()), the
near-dup candidate set tracks a live corpus the way the incremental
aggregate MVs track a metrics table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ops.dedup import (
    band_postings,
    minhash_signatures,
    shingles,
)
from ..sinks.table import LakeTable
from .aggregates import ChangeFeedTail


class IncrementalLshIndex:
    """LSH posting table maintained from a corpus change feed."""

    def __init__(
        self,
        index: LakeTable,
        ngram: int = 3,
        num_hashes: int = 32,
        bands: int = 8,
        rows_per_band: int = 4,
        txn_app_id: str = "lsh-index",
    ):
        if bands * rows_per_band != num_hashes:
            raise ValueError("bands * rows_per_band must equal num_hashes")
        self.index = index
        self.ngram = ngram
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = rows_per_band
        self.txn_app_id = txn_app_id

    # ------------------------------------------------------------- build

    def postings_for(self, docs: DataFrame) -> DataFrame:
        """(doc_id, band, band_hash) for a set of documents — identical
        math to the batch LSH path."""
        sigs = minhash_signatures(
            shingles(docs.select("doc_id", "text"), n=self.ngram),
            num_hashes=self.num_hashes,
        )
        return band_postings(sigs, self.bands, self.rows_per_band)

    @staticmethod
    def _with_key(postings: DataFrame) -> DataFrame:
        return postings.withColumn(
            "__pk", F.concat_ws(":", "doc_id", "band")
        )

    def bootstrap(self, docs: DataFrame) -> dict:
        """Initial build for a pre-existing corpus (empty index table)."""
        return self.index.append(
            self._with_key(
                self.postings_for(docs).withColumn("op", F.lit("upsert"))
            )
        )

    # ------------------------------------------------------------ refresh

    def apply_changes(self, changes: DataFrame, batch_id: int) -> dict:
        """Fold one change-feed batch (LakeTable.read_changes output).

        A batch may span MULTIPLE commit versions (ChangeFeedTail.poll
        returns every unpolled version at once), so changes are first
        collapsed to the LATEST state per key by ``_commit_version``:
        newest insert beats older deletes, newer delete beats older
        inserts, and within one version (update = delete(pre) +
        insert(post)) the insert wins. Without the collapse,
        insert-then-delete across versions resurrects the doc and
        update-then-update indexes the STALE text (multiple signature
        rows per (doc, band) key collide in the merge)."""
        ins = changes.where(F.col("_change_type") == "insert").select(
            "doc_id", "text", "_commit_version"
        )
        dels = changes.where(F.col("_change_type") == "delete").select(
            "doc_id", "_commit_version"
        )
        last_ins = ins.groupBy("doc_id").agg(
            F.max("_commit_version").alias("iv"),
            F.max_by("text", "_commit_version").alias("text"),
        )
        last_del = dels.groupBy("doc_id").agg(
            F.max("_commit_version").alias("dv")
        )
        state = last_ins.join(last_del, "doc_id", "full_outer")
        inserted = state.where(
            F.col("iv").isNotNull()
            & (F.col("dv").isNull() | (F.col("iv") >= F.col("dv")))
        ).select("doc_id", "text")
        deleted_ids = state.where(
            F.col("dv").isNotNull()
            & (F.col("iv").isNull() | (F.col("dv") > F.col("iv")))
        ).select("doc_id")
        upserts = self.postings_for(inserted).withColumn(
            "op", F.lit("upsert")
        )
        # a doc owns exactly `bands` postings → deletes enumerate keys
        deletes = deleted_ids.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(self.bands - 1))
            ).alias("band"),
        ).select(
            "doc_id",
            "band",
            F.lit(None).cast("long").alias("band_hash"),
            F.lit("delete").alias("op"),
        )
        source = self._with_key(upserts.unionByName(deletes))
        return self.index.merge(
            source,
            "__pk",
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
        # delete-op source rows never land in the table (merge removes
        # their keys), so stored rows are postings only
        return self.index.read().select("doc_id", "band", "band_hash")

    def candidate_pairs(self) -> DataFrame:
        """(doc_a, doc_b): docs sharing any LSH bucket, from the index
        alone — no signature recomputation."""
        p = self.postings()
        a = p.select(F.col("doc_id").alias("doc_a"), "band", "band_hash")
        b = p.select(F.col("doc_id").alias("doc_b"), "band", "band_hash")
        return (
            a.join(b, ["band", "band_hash"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )

    def candidates_for(self, docs: DataFrame) -> DataFrame:
        """(probe_doc, match_doc): index lookups for NEW documents — the
        'is this incoming doc a near-dup of anything in the corpus' probe,
        touching only the probes' buckets."""
        probe = self.postings_for(docs).select(
            F.col("doc_id").alias("probe_doc"), "band", "band_hash"
        )
        return (
            probe.join(self.postings(), ["band", "band_hash"])
            .where(F.col("probe_doc") != F.col("doc_id"))
            .select("probe_doc", F.col("doc_id").alias("match_doc"))
            .distinct()
        )
