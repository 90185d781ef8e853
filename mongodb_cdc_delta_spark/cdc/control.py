"""Control-plane metadata as lake tables: pipeline configs, audit log,
reconciliation schedules/reports.

The reference runs a FastAPI+Postgres management service for these
(api/src/main.py:233-455 middleware chain, api/migrations/
001_initial_schema.sql tables, audit on every op api/src/routers/
admin.py:148-185; entities spec.md:313-324). The engine-side rebuild keeps
the *data model* — PipelineConfig, AuditLogEntry, ReconciliationSchedule /
Report — as small lake tables with the same append-only/versioned
semantics; auth/RBAC/HTTP stay out of the data plane by design.
"""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..sinks.table import LakeTable

_META_PREFIX = "_meta_"


@dataclass
class PipelineConfig:
    """Reference shared/models/common.py:77-120 (PipelineConfig)."""

    pipeline_id: str
    source_database: str
    source_collections: list[str]
    target_root: str
    batch_size: int = 2000
    batch_timeout_seconds: float = 10.0
    schema_mode: str = "auto"
    enabled: bool = True


@dataclass
class ReconciliationSchedule:
    """Reference spec FR-018/019 (cron schedule + overlap policy)."""

    schedule_id: str
    pipeline_id: str
    cron: str
    batch_size: int = 10_000
    allow_overlap: bool = False
    enabled: bool = True


class ControlPlane:
    """Versioned metadata store: every save is an append with the full
    config; current state = latest row per id (same pattern as the CDC
    current-state view, so history is free)."""

    def __init__(self, spark: SparkSession, lake_root: str):
        self.spark = spark
        self.lake_root = lake_root

    def _table(self, name: str) -> LakeTable:
        import os

        return LakeTable(self.spark, os.path.join(self.lake_root, _META_PREFIX + name))

    def _append_json(self, table: str, record: dict) -> None:
        record = {
            **record,
            "_recorded_at": time.time(),
            "_record_id": uuid.uuid4().hex,
        }
        df = self.spark.createDataFrame([(json.dumps(record),)], "j string")
        from pyspark.sql import functions as F

        cols = [
            F.get_json_object("j", f"$.{k}").alias(k) for k in record
        ]
        self._table(table).append(df.select(*cols), partition_by=[])

    # ---------------------------------------------------------- pipelines

    def save_pipeline(self, cfg: PipelineConfig) -> None:
        d = asdict(cfg)
        d["source_collections"] = json.dumps(d["source_collections"])
        self._append_json("pipelines", d)

    def pipelines(self, include_history: bool = False) -> DataFrame:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        df = self._table("pipelines").read()
        if include_history:
            return df
        w = Window.partitionBy("pipeline_id").orderBy(
            F.col("_recorded_at").desc()
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )

    # -------------------------------------------------------------- audit

    def record_audit(
        self, actor: str, action: str, resource: str, details: str = ""
    ) -> None:
        """Reference: audit log on every management op
        (api/src/routers/admin.py:148-185)."""
        self._append_json(
            "audit",
            {
                "actor": actor,
                "action": action,
                "resource": resource,
                "details": details,
            },
        )

    def audit_log(self) -> DataFrame:
        return self._table("audit").read()

    # ------------------------------------------------------ reconciliation

    def save_schedule(self, sched: ReconciliationSchedule) -> None:
        self._append_json("reconcile_schedules", asdict(sched))

    def record_reconcile_report(
        self,
        pipeline_id: str,
        table: str,
        missing_in_target: int,
        extra_in_target: int,
        field_mismatches: int,
        repaired: int,
    ) -> None:
        """Reference spec FR-020/022 (discrepancy report persistence)."""
        self._append_json(
            "reconcile_reports",
            {
                "pipeline_id": pipeline_id,
                "table": table,
                "missing_in_target": missing_in_target,
                "extra_in_target": extra_in_target,
                "field_mismatches": field_mismatches,
                "repaired": repaired,
            },
        )

    def reconcile_reports(self) -> DataFrame:
        return self._table("reconcile_reports").read()
