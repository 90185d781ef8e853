"""Scheduled lakehouse maintenance loop: cron tick → drain change feeds
into materialized views → table OPTIMIZE/VACUUM/re-cluster policy.

Mirrors the reconciliation scheduler's shape (reconcile/scheduler.py —
reference FR-018/019, spec.md:205-206) for the *storage* side: the jobs a
lakehouse deployment runs continuously so query latency does not decay as
tables mutate. Two built-in job kinds:

- ``mv_refresh``: poll a table's change feed (ChangeFeedTail) and fold the
  row-level changes into an IncrementalAggregate — O(changes) per tick,
  exactly-once via the feed's monotonic end_version as the fold batch_id,
  so a crashed tick replays harmlessly.
- ``table_maintenance``: auto_maintain() — compaction when small files
  accumulate, DV rewrite past the dead-row threshold, predicate-log-driven
  ZORDER re-cluster, retention-gated vacuum.

Design notes for scale: ``tick()`` is synchronous and serialized — table
maintenance must never race itself (two OPTIMIZEs on one table are a
wasted rewrite; the loser's commit fails the optimistic check), and MV
refresh work is bounded by the change volume since the last tick, so a
driver thread calling tick() once a minute is enough. Misfired crons
coalesce into one run. A deployment wanting process isolation wraps
tick() exactly like the reconcile scheduler documents.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable
import datetime as _dt

from ..reconcile.scheduler import Cron
from ..sinks.maintenance import auto_maintain
from ..sinks.table import LakeTable
from .aggregates import ChangeFeedTail, IncrementalAggregate


@dataclass
class MaintenanceJob:
    job_id: str
    cron: str
    action: Callable[[], dict]
    enabled: bool = True
    #: filled by the loop
    last_fire: _dt.datetime | None = None
    last_result: dict | None = None
    last_error: str | None = None
    runs: int = 0
    failures: int = 0


@dataclass
class MaintenanceLoop:
    clock: Callable[[], float] = time.time
    jobs: dict[str, MaintenanceJob] = field(default_factory=dict)
    events: list[dict] = field(default_factory=list)

    def add(self, job: MaintenanceJob) -> None:
        job.last_fire = _dt.datetime.fromtimestamp(self.clock()).replace(
            second=0, microsecond=0
        )
        self.jobs[job.job_id] = job

    def add_mv_refresh(
        self,
        job_id: str,
        source: LakeTable,
        agg: IncrementalAggregate,
        cron: str = "* * * * *",
        from_version: int | None = None,
    ) -> ChangeFeedTail:
        """Register an MV-refresh job; returns the tail (exposes the
        version cursor for checkpointing)."""
        start = source.version() if from_version is None else from_version
        tail = ChangeFeedTail(source, from_version=start)

        def action() -> dict:
            n = 0
            while (batch := tail.poll()) is not None:
                changes, _s, end = batch
                agg.apply_changes(changes, batch_id=end)
                n += 1
            return {"versions_processed": n, "cursor": tail.last_seen}

        self.add(MaintenanceJob(job_id, cron, action))
        return tail

    def add_index_maintenance(
        self,
        job_id: str,
        source: LakeTable,
        index,
        cron: str = "* * * * *",
        from_version: int | None = None,
    ) -> ChangeFeedTail:
        """Register an incremental-index refresh job for any index with a
        ``maintain(tail) -> int`` method (IncrementalLshIndex,
        IncrementalIvfIndex). Returns the tail (exposes the version
        cursor for checkpointing), same contract as add_mv_refresh."""
        start = source.version() if from_version is None else from_version
        tail = ChangeFeedTail(source, from_version=start)

        def action() -> dict:
            n = index.maintain(tail)
            return {"versions_processed": n, "cursor": tail.last_seen}

        self.add(MaintenanceJob(job_id, cron, action))
        return tail

    def add_table_maintenance(
        self,
        job_id: str,
        table: LakeTable,
        cron: str = "0 * * * *",
        **opts: Any,
    ) -> None:
        self.add(
            MaintenanceJob(job_id, cron, lambda: auto_maintain(table, **opts))
        )

    def add_delta_export(
        self,
        job_id: str,
        table: LakeTable,
        dest: str,
        cron: str = "*/5 * * * *",
        vacuum_retention_hours: float | None = 168.0,
        change_data: bool = False,
    ) -> None:
        """Keep a Delta-protocol export of ``table`` fresh: first fire
        runs the full export, every later fire appends one Delta commit
        with only the files changed since (sync_delta is O(changes) and
        idempotent — a tick at an unchanged version is a recorded no-op),
        then sweeps tombstoned files past the retention window
        (``vacuum_retention_hours=None`` disables the sweep). This is
        the continuously-maintained external read surface:
        DuckDB/delta-rs/Trino readers tail ``dest`` while LakeTable stays
        the writer format."""
        from ..sinks.delta_export import DeltaExporter, vacuum_export

        exporter = DeltaExporter(table, dest, change_data=change_data)

        def action() -> dict:
            import os

            if not os.path.exists(
                os.path.join(dest, "_delta_log", f"{0:020d}.json")
            ):
                return exporter.export()
            res = exporter.sync()
            if vacuum_retention_hours is not None and not res.get("noop"):
                res["vacuum"] = vacuum_export(
                    dest, retention_hours=vacuum_retention_hours
                )
            return res

        self.add(MaintenanceJob(job_id, cron, action))

    def tick(self, now: float | None = None) -> list[dict]:
        """Run every job whose cron matched since its last fire. Failures
        are recorded per-job and never stop the other jobs."""
        now_dt = _dt.datetime.fromtimestamp(
            self.clock() if now is None else now
        )
        actions: list[dict] = []
        for job in self.jobs.values():
            if not job.enabled:
                continue
            fire = Cron.parse(job.cron).next_fire(job.last_fire)
            if fire > now_dt:
                continue
            while True:  # coalesce missed fires
                nxt = Cron.parse(job.cron).next_fire(fire)
                if nxt > now_dt:
                    break
                fire = nxt
            job.last_fire = fire
            job.runs += 1
            try:
                job.last_result = job.action()
                job.last_error = None
                actions.append(
                    {
                        "job_id": job.job_id,
                        "action": "ran",
                        "fire_time": fire.isoformat(),
                        "result": job.last_result,
                    }
                )
            except Exception as e:
                job.failures += 1
                job.last_error = repr(e)[:300]
                actions.append(
                    {
                        "job_id": job.job_id,
                        "action": "failed",
                        "fire_time": fire.isoformat(),
                        "error": job.last_error,
                    }
                )
        self.events.extend(actions)
        return actions

    def status(self) -> list[dict]:
        return [
            {
                "job_id": j.job_id,
                "cron": j.cron,
                "enabled": j.enabled,
                "runs": j.runs,
                "failures": j.failures,
                "last_error": j.last_error,
            }
            for j in self.jobs.values()
        ]
