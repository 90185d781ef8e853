"""Scheduled reconciliation execution (reference spec FR-018/FR-019).

The reference planned this as a thin driver-side loop outside the engine
(plan.md:276-279 — APScheduler + the reconciliation service); the data plane
here follows the same shape: a ``ReconciliationScheduler`` the deployment
ticks (cron daemon, Airflow sensor, or a `while True: tick(); sleep(30)`
loop), with

- 5-field cron evaluation (minute hour dom month dow — hourly/daily/weekly/
  custom, FR-018), misfires coalesced to one run;
- overlap policy per schedule (FR-018): a run still in flight when the next
  fire arrives is skipped (``allow_overlap=False``, recorded to the audit
  log) or started concurrently (``True``);
- progress tracking (FR-019): percentage complete, records processed, and
  ETA written to the ``_meta_reconcile_progress`` lake table as the run
  advances, final report to ``_meta_reconcile_reports``.

Scale note: progress requires incremental work units. ``chunked_reconcile``
splits the key space into hash-bucket ranges — each chunk is a bounded
record_diff whose completion advances the progress row. The bucket filter
(pmod of xxhash64) is computed per scan; at 100 TB the table should carry a
materialized bucket column (or partition key) so each chunk's predicate
prunes files instead of re-scanning — pass ``chunk_predicates`` built from
that column to get pushdown.
"""

from __future__ import annotations

import calendar
import datetime as _dt
import threading
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cdc.control import ControlPlane, ReconciliationSchedule
from .engine import record_diff

# --------------------------------------------------------------------------
# Cron (5-field, standard semantics)
# --------------------------------------------------------------------------


def _parse_field(spec: str, lo: int, hi: int, aliases=None) -> set[int]:
    vals: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step <= 0:
                raise ValueError(f"cron step must be positive: {spec}")
        if part in ("*", ""):
            start, end = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            start, end = int(a), int(b)
        else:
            start = int(part)
            # "N" with no step is the single value N; "N/step" means
            # "from N to max by step" (Vixie cron behavior)
            end = hi if step > 1 else start
        if not (lo <= start <= hi and lo <= end <= hi and start <= end):
            raise ValueError(f"cron field out of range [{lo},{hi}]: {spec}")
        vals.update(range(start, end + 1, step))
    return vals


@dataclass(frozen=True)
class Cron:
    """Parsed 5-field cron expression."""

    minutes: frozenset
    hours: frozenset
    doms: frozenset
    months: frozenset
    dows: frozenset  # 0=Sunday..6=Saturday (7 normalized to 0)
    dom_restricted: bool
    dow_restricted: bool

    @classmethod
    def parse(cls, expr: str) -> "Cron":
        parts = expr.split()
        if len(parts) != 5:
            raise ValueError(
                f"cron expression needs 5 fields (minute hour dom month "
                f"dow): {expr!r}"
            )
        mi, hr, dom, mon, dow = parts
        dows = {
            d % 7 for d in _parse_field(dow, 0, 7)
        }  # 7 == Sunday == 0
        return cls(
            minutes=frozenset(_parse_field(mi, 0, 59)),
            hours=frozenset(_parse_field(hr, 0, 23)),
            doms=frozenset(_parse_field(dom, 1, 31)),
            months=frozenset(_parse_field(mon, 1, 12)),
            dows=frozenset(dows),
            dom_restricted=dom.split("/")[0] != "*",
            dow_restricted=dow.split("/")[0] != "*",
        )

    def matches(self, dt: _dt.datetime) -> bool:
        if dt.minute not in self.minutes or dt.hour not in self.hours:
            return False
        if dt.month not in self.months:
            return False
        dom_ok = dt.day in self.doms
        dow_ok = (dt.weekday() + 1) % 7 in self.dows  # Monday=0 → Sunday=0
        # standard rule: if BOTH day fields are restricted, either matches
        if self.dom_restricted and self.dow_restricted:
            return dom_ok or dow_ok
        return dom_ok and dow_ok

    def next_fire(self, after: _dt.datetime) -> _dt.datetime:
        """First matching minute strictly after ``after`` (≤ ~4 years out)."""
        dt = after.replace(second=0, microsecond=0) + _dt.timedelta(minutes=1)
        for _ in range(366 * 4):  # day-level outer bound
            if dt.month not in self.months:
                # jump to the 1st of the next month
                y, m = dt.year + (dt.month == 12), dt.month % 12 + 1
                dt = dt.replace(
                    year=y, month=m, day=1, hour=0, minute=0
                )
                continue
            if not self._day_ok(dt):
                last = calendar.monthrange(dt.year, dt.month)[1]
                if dt.day == last:
                    y, m = dt.year + (dt.month == 12), dt.month % 12 + 1
                    dt = dt.replace(year=y, month=m, day=1, hour=0, minute=0)
                else:
                    dt = dt.replace(
                        day=dt.day + 1, hour=0, minute=0
                    )
                continue
            # scan this day's matching (hour, minute) grid
            for h in sorted(self.hours):
                if h < dt.hour:
                    continue
                for m in sorted(self.minutes):
                    if h == dt.hour and m < dt.minute:
                        continue
                    cand = dt.replace(hour=h, minute=m)
                    if self.matches(cand):
                        return cand
            last = calendar.monthrange(dt.year, dt.month)[1]
            if dt.day == last:
                y, mo = dt.year + (dt.month == 12), dt.month % 12 + 1
                dt = dt.replace(year=y, month=mo, day=1, hour=0, minute=0)
            else:
                dt = dt.replace(day=dt.day + 1, hour=0, minute=0)
        raise ValueError("no cron fire time within 4 years")

    def _day_ok(self, dt: _dt.datetime) -> bool:
        dom_ok = dt.day in self.doms
        dow_ok = (dt.weekday() + 1) % 7 in self.dows
        if self.dom_restricted and self.dow_restricted:
            return dom_ok or dow_ok
        return dom_ok and dow_ok


# --------------------------------------------------------------------------
# Progress reporting (FR-019)
# --------------------------------------------------------------------------


class ProgressReporter:
    """Writes progress rows for one reconciliation run.

    percentage complete + records processed + ETA (seconds), per FR-019;
    each update is an append to ``_meta_reconcile_progress`` so the full
    progress history stays queryable."""

    def __init__(
        self,
        control: ControlPlane,
        schedule_id: str,
        run_id: str,
        clock: Callable[[], float] = time.time,
    ):
        self.control = control
        self.schedule_id = schedule_id
        self.run_id = run_id
        self.clock = clock
        self.started_at = clock()
        self.records_processed = 0

    def update(self, pct_complete: float, records_processed: int) -> None:
        self.records_processed = records_processed
        elapsed = max(self.clock() - self.started_at, 0.0)
        eta = (
            elapsed * (1.0 - pct_complete) / pct_complete
            if pct_complete > 0
            else None
        )
        self.control._append_json(
            "reconcile_progress",
            {
                "schedule_id": self.schedule_id,
                "run_id": self.run_id,
                "state": "running" if pct_complete < 1.0 else "completed",
                "pct_complete": round(100.0 * pct_complete, 2),
                "records_processed": records_processed,
                "eta_seconds": round(eta, 1) if eta is not None else None,
                "elapsed_seconds": round(elapsed, 1),
            },
        )


# --------------------------------------------------------------------------
# Chunked reconciliation job (progress-capable execution unit)
# --------------------------------------------------------------------------


def chunked_reconcile(
    source: DataFrame,
    target: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
    n_chunks: int = 4,
    n_buckets: int = 64,
    reporter: ProgressReporter | None = None,
    chunk_predicates: list[str] | None = None,
) -> dict[str, Any]:
    """Record-level reconciliation in ``n_chunks`` bounded units.

    Default chunking filters both sides on contiguous ranges of
    ``pmod(xxhash64(key), n_buckets)``; pass ``chunk_predicates`` (one SQL
    predicate per chunk over a materialized bucket/partition column) at
    scale so each chunk's scan prunes files instead of re-reading."""
    compare_cols = compare_cols or [c for c in source.columns if c != key]
    totals = {
        "missing_in_target": 0,
        "extra_in_target": 0,
        "field_mismatch": 0,
        "records_processed": 0,
    }
    if chunk_predicates is None:
        bounds = [
            (i * n_buckets // n_chunks, (i + 1) * n_buckets // n_chunks)
            for i in range(n_chunks)
        ]
        chunk_predicates = [
            f"pmod(xxhash64(cast({key} as string)), {n_buckets}) >= {lo} AND "
            f"pmod(xxhash64(cast({key} as string)), {n_buckets}) < {hi}"
            for lo, hi in bounds
        ]
    n = len(chunk_predicates)
    for i, pred in enumerate(chunk_predicates):
        s_chunk = source.where(pred)
        t_chunk = target.where(pred)
        # one job per chunk: diff + per-status counts + processed rows
        diff = record_diff(s_chunk, t_chunk, key, compare_cols)
        counts = {
            r["status"]: r["n"]
            for r in diff.groupBy("status")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        for k in ("missing_in_target", "extra_in_target", "field_mismatch"):
            totals[k] += counts.get(k, 0)
        totals["records_processed"] += s_chunk.count()
        if reporter is not None:
            reporter.update((i + 1) / n, totals["records_processed"])
    return totals


# --------------------------------------------------------------------------
# Scheduler
# --------------------------------------------------------------------------


@dataclass
class _RunHandle:
    run_id: str
    thread: threading.Thread | None
    fire_time: _dt.datetime
    result: dict | None = None
    error: BaseException | None = None


class ReconciliationScheduler:
    """Driver-side scheduler loop state (FR-018).

    ``tick(now)`` fires every enabled schedule whose cron matched since the
    last tick (multiple missed fires coalesce into one — standard misfire
    policy). Jobs run on daemon threads so a long reconciliation overlaps
    the next fire, where the overlap policy applies: skip + audit when
    ``allow_overlap`` is false, concurrent run otherwise.
    """

    def __init__(
        self,
        control: ControlPlane,
        job: Callable[[ReconciliationSchedule, ProgressReporter], dict],
        clock: Callable[[], float] = time.time,
        run_in_thread: bool = True,
    ):
        self.control = control
        self.job = job
        self.clock = clock
        self.run_in_thread = run_in_thread
        self._schedules: dict[str, ReconciliationSchedule] = {}
        self._last_fire: dict[str, _dt.datetime] = {}
        self._active: dict[str, list[_RunHandle]] = {}
        self.events: list[dict] = []  # in-memory tick journal (tests/ops)

    def add(self, sched: ReconciliationSchedule) -> None:
        self._schedules[sched.schedule_id] = sched
        self._last_fire[sched.schedule_id] = _dt.datetime.fromtimestamp(
            self.clock()
        ).replace(second=0, microsecond=0)

    def active_runs(self, schedule_id: str) -> int:
        return sum(
            1
            for h in self._active.get(schedule_id, [])
            if h.thread is not None and h.thread.is_alive()
        )

    def tick(self, now: float | None = None) -> list[dict]:
        """Evaluate every schedule at ``now`` (epoch seconds); returns the
        actions taken this tick: [{schedule_id, action, run_id?}]."""
        now_dt = _dt.datetime.fromtimestamp(
            self.clock() if now is None else now
        )
        actions: list[dict] = []
        for sid, sched in self._schedules.items():
            if not sched.enabled:
                continue
            cron = Cron.parse(sched.cron)
            fire = cron.next_fire(self._last_fire[sid])
            if fire > now_dt:
                continue
            # coalesce all missed fires into the latest one
            while True:
                nxt = cron.next_fire(fire)
                if nxt > now_dt:
                    break
                fire = nxt
            self._last_fire[sid] = fire
            if self.active_runs(sid) > 0 and not sched.allow_overlap:
                self.control.record_audit(
                    actor="scheduler",
                    action="reconcile_skipped_overlap",
                    resource=sid,
                    details=f"fire_time={fire.isoformat()}",
                )
                actions.append({"schedule_id": sid, "action": "skipped_overlap"})
                continue
            run_id = uuid.uuid4().hex
            reporter = ProgressReporter(
                self.control, sid, run_id, clock=self.clock
            )
            handle = _RunHandle(run_id=run_id, thread=None, fire_time=fire)

            def _run(sched=sched, reporter=reporter, handle=handle, sid=sid):
                try:
                    handle.result = self.job(sched, reporter)
                    self.control.record_audit(
                        actor="scheduler",
                        action="reconcile_completed",
                        resource=sid,
                        details=f"run_id={handle.run_id}",
                    )
                except BaseException as e:  # recorded, not swallowed silently
                    handle.error = e
                    self.control.record_audit(
                        actor="scheduler",
                        action="reconcile_failed",
                        resource=sid,
                        details=f"run_id={handle.run_id} error={e!r:.200}",
                    )

            self.control.record_audit(
                actor="scheduler",
                action="reconcile_started",
                resource=sid,
                details=f"run_id={run_id} fire_time={fire.isoformat()}",
            )
            if self.run_in_thread:
                t = threading.Thread(target=_run, daemon=True)
                handle.thread = t
                self._active.setdefault(sid, []).append(handle)
                t.start()
            else:
                self._active.setdefault(sid, []).append(handle)
                _run()
            actions.append(
                {"schedule_id": sid, "action": "started", "run_id": run_id}
            )
        self.events.extend(actions)
        return actions

    def wait_all(self, timeout: float = 300.0) -> None:
        for handles in self._active.values():
            for h in handles:
                if h.thread is not None:
                    h.thread.join(timeout)
