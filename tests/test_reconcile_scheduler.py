"""Scheduled reconciliation (FR-018 cron + overlap policy, FR-019 progress
%/records/ETA) — reference spec.md:205-206; execution loop the reference
planned via APScheduler outside its engine (plan.md:276-279)."""

from __future__ import annotations

import datetime as dt
import threading

import pytest

from pyspark.sql import functions as F

from mongodb_cdc_delta_spark.cdc.control import (
    ControlPlane,
    ReconciliationSchedule,
)
from mongodb_cdc_delta_spark.reconcile.scheduler import (
    Cron,
    ProgressReporter,
    ReconciliationScheduler,
    chunked_reconcile,
)


# r11 fast-tier: moved to the slow (full-battery) lane in r11 so the default fast tier stays <15 min; this surface remains covered by the full battery and by the oracle-parity/plan-gate suites that stay in the fast lane
pytestmark = pytest.mark.slow

class TestCron:
    def test_hourly_daily_weekly(self):
        hourly = Cron.parse("0 * * * *")
        assert hourly.matches(dt.datetime(2026, 8, 13, 14, 0))
        assert not hourly.matches(dt.datetime(2026, 8, 13, 14, 30))
        daily = Cron.parse("30 2 * * *")
        assert daily.matches(dt.datetime(2026, 8, 13, 2, 30))
        assert not daily.matches(dt.datetime(2026, 8, 13, 3, 30))
        # 2026-08-16 is a Sunday
        weekly = Cron.parse("0 6 * * 0")
        assert weekly.matches(dt.datetime(2026, 8, 16, 6, 0))
        assert not weekly.matches(dt.datetime(2026, 8, 17, 6, 0))

    def test_steps_ranges_lists(self):
        c = Cron.parse("*/15 9-17 1,15 * *")
        assert c.matches(dt.datetime(2026, 8, 15, 9, 45))
        assert not c.matches(dt.datetime(2026, 8, 15, 9, 50))
        assert not c.matches(dt.datetime(2026, 8, 16, 9, 45))
        assert not c.matches(dt.datetime(2026, 8, 15, 8, 45))

    def test_dom_dow_or_rule(self):
        # both restricted → either field may match (Vixie cron)
        c = Cron.parse("0 0 13 * 1")  # 13th OR Mondays
        assert c.matches(dt.datetime(2026, 8, 13, 0, 0))  # a Thursday, dom=13
        assert c.matches(dt.datetime(2026, 8, 17, 0, 0))  # a Monday, dom=17

    def test_next_fire(self):
        c = Cron.parse("30 2 * * *")
        nf = c.next_fire(dt.datetime(2026, 8, 13, 2, 30))
        assert nf == dt.datetime(2026, 8, 14, 2, 30)
        nf = c.next_fire(dt.datetime(2026, 8, 13, 1, 0))
        assert nf == dt.datetime(2026, 8, 13, 2, 30)
        # month rollover
        c = Cron.parse("0 0 1 * *")
        assert c.next_fire(dt.datetime(2026, 8, 13)) == dt.datetime(2026, 9, 1)
        # 7 == Sunday == 0
        assert Cron.parse("0 0 * * 7").matches(dt.datetime(2026, 8, 16, 0, 0))

    def test_invalid(self):
        with pytest.raises(ValueError):
            Cron.parse("0 * * *")
        with pytest.raises(ValueError):
            Cron.parse("61 * * * *")


class FakeClock:
    def __init__(self, start: float):
        self.t = start

    def __call__(self) -> float:
        return self.t


@pytest.fixture()
def control(spark, tmp_path):
    return ControlPlane(spark, str(tmp_path / "lake"))


class TestScheduler:
    def test_two_runs_with_overlap_skip(self, control):
        """Tick a fake clock through two fire times while the first run is
        still in flight: the second fire is skipped and audited; after the
        first run finishes, the next fire starts again."""
        t0 = dt.datetime(2026, 8, 13, 9, 59, 30).timestamp()
        clock = FakeClock(t0)
        release = threading.Event()
        started = threading.Event()

        def slow_job(sched, reporter):
            started.set()
            assert release.wait(30)
            reporter.update(1.0, 42)
            return {"records_processed": 42}

        s = ReconciliationScheduler(control, slow_job, clock=clock)
        s.add(
            ReconciliationSchedule(
                schedule_id="s1", pipeline_id="p1", cron="0 * * * *"
            )
        )
        # 10:00 fire → run starts (and blocks)
        clock.t = dt.datetime(2026, 8, 13, 10, 0, 5).timestamp()
        acts = s.tick()
        assert [a["action"] for a in acts] == ["started"]
        assert started.wait(30)
        # 11:00 fire while still running → skipped
        clock.t = dt.datetime(2026, 8, 13, 11, 0, 5).timestamp()
        acts = s.tick()
        assert [a["action"] for a in acts] == ["skipped_overlap"]
        release.set()
        s.wait_all()
        # 12:00 fire → starts again
        clock.t = dt.datetime(2026, 8, 13, 12, 0, 5).timestamp()
        acts = s.tick()
        assert [a["action"] for a in acts] == ["started"]
        s.wait_all()
        audit = {
            (r["action"],)
            for r in control.audit_log().select("action").collect()
        }
        assert ("reconcile_skipped_overlap",) in audit
        assert ("reconcile_completed",) in audit

    def test_allow_overlap_runs_concurrently(self, control):
        clock = FakeClock(dt.datetime(2026, 8, 13, 9, 59).timestamp())
        release = threading.Event()

        def slow_job(sched, reporter):
            assert release.wait(30)
            return {}

        s = ReconciliationScheduler(control, slow_job, clock=clock)
        s.add(
            ReconciliationSchedule(
                schedule_id="s2",
                pipeline_id="p1",
                cron="0 * * * *",
                allow_overlap=True,
            )
        )
        clock.t = dt.datetime(2026, 8, 13, 10, 0, 5).timestamp()
        assert s.tick()[0]["action"] == "started"
        clock.t = dt.datetime(2026, 8, 13, 11, 0, 5).timestamp()
        assert s.tick()[0]["action"] == "started"
        assert s.active_runs("s2") == 2
        release.set()
        s.wait_all()

    def test_missed_fires_coalesce(self, control):
        clock = FakeClock(dt.datetime(2026, 8, 13, 0, 0, 30).timestamp())
        runs = []
        s = ReconciliationScheduler(
            control,
            lambda sched, rep: runs.append(1),
            clock=clock,
            run_in_thread=False,
        )
        s.add(
            ReconciliationSchedule(
                schedule_id="s3", pipeline_id="p1", cron="*/10 * * * *"
            )
        )
        # jump 5 hours: 30 missed fires → exactly one coalesced run
        clock.t = dt.datetime(2026, 8, 13, 5, 0, 30).timestamp()
        acts = s.tick()
        assert [a["action"] for a in acts] == ["started"]
        assert len(runs) == 1


class TestProgressAndChunks:
    def test_chunked_reconcile_with_progress(self, spark, control):
        clock = FakeClock(1000.0)
        src = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        # target: drop 10 keys, corrupt 5 values, add 3 extras
        tgt = (
            spark.range(0, 1000)
            .where("id % 100 != 7")
            .select(
                F.col("id").alias("k"),
                F.when(F.col("id") % 200 == 11, F.lit(-1))
                .otherwise(F.col("id") * 2)
                .alias("v"),
            )
            .union(
                spark.range(5000, 5003).select(
                    F.col("id").alias("k"), F.lit(0).alias("v")
                )
            )
        )
        reporter = ProgressReporter(control, "s9", "run1", clock=clock)

        # advance the fake clock per update so ETA is computable
        orig_update = reporter.update

        def ticking_update(pct, recs):
            clock.t += 10.0
            orig_update(pct, recs)

        totals = chunked_reconcile(
            src,
            tgt,
            key="k",
            compare_cols=["v"],
            n_chunks=4,
            reporter=type(
                "R", (), {"update": staticmethod(ticking_update)}
            )(),
        )
        assert totals["missing_in_target"] == 10
        assert totals["extra_in_target"] == 3
        assert totals["field_mismatch"] == 5
        assert totals["records_processed"] == 1000

        prog = control._table("reconcile_progress").read().orderBy(
            F.col("pct_complete").cast("double")
        )
        rows = prog.collect()
        assert len(rows) == 4
        assert [float(r["pct_complete"]) for r in rows] == [
            25.0,
            50.0,
            75.0,
            100.0,
        ]
        assert rows[-1]["state"] == "completed"
        # ETA decreases toward zero and elapsed is tracked
        assert float(rows[0]["eta_seconds"]) > float(rows[-1]["eta_seconds"])
        assert float(rows[-1]["eta_seconds"]) == 0.0


class TestFailurePath:
    def test_job_failure_audited_not_swallowed(self, control):
        clock = FakeClock(dt.datetime(2026, 8, 13, 9, 59).timestamp())

        def broken_job(sched, reporter):
            raise RuntimeError("boom")

        s = ReconciliationScheduler(
            control, broken_job, clock=clock, run_in_thread=False
        )
        s.add(
            ReconciliationSchedule(
                schedule_id="sf", pipeline_id="p", cron="0 * * * *"
            )
        )
        clock.t = dt.datetime(2026, 8, 13, 10, 0, 5).timestamp()
        acts = s.tick()
        assert acts[0]["action"] == "started"
        handle = s._active["sf"][0]
        assert isinstance(handle.error, RuntimeError)
        actions = {r["action"] for r in control.audit_log().collect()}
        assert "reconcile_failed" in actions
        # the scheduler keeps ticking: next fire starts a fresh run
        clock.t = dt.datetime(2026, 8, 13, 11, 0, 5).timestamp()
        assert s.tick()[0]["action"] == "started"
