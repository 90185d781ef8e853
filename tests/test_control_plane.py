"""Control-plane metadata tables: versioned pipeline configs, audit log,
reconciliation reports (reference's Postgres entities as lake tables)."""

from __future__ import annotations

import pytest

from mongodb_cdc_delta_spark.cdc.control import (
    ControlPlane,
    PipelineConfig,
    ReconciliationSchedule,
)


@pytest.fixture()
def cp(spark, tmp_path):
    return ControlPlane(spark, str(tmp_path / "lake"))


def test_pipeline_config_versioned(spark, cp):
    cfg = PipelineConfig(
        pipeline_id="p1",
        source_database="shop",
        source_collections=["users", "orders"],
        target_root="/lake",
    )
    cp.save_pipeline(cfg)
    cfg2 = PipelineConfig(
        pipeline_id="p1",
        source_database="shop",
        source_collections=["users", "orders", "events"],
        target_root="/lake",
        batch_size=5000,
    )
    cp.save_pipeline(cfg2)

    current = cp.pipelines().collect()
    assert len(current) == 1
    assert current[0]["batch_size"] == "5000"
    assert "events" in current[0]["source_collections"]

    history = cp.pipelines(include_history=True)
    assert history.count() == 2


def test_audit_log_appends(spark, cp):
    cp.record_audit("admin", "create_pipeline", "p1", "initial setup")
    cp.record_audit("operator", "pause_pipeline", "p1")
    log = cp.audit_log()
    assert log.count() == 2
    actions = {r["action"] for r in log.collect()}
    assert actions == {"create_pipeline", "pause_pipeline"}


def test_reconcile_report_roundtrip(spark, cp):
    cp.save_schedule(
        ReconciliationSchedule("s1", "p1", cron="0 2 * * *")
    )
    cp.record_reconcile_report(
        "p1", "shop_users",
        missing_in_target=3, extra_in_target=1, field_mismatches=2, repaired=6,
    )
    rep = cp.reconcile_reports().first()
    assert rep["table"] == "shop_users"
    assert rep["repaired"] == "6"
