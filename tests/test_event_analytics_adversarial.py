"""Adversarial seeded-frame tests for the event-analytics family.

funnel_conversion / retention_cohorts / concurrent_intervals_sweep /
user_path_transitions pass the driver's oracle check at the generated
data's shapes — but generated data never exercises ties, strictly-after
boundaries, empty cohorts, or single-event users. These tests seed a
hand-built events table where every such edge is present, assert the
exact hand-computed values, AND run the registered DuckDB oracle on the
same seeded table so cross-engine parity is proven at the edges too
(round-3 verdict item 7: value-level results on adversarial frames)."""

from __future__ import annotations

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mongodb_cdc_delta_spark.queries import all_queries

REG = all_queries()

T0 = datetime.datetime(2024, 3, 1, 12, 0, 0)


def _sec(s: float) -> datetime.datetime:
    return T0 + datetime.timedelta(seconds=s)


def _write_events(path, rows):
    """rows: list of (event_id, ts, user_id, event_type, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array(
                [float(r[4]) if len(r) > 4 else 1.0 for r in rows],
                pa.float64(),
            ),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(path))


def _run_both(spark, name: str, sf_dir: str):
    """(spark rows, duckdb-oracle rows), canonicalized order-insensitive."""
    q = REG[name]
    sdf = q.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    cur = con.execute(q.oracle)
    d_cols = [d[0] for d in cur.description]
    d_rows = sorted(tuple(r) for r in cur.fetchall())
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch"
    # align column order to spark's for value comparison
    idx = [d_cols.index(c) for c in s_cols]
    d_rows = sorted(tuple(r[i] for i in idx) for r in d_rows)
    return s_rows, d_rows


class TestFunnelAdversarial:
    def test_ties_reversals_and_partial_stages(self, spark, tmp_path):
        rows = [
            # u1: clean ordered funnel
            (1, _sec(0), 1, "view"),
            (2, _sec(10), 1, "click"),
            (3, _sec(20), 1, "purchase"),
            # u2: click+purchase BEFORE the first view — view stage only
            (4, _sec(3), 2, "click"),
            (5, _sec(4), 2, "purchase"),
            (6, _sec(5), 2, "view"),
            # u3: click at EXACTLY the view timestamp (strictly-after
            # excludes it)
            (7, _sec(0), 3, "view"),
            (8, _sec(0), 3, "click"),
            # u4: view only
            (9, _sec(0), 4, "view"),
            # u5: purchase at EXACTLY the click timestamp (excluded)
            (10, _sec(0), 5, "view"),
            (11, _sec(1), 5, "click"),
            (12, _sec(1), 5, "purchase"),
            # u6: min(view) matters — later view must not reset the funnel
            (13, _sec(100), 6, "view"),
            (14, _sec(2), 6, "view"),
            (15, _sec(50), 6, "click"),
            (16, _sec(60), 6, "purchase"),
            # u7: no view at all — in no stage
            (17, _sec(0), 7, "click"),
            (18, _sec(1), 7, "purchase"),
        ]
        _write_events(tmp_path / "events.parquet", rows)
        s, d = _run_both(spark, "funnel_conversion", str(tmp_path))
        assert s == d
        [(view, click, purchase, rate)] = s
        assert (view, click, purchase) == (6, 3, 2)
        assert rate == round(2 / 6, 6)


class TestRetentionAdversarial:
    def test_single_event_users_gaps_and_cutoff(self, spark, tmp_path):
        d = lambda day, uid, eid: (
            eid,
            datetime.datetime(2024, 3, 1 + day, 8, 0, 0),
            uid,
            "view",
        )
        rows = [
            # u1: active day0 only (single-event user)
            d(0, 1, 1),
            # u2: day0, day3, day9 (9 > 7 → excluded row)
            d(0, 2, 2),
            d(3, 2, 3),
            d(9, 2, 4),
            # u3: same cohort as u1/u2, also active day3 → (cohort0, off3)
            # has TWO users
            d(0, 3, 5),
            d(3, 3, 6),
            # u4: later cohort (first event day5), active day5 + day6
            d(5, 4, 7),
            d(6, 4, 8),
            # u5: two events same day — must count once (distinct user-day)
            d(0, 5, 9),
            (10, datetime.datetime(2024, 3, 1, 20, 0, 0), 5, "click"),
        ]
        _write_events(tmp_path / "events.parquet", rows)
        s, dd = _run_both(spark, "retention_cohorts", str(tmp_path))
        assert s == dd
        got = {(c, o): n for c, o, n in s}
        assert got == {
            ("2024-03-01", 0): 4,  # u1 u2 u3 u5
            ("2024-03-01", 3): 2,  # u2 u3
            ("2024-03-06", 0): 1,  # u4
            ("2024-03-06", 1): 1,  # u4 day6
        }  # u2's day9 row correctly absent


class TestConcurrentIntervalsAdversarial:
    def test_boundary_ties_and_first_peak(self, spark, tmp_path):
        # type A: starts at 0,100,200 → conc ramps 1,2,3; at t=300 one
        # interval ends exactly when a 4th starts (+1-1 nets 0, conc
        # stays 3) — peak is 3 and FIRST occurs at t=200, not 300
        rows = [
            (1, _sec(0), 1, "A"),
            (2, _sec(100), 1, "A"),
            (3, _sec(200), 1, "A"),
            (4, _sec(300), 1, "A"),
            # type B: single event → peak 1 at its own start
            (5, _sec(42), 2, "B"),
            # type C: two events at the SAME instant → peak 2 immediately
            (6, _sec(7), 3, "C"),
            (7, _sec(7), 4, "C"),
        ]
        _write_events(tmp_path / "events.parquet", rows)
        s, d = _run_both(spark, "concurrent_intervals_sweep", str(tmp_path))
        assert s == d
        got = {t: (p, us) for t, p, us in s}
        epoch_us = lambda sec: int(_sec(sec).timestamp() * 1_000_000)
        assert got["A"] == (3, epoch_us(200))
        assert got["B"] == (1, epoch_us(42))
        assert got["C"] == (2, epoch_us(7))


class TestPathTransitionsAdversarial:
    def test_same_timestamp_ordering_by_event_id(self, spark, tmp_path):
        # all three events share ONE timestamp: successor assignment must
        # follow event_id order identically in both engines
        rows = [
            (3, _sec(0), 1, "purchase"),
            (1, _sec(0), 1, "view"),
            (2, _sec(0), 1, "click"),
            # u2: single event → no transitions
            (4, _sec(0), 2, "view"),
        ]
        _write_events(tmp_path / "events.parquet", rows)
        s, d = _run_both(spark, "user_path_transitions", str(tmp_path))
        assert s == d
        assert set(s) == {("view", "click", 1), ("click", "purchase", 1)}


class TestAttributionAdversarial:
    def test_last_touch_boundaries_and_direct(self, spark, tmp_path):
        rows = [
            # u1: click exactly 1h before purchase — INSIDE the lookback
            # (<= comparison)
            (1, _sec(0), 1, "click", 1.0),
            (2, _sec(3600), 1, "purchase", 10.0),
            # u2: view 1h+1s before purchase — outside → direct
            (3, _sec(0), 2, "view", 1.0),
            (4, _sec(3601), 2, "purchase", 20.0),
            # u3: channel at the SAME instant as the purchase gets credit
            (5, _sec(100), 3, "view", 1.0),
            (6, _sec(100), 3, "purchase", 40.0),
            # u4: latest of two channels wins (click after view)
            (7, _sec(0), 4, "view", 1.0),
            (8, _sec(10), 4, "click", 1.0),
            (9, _sec(20), 4, "purchase", 80.0),
        ]
        _write_events(tmp_path / "events.parquet", rows)
        s, d = _run_both(
            spark, "purchase_attribution_last_touch", str(tmp_path)
        )
        assert s == d
        got = {c: (n, r) for c, n, r in s}
        assert got["click"] == (2, 90.0)  # u1 boundary + u4 latest
        assert got["direct"] == (1, 20.0)
        assert got["view"] == (1, 40.0)  # u3 same-instant

    def test_linear_split_and_shared_touches(self, spark, tmp_path):
        rows = [
            # u1: two touches → 5.0 splits 2.50/2.50 exactly
            (1, _sec(0), 1, "view", 1.0),
            (2, _sec(10), 1, "click", 1.0),
            (3, _sec(20), 1, "purchase", 5.0),
            # u1: second purchase 30s later shares BOTH touches again
            (4, _sec(50), 1, "purchase", 7.0),
            # u2: no touches → direct
            (5, _sec(0), 2, "purchase", 3.0),
            # u3: three touches, 1.0 → 333333 micro each (floor), 0.000001
            # remainder dropped per the documented integer-credit floor
            (6, _sec(0), 3, "view", 1.0),
            (7, _sec(1), 3, "view", 1.0),
            (8, _sec(2), 3, "click", 1.0),
            (9, _sec(3), 3, "purchase", 1.0),
        ]
        _write_events(tmp_path / "events.parquet", rows)
        s, d = _run_both(spark, "purchase_attribution_linear", str(tmp_path))
        assert s == d
        got = {c: (n, r) for c, n, r in s}
        # u1: view gets 2.5 + 3.5, click gets 2.5 + 3.5
        # u3: view 2x0.333333, click 0.333333
        assert got["direct"] == (1, 3.0)
        assert got["click"] == (3, round(2.5 + 3.5 + 0.333333, 4))
        assert got["view"] == (3, round(2.5 + 3.5 + 2 * 0.333333, 4))

    def test_session_entry_credit_and_gap_split(self, spark, tmp_path):
        rows = [
            # u1 session A: view → purchase (entry=view); 31-min gap; new
            # session B starts WITH a purchase (entry=purchase → direct)
            (1, _sec(0), 1, "view", 1.0),
            (2, _sec(60), 1, "purchase", 10.0),
            (3, _sec(60 + 31 * 60), 1, "purchase", 20.0),
            # u2: exactly 30-min gap stays ONE session (strict > splits)
            (4, _sec(0), 2, "click", 1.0),
            (5, _sec(1800), 2, "purchase", 40.0),
        ]
        _write_events(tmp_path / "events.parquet", rows)
        s, d = _run_both(
            spark, "session_first_touch_attribution", str(tmp_path)
        )
        assert s == d
        got = {c: (n, r) for c, n, r in s}
        assert got["view"] == (1, 10.0)
        assert got["purchase"] == (1, 20.0)  # self-entry session
        assert got["click"] == (1, 40.0)  # 30-min boundary inclusive

    def test_wau_window_edges(self, spark, tmp_path):
        d = lambda day, uid, eid: (
            eid,
            datetime.datetime(2024, 3, 1 + day, 8, 0, 0),
            uid,
            "view",
            1.0,
        )
        rows = [
            d(0, 1, 1),  # u1 active day0 only
            d(7, 2, 2),  # u2 active day7 only
            d(3, 3, 3),  # u3 active day3 only
        ]
        _write_events(tmp_path / "events.parquet", rows)
        s, dd = _run_both(spark, "rolling_active_users", str(tmp_path))
        assert s == dd
        got = dict(s)
        # span = day0..day7; window for day d is [d-6, d]
        assert got["2024-03-01"] == 1  # day0: u1
        assert got["2024-03-04"] == 2  # day3: u1(day0 in window) + u3
        assert got["2024-03-07"] == 2  # day6: u1 still in [day0..day6], u3
        assert got["2024-03-08"] == 2  # day7: u1 aged OUT ([day1..day7]),
        #                                u2(day7) + u3(day3)

    def test_u_shaped_position_weights(self, spark, tmp_path):
        rows = [
            # u1: four touches, rev 10.0 → first 4.0, last 4.0, middles
            # 1.0 each (20% / 2)
            (1, _sec(0), 1, "view", 1.0),
            (2, _sec(10), 1, "click", 1.0),
            (3, _sec(20), 1, "signup", 1.0),
            (4, _sec(30), 1, "error", 1.0),
            (5, _sec(40), 1, "purchase", 10.0),
            # u2: single touch takes all
            (6, _sec(0), 2, "click", 1.0),
            (7, _sec(5), 2, "purchase", 7.0),
            # u3: two touches split evenly
            (8, _sec(0), 3, "view", 1.0),
            (9, _sec(1), 3, "click", 1.0),
            (10, _sec(2), 3, "purchase", 6.0),
            # u4: no touches → direct
            (11, _sec(0), 4, "purchase", 9.0),
        ]
        _write_events(tmp_path / "events.parquet", rows)
        s, d = _run_both(
            spark, "purchase_attribution_u_shaped", str(tmp_path)
        )
        assert s == d
        got = {c: (n, r) for c, n, r in s}
        assert got["view"] == (2, 4.0 + 3.0)  # u1 first + u3 half
        assert got["error"] == (1, 4.0)  # u1 last
        assert got["click"] == (3, 1.0 + 7.0 + 3.0)  # u1 mid + u2 + u3
        assert got["signup"] == (1, 1.0)  # u1 mid
        assert got["direct"] == (1, 9.0)

    def test_time_decay_bucket_edges(self, spark, tmp_path):
        rows = [
            # u1, purchase rev 10 at t=3600: touches at Δ=0 (bucket 0,
            # w16), Δ=exactly 900 s (bucket 1, w8 — the 15-min boundary
            # must fall DOWN-weight), Δ=exactly 3600 s (lookback edge
            # inclusive, bucket 4, w1); sum_w=25
            (1, _sec(0), 1, "signup", 1.0),
            (2, _sec(2700), 1, "click", 1.0),
            (3, _sec(3600), 1, "view", 1.0),
            (4, _sec(3600), 1, "purchase", 10.0),
            # u2: Δ=899 s stays bucket 0; Δ=3601 s is OUTSIDE the
            # lookback and earns nothing
            (5, _sec(399), 2, "error", 1.0),
            (6, _sec(3101), 2, "click", 1.0),
            (7, _sec(4000), 2, "purchase", 5.0),
            # u3: no touches → direct
            (8, _sec(0), 3, "purchase", 9.0),
            # u4: two touches in the SAME bucket (Δ=1800 and Δ=2699 are
            # both bucket 2) split evenly
            (9, _sec(1200), 4, "view", 1.0),
            (10, _sec(301), 4, "click", 1.0),
            (11, _sec(3000), 4, "purchase", 7.0),
        ]
        _write_events(tmp_path / "events.parquet", rows)
        s, d = _run_both(
            spark, "purchase_attribution_time_decay", str(tmp_path)
        )
        assert s == d
        got = {c: (n, r) for c, n, r in s}
        # u1: 10*16/25=6.4, 10*8/25=3.2, 10*1/25=0.4
        assert got["view"] == (2, round(6.4 + 3.5, 4))
        assert got["click"] == (3, round(3.2 + 5.0 + 3.5, 4))
        assert got["signup"] == (1, 0.4)
        assert got["direct"] == (1, 9.0)
        assert "error" not in got  # beyond-lookback touch invisible
