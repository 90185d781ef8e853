"""Seeded adversarial tests for the governance reports.

The generated corpus is distribution-stable (both PSI halves come from
one uniform generator), so the moderate/major drift bands never fire
there — the seeds inject a hard distribution shift and pin the exact
PSI against a hand-computed value, and build known equivalence classes
so every k threshold's row counts are exact. Cross-engine: each case
runs BOTH the Spark query and the registered DuckDB oracle on the same
seeded parquet (the standard pattern)."""

from __future__ import annotations

import datetime
import glob
import math
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from mongodb_cdc_delta_spark.queries import all_queries

REG = all_queries()


def _write_events(path, rows):
    """rows: (event_id, ts, user_id, event_type, value)."""
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array(
                    [float(r[4]) for r in rows], pa.float64()
                ),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(path),
    )


def _run_both(spark, name, sf_dir):
    q = REG[name]
    sdf = q.fn(spark, sf_dir)
    s_rows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.splitext(os.path.basename(f))[0]
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{f}')"
        )
    cur = con.execute(q.oracle)
    d_cols = [d[0] for d in cur.description]
    idx = [d_cols.index(c) for c in sdf.columns]
    d_rows = sorted(tuple(r[i] for i in idx) for r in cur.fetchall())
    assert s_rows == d_rows, "cross-engine mismatch on seeded frame"
    return s_rows


def _ts(day, hour=12):
    return datetime.datetime(2024, 1, day, hour, 0, 0)


class TestPsiDrift:
    def test_hard_shift_reads_major_exactly(self, spark, tmp_path):
        # ref half: 40 events in bucket 0 (value 10); cur half: 40 in
        # bucket 9 (value 480). With the +1 floor over 2 occupied
        # buckets: ref=(41,1)/42, cur=(1,41)/42 -> PSI = 2*(40/42)*ln(41)
        rows = [(i, _ts(2), 1, "click", 10.0) for i in range(40)]
        rows += [(100 + i, _ts(20), 1, "click", 480.0) for i in range(40)]
        _write_events(tmp_path / "events.parquet", rows)
        [(etype, psi, band)] = _run_both(
            spark, "psi_drift_report", str(tmp_path)
        )
        expect = round(2 * (40 / 42) * math.log(41.0), 6)
        assert etype == "click"
        assert psi == expect
        assert band == "major"

    def test_identical_halves_read_stable_zero(self, spark, tmp_path):
        rows = [(i, _ts(2), 1, "view", 75.0) for i in range(20)]
        rows += [(100 + i, _ts(20), 1, "view", 75.0) for i in range(20)]
        _write_events(tmp_path / "events.parquet", rows)
        [(_, psi, band)] = _run_both(
            spark, "psi_drift_report", str(tmp_path)
        )
        assert psi == 0.0 and band == "stable"

    def test_moderate_band_boundary(self, spark, tmp_path):
        # partial shift: ref 30/10 vs cur 10/30 across two buckets ->
        # with +1 floors p=(31,11)/42 q=(11,31)/42 mirrored:
        # PSI = 2*(20/42)*ln(31/11) = 0.986... -> still major; scale the
        # shift down: ref 24/16, cur 16/24 -> 2*(8/42)*ln(25/17)=0.1468
        # -> moderate
        rows = [(i, _ts(2), 1, "buy", 10.0) for i in range(24)]
        rows += [(50 + i, _ts(2), 1, "buy", 60.0) for i in range(16)]
        rows += [(100 + i, _ts(20), 1, "buy", 10.0) for i in range(16)]
        rows += [(150 + i, _ts(20), 1, "buy", 60.0) for i in range(24)]
        _write_events(tmp_path / "events.parquet", rows)
        [(_, psi, band)] = _run_both(
            spark, "psi_drift_report", str(tmp_path)
        )
        expect = round(2 * (8 / 42) * math.log(25 / 17), 6)
        assert psi == expect
        assert band == "moderate"


class TestKAnonymity:
    def test_exact_class_accounting(self, spark, tmp_path):
        # classes (same type, same dow, same band): sizes 1, 3, 12
        rows = [(0, _ts(1), 1, "solo", 10.0)]                 # size 1
        rows += [(10 + i, _ts(1), 1, "tri", 10.0) for i in range(3)]
        rows += [(20 + i, _ts(1), 1, "big", 10.0) for i in range(12)]
        _write_events(tmp_path / "events.parquet", rows)
        got = {r[0]: r for r in _run_both(
            spark, "k_anonymity_report", str(tmp_path)
        )}
        # (k, n_classes, n_rows, min_class_size, rows_below_k, ppm)
        assert got[2] == (2, 3, 16, 1, 1, 62500)
        assert got[5] == (5, 3, 16, 1, 4, 250000)
        assert got[10] == (10, 3, 16, 1, 4, 250000)
        assert got[20] == (20, 3, 16, 1, 16, 1000000)

    def test_dow_and_band_split_classes(self, spark, tmp_path):
        # same event_type but different day-of-week / value band must
        # NOT pool into one class
        rows = [(0, _ts(1), 1, "x", 10.0), (1, _ts(2), 1, "x", 10.0),
                (2, _ts(1), 1, "x", 60.0)]
        _write_events(tmp_path / "events.parquet", rows)
        got = {r[0]: r for r in _run_both(
            spark, "k_anonymity_report", str(tmp_path)
        )}
        assert got[2][1] == 3          # three singleton classes
        assert got[2][4] == 3          # all rows below k=2
