"""Driver-gate simulator: replicate CORRECTNESS_r{N}.json locally.

Runs the first --budget registry names (default 50 — the driver's cap)
through both the Spark implementation and the DuckDB oracle at --sf-dir
(default sf0.01, the driver's scale), comparing row count + column names +
order-insensitive canonical value hash, exactly like the driver does.

Usage:
    python tools/driver_sim.py [--budget 50] [--all] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from mongodb_cdc_delta_spark.queries import all_queries  # noqa: E402
from mongodb_cdc_delta_spark.session import TABLE_NAMES, get_spark  # noqa: E402

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)  # cwd-independent: the sim must run from a NON-repo cwd to exercise
# the package-zip shipping path
from test_oracle_parity import _canon_rows, _duckdb_run  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=50)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--names", default="", help="comma-separated subset")
    args = ap.parse_args()

    registry = all_queries()
    names = list(registry)
    if args.names:
        names = [n for n in args.names.split(",") if n]
    elif not args.all:
        names = names[: args.budget]

    spark = get_spark()
    n_match = n_rows_only = n_fail = 0
    t0 = time.time()
    for name in names:
        q = registry[name]
        try:
            sdf = q.fn(spark, args.sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = sdf.columns
            if q.oracle is None:
                status = "rows-only" if len(s_rows) >= 0 else "fail"
                n_rows_only += 1
                print(f"  {name}: ROWS-ONLY ({len(s_rows)} rows)")
                continue
            d_cols, d_rows = _duckdb_run(q.oracle, args.sf_dir)
            ok_cols = sorted(s_cols) == sorted(d_cols)
            ok_rows = len(s_rows) == len(d_rows)
            sc, sv = _canon_rows(s_cols, s_rows)
            dc, dv = _canon_rows(d_cols, d_rows)
            ok_vals = sv == dv
            if ok_cols and ok_rows and ok_vals:
                n_match += 1
                print(f"  {name}: MATCH ({len(s_rows)} rows)")
            else:
                n_fail += 1
                detail = []
                if not ok_cols:
                    detail.append(f"cols {sorted(s_cols)} vs {sorted(d_cols)}")
                if not ok_rows:
                    detail.append(f"rows {len(s_rows)} vs {len(d_rows)}")
                if ok_rows and not ok_vals:
                    first = next(
                        (a, b) for a, b in zip(sv, dv) if a != b
                    )
                    detail.append(f"first diff {first}")
                print(f"  {name}: FAIL ({'; '.join(detail)})")
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            print(f"  {name}: ERROR {type(exc).__name__}: {exc}")
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "match": n_match,
                "rows_only": n_rows_only,
                "fail": n_fail,
                "n": len(names),
                "sec": round(dt, 1),
                "sf_dir": args.sf_dir,
            }
        )
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
