"""Oracle determinism sweep: run every oracle N times in ONE DuckDB
connection (threads=8) and compare canonical hashes across repetitions.

Catches the parallel-window oracle bug class (same query, same data,
different answer under DuckDB's parallel execution — seen live in r5 on
ROWS-framed running aggregates) without needing Spark at all.

Usage:
    python tools/oracle_determinism.py [--sf-dir DIR] [--reps 3]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from mongodb_cdc_delta_spark.queries import all_queries  # noqa: E402
from mongodb_cdc_delta_spark.session import TABLE_NAMES  # noqa: E402


def canon_hash(rows, cols) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(repr(r[i]) for i in order) for r in rows
    )
    return hashlib.sha256(repr(canon).encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    con = duckdb.connect()
    con.execute("SET threads TO 8")
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )
    unstable: dict[str, list[str]] = {}
    n_checked = 0
    t0 = time.time()
    for name, q in all_queries().items():
        if q.oracle is None:
            continue
        hashes = []
        for _ in range(args.reps):
            cur = con.execute(q.oracle)
            cols = [d[0] for d in cur.description]
            hashes.append(canon_hash(cur.fetchall(), cols))
        n_checked += 1
        if len(set(hashes)) != 1:
            unstable[name] = hashes
            print(f"  UNSTABLE: {name} {hashes}")
    print(
        json.dumps(
            {
                "stable": n_checked - len(unstable),
                "unstable": sorted(unstable),
                "n_oracles": n_checked,
                "reps": args.reps,
                "sec": round(time.time() - t0, 1),
                "sf_dir": args.sf_dir,
            }
        )
    )
    return 1 if unstable else 0


if __name__ == "__main__":
    raise SystemExit(main())
