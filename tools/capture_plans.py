#!/usr/bin/env python
"""Capture .explain("formatted") for registry queries into plans/<tag>/.

Usage:
    python tools/capture_plans.py <suffix> <name1,name2,...> [--sf-dir D]

Writes plans/r10/<name>_<suffix>.txt for each query. explain() does not run
the query's jobs, but pipelines with eager steps (budget-estimate collects,
localCheckpoint, literal query vectors) execute those while building the
plan — expect a few seconds per expensive name.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("suffix", help="e.g. before / after")
    ap.add_argument("names", help="comma-separated query names, or 'headline'")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out-dir", default="plans/r10")
    args = ap.parse_args()

    from mongodb_cdc_delta_spark.queries import all_queries
    from mongodb_cdc_delta_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    registry = all_queries()
    if args.names == "headline":
        import bench

        names = bench.HEADLINE
    else:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
    out = Path(__file__).resolve().parent.parent / args.out_dir
    out.mkdir(parents=True, exist_ok=True)
    for name in names:
        try:
            df = registry[name].fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # record the failure, keep capturing
            plan = f"ERROR capturing plan: {type(exc).__name__}: {exc}"
        (out / f"{name}_{args.suffix}.txt").write_text(plan)
        print(f"wrote {name}_{args.suffix}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
