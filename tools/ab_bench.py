"""Interleaved same-session A/B bench: old git ref vs working tree.

Why this exists: this host shows minutes-long co-tenant CPU-steal waves,
so cross-session warm-min timings for the same query+data+code vary up to
~2.4x (NOTES_r8). Three r8 "regressions" were phantoms that only an
interleaved same-session A/B could clear — the r8 verdict asked for that
improvised harness to be productized (VERDICT r8, Next round #1).

What it does:
  1. `git worktree add <tmp> <ref>` for the OLD code;
  2. imports the old repo's ``mongodb_cdc_delta_spark`` registry, purges
     ``sys.modules``, then imports the working tree's registry — both
     registries stay alive as separate module objects in one process;
  3. in ONE SparkSession, for each query, alternates old/new executions
     in A-B-B-A rep order (so a monotone host drift hurts both sides
     equally) with a CPU-calibration sample between pairs;
  4. prints one JSON line: per-query old/new times, min-ratio, and the
     calibration series so a steal wave is visible in the record.

Usage:
  python tools/ab_bench.py <git-ref> <query[,query...]> \
      [--sf-dir DIR] [--pairs N] [--out FILE]

Reading the result: ratio_new_over_old < 1 means the working tree is
faster. Because both sides share the session, JVM, cache state, and any
steal wave, ratios are trustworthy at a spread where cross-session
absolutes are not; treat |ratio-1| < ~0.15 as noise anyway.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _purge_pkg() -> None:
    for m in [
        m for m in sys.modules if m.split(".")[0] == "mongodb_cdc_delta_spark"
    ]:
        del sys.modules[m]


def _load_registry(root: str):
    """Import <root>'s package fresh and return its query registry.

    The returned Query objects keep their defining modules alive through
    ordinary references, so purging sys.modules afterwards lets another
    checkout import under the same package name without clashing.
    """
    _purge_pkg()
    sys.path.insert(0, root)
    try:
        from mongodb_cdc_delta_spark.queries import all_queries

        return all_queries()
    finally:
        sys.path.remove(root)
        _purge_pkg()


def cpu_calibration() -> float:
    import numpy as np

    a = np.arange(640_000, dtype=np.float64).reshape(800, 800) / 1e6
    t0 = time.perf_counter()
    for _ in range(3):
        a = (a @ a.T) % 1.0 + 0.5
    return round(time.perf_counter() - t0, 4)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("ref", help="git ref for the OLD side (tag/sha/branch)")
    ap.add_argument("queries", help="comma-separated registered query names")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--pairs", type=int, default=2,
                    help="A-B pairs per query (A-B-B-A per 2 pairs)")
    ap.add_argument("--out", default=None, help="also write JSON here")
    args = ap.parse_args()
    names = [n for n in args.queries.split(",") if n]

    old_sha = subprocess.run(
        ["git", "-C", REPO, "rev-parse", args.ref],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    wt = f"/tmp/ab_bench_{old_sha[:12]}"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", wt, old_sha],
            check=True, capture_output=True,
        )
    try:
        old_reg = _load_registry(wt)
        new_reg = _load_registry(REPO)
        # session helper from the NEW tree (purged above, re-import is fine)
        sys.path.insert(0, REPO)
        from mongodb_cdc_delta_spark.session import get_spark

        spark = get_spark(app_name="ab-bench")
        calib_series = [cpu_calibration()]
        out: dict = {}
        for name in names:
            if name not in old_reg:
                out[name] = {"error": f"missing in old ref {args.ref}"}
                continue
            if name not in new_reg:
                out[name] = {"error": "missing in working tree"}
                continue
            sides = {"old": old_reg[name].fn, "new": new_reg[name].fn}
            # warm both sides once (codegen/analysis; not timed)
            for fn in sides.values():
                _force(fn(spark, args.sf_dir))
            times: dict[str, list[float]] = {"old": [], "new": []}
            for p in range(args.pairs):
                # A-B on even pairs, B-A on odd: cancels linear drift
                order = ("old", "new") if p % 2 == 0 else ("new", "old")
                for side in order:
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    _force(sides[side](spark, args.sf_dir))
                    times[side].append(
                        round(time.perf_counter() - t0, 3))
                calib_series.append(cpu_calibration())
            o, n = min(times["old"]), min(times["new"])
            out[name] = {
                "old": times["old"],
                "new": times["new"],
                "old_min": o,
                "new_min": n,
                "ratio_new_over_old": round(n / o, 3) if o else None,
            }
        spark.catalog.clearCache()
        payload = {
            "ref": args.ref,
            "ref_sha": old_sha,
            "sf_dir": args.sf_dir,
            "pairs": args.pairs,
            "queries": out,
            "calib_series": calib_series,
            "calib_spread": round(
                max(calib_series) / min(calib_series), 2
            ) if min(calib_series) > 0 else None,
        }
        line = json.dumps(payload)
        print(line)
        if args.out:
            with open(args.out, "w") as fh:
                fh.write(line + "\n")
        bad = [n for n, r in out.items() if "error" in r]
        return 1 if bad else 0
    finally:
        subprocess.run(
            ["git", "-C", REPO, "worktree", "remove", "--force", wt],
            capture_output=True,
        )


if __name__ == "__main__":
    raise SystemExit(main())
