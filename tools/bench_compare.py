#!/usr/bin/env python
"""Compare two bench JSON files on calibration-normalized numbers.

Usage: python tools/bench_compare.py BENCH_r04.json BENCH_r05.json [--threshold 1.3]

Raw per-query deltas across rounds are meaningless when host load
differs (r3->r4 was clouded by a 2.8x swing); this prints each query's
normalized time in both runs (raw * calib_ref / calib_run) and flags
ratios beyond the threshold either way. Runs that predate the
`queries_normalized` field are normalized here from their recorded
`calib_cpu_sec`.
"""

from __future__ import annotations

import argparse
import json

CALIB_REF = 0.175  # r3 healthy-host constant (see bench.py)


def load(path: str) -> tuple[dict[str, float], dict]:
    """Accepts bench.py's own JSON line / bench_last.json, or the grading
    driver's BENCH_r{N}.json wrapper ({n, rc, tail, parsed}) whose `tail`
    is the last 2000 chars of the line — queries present only partially
    there (bench.py orders the dicts first so the scalars survive)."""
    with open(path) as fh:
        data = json.loads(fh.read())
    if "tail" in data and "queries" not in data:
        data = data.get("parsed") or _parse_tail(data["tail"])
    # r9+: prefer per-query LOCAL normalization (bracketing rolling calib
    # samples) — robust to a steal wave that hits only part of a run;
    # falls back to the whole-run median for older records
    if "queries_normalized_local" in data:
        return dict(data["queries_normalized_local"]), data
    if "queries_normalized" in data:
        return dict(data["queries_normalized"]), data
    calib = data.get("calib_cpu_sec") or CALIB_REF
    scale = CALIB_REF / calib
    return {k: v * scale for k, v in data["queries"].items()}, data


def _parse_tail(tail: str) -> dict:
    """Best-effort: reconstruct whatever key/value pairs survive in a
    truncated JSON tail (per-query floats + trailing scalars)."""
    import re

    out: dict = {"queries": {}}
    for k, v in re.findall(r'"([a-z_0-9]+)": ([0-9.]+)[,}]', tail):
        val = float(v) if "." in v else int(v)
        out["queries"][k] = val
        out[k] = val
    for scalar in (
        "value", "value_normalized", "cold_total_sec", "sf", "n_queries",
        "cdc_ingest_events_per_sec", "cdc_ingest_events_per_sec_normalized",
        "calib_cpu_sec", "calib_ref_cpu_sec", "events", "events_per_sec",
        "lag_p50_sec", "lag_p95_sec", "lag_p99_sec",
    ):
        out["queries"].pop(scalar, None)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3)
    args = ap.parse_args()
    a, da = load(args.old)
    b, db = load(args.new)
    if da.get("sf") != db.get("sf"):
        print(
            f"WARNING: different scale factors ({da.get('sf')} vs "
            f"{db.get('sf')}) — deltas reflect data size, not plans"
        )
    for tag, d in (("old", da), ("new", db)):
        spread = d.get("calib_spread")
        if spread and spread > 1.5:
            print(
                f"WARNING: {tag} run's rolling calib spread is {spread}x "
                "(steal waves mid-run) — per-query deltas there need "
                "tools/ab_bench.py confirmation before calling anything"
            )
    ca, cb = da.get("calib_cpu_sec"), db.get("calib_cpu_sec")
    if ca and cb and not (0.5 < ca / cb < 2.0):
        print(
            f"WARNING: calibration differs {round(max(ca, cb) / min(ca, cb), 1)}x "
            "between runs — the single-thread GEMM calibration does not "
            "scale linearly to 32-thread Spark work at large load "
            "swings, so normalized deltas overcorrect; compare the raw "
            "`queries` values too before calling a regression"
        )
    shared = sorted(set(a) & set(b))
    only_a, only_b = sorted(set(a) - set(b)), sorted(set(b) - set(a))
    flagged = []
    for name in shared:
        ratio = b[name] / a[name] if a[name] > 0 else float("inf")
        if ratio >= args.threshold or ratio <= 1 / args.threshold:
            flagged.append((ratio, name))
    print(
        f"{args.old}: calib={da.get('calib_cpu_sec')} "
        f"ingest={da.get('cdc_ingest_events_per_sec')} "
        f"total_norm={round(sum(a[n] for n in shared), 1)}s over shared"
    )
    print(
        f"{args.new}: calib={db.get('calib_cpu_sec')} "
        f"ingest={db.get('cdc_ingest_events_per_sec')} "
        f"total_norm={round(sum(b[n] for n in shared), 1)}s over shared"
    )
    if only_a:
        print(f"dropped ({len(only_a)}): {', '.join(only_a)}")
    if only_b:
        print(f"added ({len(only_b)}): {', '.join(only_b)}")
    if not flagged:
        print(f"no normalized per-query delta beyond {args.threshold}x")
    for ratio, name in sorted(flagged, reverse=True):
        print(
            f"  {name}: {round(a[name], 2)}s -> {round(b[name], 2)}s "
            f"({'+' if ratio >= 1 else ''}{round((ratio - 1) * 100)}%)"
        )


if __name__ == "__main__":
    main()
