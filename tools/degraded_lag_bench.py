"""Degraded-host routed-lag drill (r9 verdict #1 'done' gate).

The r9 driver window recorded the routed 10-collection lane at p50 28.8 s
— an SLO breach caused by a ~4x CPU-steal wave, with no code regression.
The r10 fix (grouped same-schema appends + right-sized write tasks +
steady-state lag windowing) must therefore be proven ON a degraded host,
not a healthy one. This harness:

1. samples bench.cpu_calibration() (healthy reference ~0.175);
2. if the host is healthier than ``--target-calib`` (default 0.5, the
   verdict's prescribed ~3x degradation), spawns pure-CPU burner
   processes until the sampled calibration crosses the target — the same
   steal-wave shape the driver windows show, injected deterministically;
3. runs bench.multi_collection_lag_bench (routed, default shape:
   10 collections x 1k ev/s, 4 s trigger) under that load;
4. kills the burners and reports {calib series, lag percentiles,
   pass: p50 < 10 s raw}.

Usage: python tools/degraded_lag_bench.py [--target-calib 0.5]
        [--duration 30] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SLO_P50_S = 10.0


def _burn() -> None:  # pragma: no cover - spins until killed
    x = 0
    while True:
        x = (x * 1103515245 + 12345) % (1 << 31)


def run(target_calib: float, duration: float, collections: int = 10) -> dict:
    import bench
    from mongodb_cdc_delta_spark.session import get_spark

    calib0 = bench.cpu_calibration()
    burners: list[multiprocessing.Process] = []
    calib_series = [calib0]
    try:
        # escalate burner count until the calibration probe crosses the
        # target; each step adds ncpu/4 spinners (bounded at 3x ncpu)
        ncpu = os.cpu_count() or 8
        while calib_series[-1] < target_calib and len(burners) < 3 * ncpu:
            for _ in range(max(ncpu // 4, 1)):
                p = multiprocessing.Process(target=_burn, daemon=True)
                p.start()
                burners.append(p)
            time.sleep(0.5)
            calib_series.append(bench.cpu_calibration())
        spark = get_spark(app_name="degraded-lag-bench")
        spark.sparkContext.setLogLevel("ERROR")
        res = bench.multi_collection_lag_bench(
            spark, collections=collections, duration=duration
        )
        calib_series.append(bench.cpu_calibration())
    finally:
        for p in burners:
            p.terminate()
    out = {
        "metric": "routed_lag_under_degradation",
        "target_calib": target_calib,
        "healthy_ref_calib": 0.175,
        "calib_series": [round(c, 3) for c in calib_series],
        "n_burners": len(burners),
        "lag": res,
        "pass": "error" not in res and res["lag_p50_sec"] < SLO_P50_S,
    }
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--target-calib", type=float, default=0.5)
    ap.add_argument("--duration", type=float, default=30.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    payload = run(args.target_calib, args.duration)
    line = json.dumps(payload)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    return 0 if payload["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
