"""Availability drill: measured MTTR after a mid-flight kill (r8 verdict
#7; reference SC-005/006 — auto-recovery < 5 min, spec.md:334).

Recovery has been *tested* (checkpoint resume, exactly-once replay) but
never *timed*. This harness times it, at two kill points:

- ``mid_ingest``: cancel every running job while a batch is in flight —
  the foreachBatch fails, the streaming query dies with an exception, the
  half-finished batch's per-collection txn markers are whatever they were.
  The closest one JVM gets to yanking the worker.
- ``mid_maintenance``: same, but triggered while an auto_maintain tick is
  INSIDE optimize/vacuum on the live tables, so recovery also has to cope
  with a maintenance commit race at the kill instant.

Timeline per drill: warm ingest (SLO-green) → kill → ``downtime_s`` of
continued production with the query dead → restart a NEW pipeline object
on the same lake + checkpoint → drain. MTTR is computed post-hoc from
commit metadata (zero in-run overhead, the soak_bench pattern): per 5 s
EVENT-time slice, p50 of (_commit_timestamp − event ts_ms); the first
slice at-or-after the kill whose p50 is back under the 10 s SLO marks
recovery; MTTR = that slice's start − kill time. Exactly-once is asserted
(produced == committed == distinct ids) so a fast-but-lossy recovery
can't pass.

Usage: python tools/mttr_bench.py [--rate 8000] [--warm 40]
        [--downtime 20] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import threading
import time

sys_path_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import sys  # noqa: E402

sys.path.insert(0, sys_path_root)

from pyspark.sql import functions as F  # noqa: E402

from mongodb_cdc_delta_spark.session import get_spark  # noqa: E402
from mongodb_cdc_delta_spark.sinks.maintenance import auto_maintain  # noqa: E402
from mongodb_cdc_delta_spark.sinks.table import LakeTable  # noqa: E402
from mongodb_cdc_delta_spark.streaming.pipeline import CDCStreamPipeline  # noqa: E402

SLO_P50_S = 10.0
SLICE_S = 5.0


def run_drill(spark, kill_point: str, rate: int, warm_s: float,
              downtime_s: float, collections: int = 1) -> dict:
    """``collections > 1`` runs the ROUTED shape (r9 verdict #7): one
    pipeline, events round-robined across N collections, the in-batch P6
    router fanning out to N tables — recovery is then judged per
    collection (worst-collection MTTR gates the pass), so one starved
    table can't hide in the aggregate."""
    base = tempfile.mkdtemp(prefix=f"mttr-{kill_point}-")
    src = os.path.join(base, "src")
    lake = os.path.join(base, "lake")
    os.makedirs(src)
    stop = threading.Event()
    produced = [0]
    chunk = max(rate // 2, 1)

    def producer() -> None:
        i = 0
        while not stop.is_set():
            t0 = time.perf_counter()
            now_ms = int(time.time() * 1000)
            lines = "\n".join(
                json.dumps(
                    {
                        "payload": {
                            "op": "c",
                            "ts_ms": now_ms,
                            "source": {
                                "db": "mttr",
                                "collection": f"docs{(i + k) % collections}"
                                if collections > 1
                                else "docs",
                            },
                            "after": json.dumps(
                                {"_id": f"m{i + k}", "n": i + k}
                            ),
                        }
                    }
                )
                for k in range(chunk)
            )
            tmp = os.path.join(src, f".tmp-{i}")
            with open(tmp, "w") as fh:
                fh.write(lines + "\n")
            os.rename(tmp, os.path.join(src, f"chunk-{i:08d}.json"))
            produced[0] += chunk
            i += chunk
            time.sleep(max(0.0, chunk / rate - (time.perf_counter() - t0)))

    def table_names() -> list[str]:
        if collections > 1:
            return [f"mttr_docs{c}" for c in range(collections)]
        return ["mttr_docs"]

    def table(name: str = None) -> LakeTable:
        return LakeTable(
            spark, os.path.join(lake, name or table_names()[0])
        )

    def total_count() -> int:
        n = 0
        for name in table_names():
            t = table(name)
            if t.exists():
                n += t.count()
        return n

    in_maintenance = threading.Event()
    maint_errors: list[str] = []

    def maintenance() -> None:
        while not stop.is_set():
            stop.wait(8.0)
            if stop.is_set():
                return
            t = table(table_names()[0])
            if not t.exists():
                continue
            in_maintenance.set()
            try:
                auto_maintain(
                    t,
                    small_file_bytes=1 << 20,
                    small_file_count=4,
                    auto_recluster=False,
                    log_retain_commits=200,
                )
            except Exception as e:  # the drill cancels its jobs on purpose
                maint_errors.append(f"{type(e).__name__}: {e}"[:200])
            finally:
                in_maintenance.clear()

    def start_pipeline():
        pipe = CDCStreamPipeline(spark, lake, trigger_seconds=2.0)
        return pipe, pipe.start(
            pipe.from_files(src, max_files_per_trigger=128),
            query_name=f"mttr-{kill_point}",
        )

    _pipe, query = start_pipeline()
    prod = threading.Thread(target=producer, daemon=True)
    prod.start()
    maint = threading.Thread(target=maintenance, daemon=True)
    if kill_point == "mid_maintenance":
        maint.start()

    time.sleep(warm_s)

    # steady-state gate: don't kill a pipeline that is still catching up —
    # MTTR is only meaningful from an SLO-green baseline. Backlog < ~3 s
    # of production counts as steady.
    deadline = time.time() + 120
    while time.time() < deadline:
        try:
            if produced[0] - total_count() < rate * 3:
                break
        except Exception:
            pass
        time.sleep(1.0)

    if kill_point == "mid_maintenance":
        # wait until a maintenance tick is actually inside optimize/vacuum
        deadline = time.time() + 60
        while not in_maintenance.is_set() and time.time() < deadline:
            time.sleep(0.02)

    # ---- the kill: cancel jobs REPEATEDLY until the query provably dies
    # dirty. A single cancelAllJobs can land between triggers with no job
    # in flight (sub-second batches on a 2 s trigger) and kill nothing —
    # the loop murders whichever batch starts next, so the foreachBatch
    # raises and the query terminates with an exception, never a drain.
    t_kill = time.time()
    while time.time() < t_kill + 30:
        spark.sparkContext.cancelAllJobs()
        if not query.isActive or query.exception() is not None:
            break
        time.sleep(0.1)
    try:
        query.stop()
    except Exception:
        pass
    query_died_dirty = query.exception() is not None

    time.sleep(downtime_s)  # producer keeps going; backlog accumulates

    t_restart = time.time()
    _pipe2, query2 = start_pipeline()

    # run until new events are being handled inside SLO again, + margin
    time.sleep(max(60.0, downtime_s * 2))
    stop.set()
    prod.join(timeout=10)
    if maint.is_alive():
        maint.join(timeout=30)
    # drain the tail
    deadline = time.time() + 120
    while time.time() < deadline:
        try:
            if total_count() >= produced[0]:
                break
        except Exception:
            pass
        time.sleep(2)
    try:
        query2.stop()
    except Exception:
        pass

    # ---- post-hoc lag slices from commit metadata
    committed = 0
    distinct = 0
    lag_parts = []
    for name in table_names():
        t = table(name)
        committed += t.count()
        distinct += t.read().select("_id").distinct().count()
        ch = t.read_changes(0).where(F.col("_change_type") == "insert")
        lag_parts.append(
            ch.select(
                F.lit(name).alias("col_id"),
                (
                    (
                        F.col("_commit_timestamp")
                        - F.unix_millis(F.col("_cdc_timestamp"))
                    )
                    / 1000.0
                ).alias("lag"),
                (F.unix_millis(F.col("_cdc_timestamp")) / 1000.0).alias(
                    "ev_s"
                ),
            )
        )
    lags = lag_parts[0]
    for f in lag_parts[1:]:
        lags = lags.unionByName(f)
    sliced = lags.select(
        "col_id",
        ((F.col("ev_s") - F.lit(t_kill)) / SLICE_S)
        .cast("int")
        .alias("slice"),
        "lag",
        (F.col("ev_s") >= F.lit(t_kill)).alias("post"),
    )
    rows = (
        sliced.groupBy("post", "slice")
        .agg(F.count("*").alias("n"), F.expr("percentile(lag, 0.5)").alias("p50"))
        .orderBy("post", "slice")
        .collect()
    )
    pre = [r for r in rows if not r["post"]]
    post = [r for r in rows if r["post"]]
    # baseline greenness must be read from a slice whose events had time
    # to commit BEFORE the kill: a dirty kill guarantees the final ~2
    # pre-kill slices commit only after restart (their lag ≈ downtime by
    # construction), so judge the slice ending >= 10 s before the kill.
    settled = [r for r in pre if r["slice"] <= -3]
    pre_green = bool(settled) and settled[-1]["p50"] < SLO_P50_S

    def first_green(slice_rows) -> float | None:
        for r in slice_rows:
            if r["p50"] < SLO_P50_S:
                return round(r["slice"] * SLICE_S, 1)  # slice start offset
        return None

    mttr = first_green(post)
    per_collection_mttr = None
    if collections > 1:
        prows = (
            sliced.where("post")
            .groupBy("col_id", "slice")
            .agg(F.expr("percentile(lag, 0.5)").alias("p50"))
            .orderBy("col_id", "slice")
            .collect()
        )
        per_collection_mttr = {}
        for name in table_names():
            per_collection_mttr[name] = first_green(
                [r for r in prows if r["col_id"] == name]
            )
    worst_mttr = mttr
    if per_collection_mttr is not None:
        vals = list(per_collection_mttr.values())
        worst_mttr = None if any(v is None for v in vals) else max(vals)
    out = {
        "kill_point": kill_point,
        "rate": rate,
        "collections": collections,
        "warm_s": warm_s,
        "downtime_s": downtime_s,
        "query_died_dirty": query_died_dirty,
        "pre_kill_slo_green": pre_green,
        "mttr_s": mttr,
        **(
            {
                "per_collection_mttr_s": per_collection_mttr,
                "worst_collection_mttr_s": worst_mttr,
            }
            if per_collection_mttr is not None
            else {}
        ),
        "restart_to_green_s": round(mttr - (t_restart - t_kill), 1)
        if mttr is not None
        else None,
        "produced": produced[0],
        "committed": committed,
        "distinct_ids": distinct,
        "exactly_once": committed == produced[0] == distinct,
        "maint_errors": maint_errors,
        "post_slices": [
            {"t": round(r["slice"] * SLICE_S, 0), "n": r["n"],
             "p50": round(r["p50"], 2)}
            for r in post
        ],
        "pass": worst_mttr is not None and worst_mttr < 300
        and query_died_dirty
        and committed == produced[0] == distinct,
    }
    shutil.rmtree(base, ignore_errors=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=int, default=8000)
    ap.add_argument("--warm", type=float, default=40.0)
    ap.add_argument("--downtime", type=float, default=20.0)
    ap.add_argument(
        "--collections",
        type=int,
        default=1,
        help="routed shape: round-robin events across N collections and "
        "gate the pass on the WORST collection's MTTR (r9 verdict #7)",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    spark = get_spark(app_name="mttr-bench")
    spark.sparkContext.setLogLevel("ERROR")
    drills = [
        run_drill(
            spark, kp, args.rate, args.warm, args.downtime,
            collections=args.collections,
        )
        for kp in ("mid_ingest", "mid_maintenance")
    ]
    payload = {
        "metric": "mttr_to_slo_green_s",
        "slo_target_s": 300,
        "drills": drills,
        "value": max(
            (d["mttr_s"] for d in drills if d["mttr_s"] is not None),
            default=None,
        ),
        "pass": all(d["pass"] for d in drills),
    }
    line = json.dumps(payload)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    spark.stop()
    return 0 if payload["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
