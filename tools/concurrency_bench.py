"""Q8: concurrent multi-user query throughput (r7 verdict item 1).

The reference declares "support concurrent analytical queries from multiple
users without degradation" (spec.md:117) and demonstrates DuckDB reading a
Delta table while the writer appends (README.md:13). This harness measures
both contracts on this engine:

Part A — read-only concurrency. N client threads (N = 1/2/4/8), each
running the same representative query mix against the sf0.1 parquet tables
through a FAIR-scheduler pool per client (so one heavy client cannot
starve the rest — the multi-user deployment shape). Records per-client
per-query latency vs the N=1 baseline and aggregate queries/second.

Part B — reader during sustained ingest. One writer thread appends
micro-batches to a LakeTable as fast as it can; N reader threads run
snapshot aggregates against the same table. Records reader latency vs the
no-writer baseline and writer commits/s vs the no-reader baseline —
snapshot isolation means neither should collapse.

Usage: python tools/concurrency_bench.py [out_json]
Writes one JSON document (default /tmp/concurrency_r8.json) and prints a
summary line per configuration.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongodb_cdc_delta_spark.queries import all_queries  # noqa: E402
from mongodb_cdc_delta_spark.session import get_spark  # noqa: E402
from mongodb_cdc_delta_spark.sinks.table import LakeTable  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: the client mix: one representative per family, cheap enough that an
#: 8-client run finishes in minutes, expensive enough to contend for cores
MIX = [
    "pricing_summary",
    "star_join_revenue",
    "point_lookup",
    "sessionize",
    "knn_cosine_topk",
    "text_quality",
    "dedup_exact",
    "reconcile_counts",
]


def _client(spark, reg, rounds: int, pool: str, out: list[float]) -> None:
    sc = spark.sparkContext
    sc.setLocalProperty("spark.scheduler.pool", pool)
    try:
        for _ in range(rounds):
            for name in MIX:
                t0 = time.perf_counter()
                reg[name].fn(spark, SF_DIR).collect()
                out.append(time.perf_counter() - t0)
    finally:
        sc.setLocalProperty("spark.scheduler.pool", None)


def part_a(spark, reg) -> dict:
    results = {}
    for n in (1, 2, 4, 8):
        lat: list[list[float]] = [[] for _ in range(n)]
        threads = [
            threading.Thread(
                target=_client,
                args=(spark, reg, 2, f"client-{i}", lat[i]),
            )
            for i in range(n)
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        flat = [x for c in lat for x in c]
        results[str(n)] = {
            "clients": n,
            "queries": len(flat),
            "wall_s": round(wall, 2),
            "qps": round(len(flat) / wall, 2),
            "per_query_p50_s": round(statistics.median(flat), 3),
            "per_query_p95_s": round(
                sorted(flat)[int(0.95 * (len(flat) - 1))], 3
            ),
            "per_client_mix_mean_s": round(
                statistics.mean(sum(c) / 2 for c in lat), 2
            ),
        }
        print(json.dumps({"part": "A", **results[str(n)]}), flush=True)
    base = results["1"]["per_query_p50_s"]
    for r in results.values():
        r["p50_degradation_vs_1"] = round(r["per_query_p50_s"] / base, 2)
    return results


def _writer(table, df, stop: threading.Event, out: dict) -> None:
    i = 0
    t0 = time.perf_counter()
    while not stop.is_set():
        table.append(df, partition_by=[], txn=("conc-writer", i))
        i += 1
    out["commits"] = i
    out["commits_per_s"] = round(i / (time.perf_counter() - t0), 2)


def _reader(spark, table, duration: float, out: list[float]) -> None:
    sc = spark.sparkContext
    sc.setLocalProperty("spark.scheduler.pool", "readers")
    t0 = time.perf_counter()
    try:
        while time.perf_counter() - t0 < duration:
            q0 = time.perf_counter()
            table.read().groupBy("note").agg(
                {"qty": "sum", "_id": "count"}
            ).collect()
            out.append(time.perf_counter() - q0)
    finally:
        sc.setLocalProperty("spark.scheduler.pool", None)


def part_b(spark, duration: float = 25.0) -> dict:
    root = "/tmp/concurrency_table_r8"
    shutil.rmtree(root, ignore_errors=True)
    table = LakeTable(spark, root)
    df = spark.range(50_000).selectExpr(
        "id AS _id", "id % 97 AS qty", "CAST(id % 13 AS STRING) AS note"
    )
    seed = df.coalesce(4)
    table.append(seed, partition_by=[])
    batch = spark.range(2_000).selectExpr(
        "id AS _id", "id % 89 AS qty", "CAST(id % 13 AS STRING) AS note"
    ).coalesce(1)

    out: dict = {}
    # baseline: writer with NO readers
    stop = threading.Event()
    wstats: dict = {}
    wt = threading.Thread(target=_writer, args=(table, batch, stop, wstats))
    wt.start()
    time.sleep(duration / 2)
    stop.set()
    wt.join()
    out["writer_solo_commits_per_s"] = wstats["commits_per_s"]

    # combined: writer + 4 readers
    stop = threading.Event()
    wstats = {}
    rlat: list[list[float]] = [[] for _ in range(4)]
    wt = threading.Thread(target=_writer, args=(table, batch, stop, wstats))
    rts = [
        threading.Thread(target=_reader, args=(spark, table, duration, rlat[i]))
        for i in range(4)
    ]
    wt.start()
    for t in rts:
        t.start()
    for t in rts:
        t.join()
    stop.set()
    wt.join()
    flat = sorted(x for c in rlat for x in c)

    # reader baseline AFTER the writer stops, on the FINAL (largest)
    # table: an append-only writer grows the file count continuously, so
    # a pre-writer baseline confounds snapshot-isolation contention with
    # plain data growth. Comparing against the end-state table makes the
    # degradation number an UPPER bound on the contention effect.
    solo: list[float] = []
    _reader(spark, table, duration / 2, solo)
    out["reader_final_solo_p50_s"] = round(statistics.median(solo), 3)
    out["combined"] = {
        "readers": 4,
        "reader_queries": len(flat),
        "reader_p50_s": round(statistics.median(flat), 3),
        "reader_p95_s": round(flat[int(0.95 * (len(flat) - 1))], 3),
        "writer_commits_per_s": wstats["commits_per_s"],
        "reader_p50_vs_final_solo": round(
            statistics.median(flat) / out["reader_final_solo_p50_s"], 2
        ),
        "writer_rate_vs_solo": round(
            wstats["commits_per_s"] / out["writer_solo_commits_per_s"], 2
        ),
    }
    print(json.dumps({"part": "B", **out["combined"]}), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/concurrency_r8.json"
    spark = get_spark(
        app_name="concurrency-bench",
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = all_queries()
    # warm: JIT + parquet footer caches, so N=1 is a fair baseline
    for name in MIX:
        reg[name].fn(spark, SF_DIR).collect()
    result = {
        "sf_dir": SF_DIR,
        "scheduler": spark.conf.get("spark.scheduler.mode"),
        "read_only": part_a(spark, reg),
        "reader_writer": part_b(spark),
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result["read_only"]["8"]))
    spark.stop()


if __name__ == "__main__":
    main()
