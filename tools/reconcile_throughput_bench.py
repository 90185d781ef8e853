"""Reconciliation throughput vs the 1 TB < 6 h target (r7 verdict item 7).

The reference's capacity analysis publishes ~46 MB/s with 8 workers for
full-table reconciliation (research.md:773-786; spec.md:349 SC: 1 TB in
under 6 h ~= 48.5 MB/s sustained). This harness runs the full C4→C6 path
END-TO-END at the 10x dataset scale:

  source parquet scan → record_diff (full outer join + row hashes)
  → repair_plan → apply_repair (MERGE into a LakeTable)

with a seeded discrepancy mix (missing / extra / field-mismatch rows),
measures wall clock and the actual bytes scanned (both sides' parquet
sizes), reports MB/s, and extrapolates to 1 TB. Also times the cheap
tiers (count_compare, bucket_hash_compare) that a scheduled reconcile
runs far more often.

Usage: python tools/reconcile_throughput_bench.py [scale_dir] [out_json]
Defaults: /tmp/scale10, /tmp/reconcile_tp_r8.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mongodb_cdc_delta_spark.reconcile.engine import (  # noqa: E402
    apply_repair,
    bucket_hash_compare,
    count_compare,
    record_diff,
    repair_plan,
)
from mongodb_cdc_delta_spark.session import get_spark  # noqa: E402
from mongodb_cdc_delta_spark.sinks.table import LakeTable  # noqa: E402


def main() -> None:
    scale_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10"
    out_path = (
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/reconcile_tp_r8.json"
    )
    src_path = os.path.join(scale_dir, "lineitem.parquet")
    spark = get_spark(app_name="reconcile-throughput")
    spark.sparkContext.setLogLevel("ERROR")

    key = "l_orderkey"
    compare_cols = ["l_quantity", "l_extendedprice", "l_discount"]
    # the diff needs a unique key: collapse lineitem to one row per order
    src = (
        spark.read.parquet(src_path)
        .groupBy(key)
        .agg(
            F.sum("l_quantity").alias("l_quantity"),
            F.sum("l_extendedprice").alias("l_extendedprice"),
            F.max("l_discount").alias("l_discount"),
        )
    )
    n_src = src.count()

    # target = source with a seeded discrepancy mix: drop ~1% (missing),
    # perturb ~1% (mismatch), inject ~0.5% extras
    bucket = F.pmod(F.xxhash64(key), F.lit(1000))
    tgt = (
        src.where(bucket >= 10)  # 1% missing_in_target
        .withColumn(
            "l_quantity",
            F.when(
                bucket < 20, F.col("l_quantity") + 1  # 1% mismatch
            ).otherwise(F.col("l_quantity")),
        )
    )
    extras = src.where(bucket < 5).select(
        (F.col(key) + F.lit(10_000_000_000)).alias(key),
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    tgt = tgt.unionByName(extras)

    # materialize the target as a LakeTable (the repair sink)
    lake_root = "/tmp/reconcile_tp_table_r8"
    shutil.rmtree(lake_root, ignore_errors=True)
    table = LakeTable(spark, lake_root)
    table.append(tgt, partition_by=[])

    src_bytes = os.path.getsize(src_path)
    tgt_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(lake_root)
        for f in fs
        if f.endswith(".parquet")
    )

    result = {
        "scale_dir": scale_dir,
        "source_rows": n_src,
        "scanned_mb": round((src_bytes + tgt_bytes) / 1e6, 1),
    }

    # tier 1: count compare
    t0 = time.perf_counter()
    count_compare(src, table.read(), key, n_buckets=64).collect()
    result["count_compare_s"] = round(time.perf_counter() - t0, 2)

    # tier 2: bucket hash compare
    t0 = time.perf_counter()
    bucket_hash_compare(
        src, table.read(), key, compare_cols, n_buckets=64
    ).collect()
    result["bucket_hash_s"] = round(time.perf_counter() - t0, 2)

    # tier 3: full record diff -> plan -> MERGE repair, timed end to end
    t0 = time.perf_counter()
    diff = record_diff(src, table.read(), key, compare_cols).where(
        F.col("status") != "match"
    )
    plan = repair_plan(diff, key, compare_cols)
    rep = apply_repair(table, plan, key)
    e2e = time.perf_counter() - t0
    result["repair"] = {k: rep[k] for k in sorted(rep) if k != "version"}
    result["diff_repair_s"] = round(e2e, 2)

    # verify convergence: a second diff must be empty
    t0 = time.perf_counter()
    residual = (
        record_diff(src, table.read(), key, compare_cols)
        .where(F.col("status") != "match")
        .count()
    )
    result["verify_s"] = round(time.perf_counter() - t0, 2)
    result["residual_diffs"] = residual

    total_s = (
        result["count_compare_s"]
        + result["bucket_hash_s"]
        + result["diff_repair_s"]
    )
    mbps = result["scanned_mb"] / result["diff_repair_s"]
    result["diff_repair_mb_per_s"] = round(mbps, 1)
    result["full_path_mb_per_s"] = round(result["scanned_mb"] / total_s, 1)
    result["extrapolated_1tb_hours"] = round(1e6 / mbps / 3600, 2)
    result["target_1tb_hours"] = 6.0

    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    shutil.rmtree(lake_root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
