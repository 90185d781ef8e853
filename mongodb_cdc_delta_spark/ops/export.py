"""Corpus export: deterministic sharded JSONL + manifest.

Training pipelines hand corpora downstream as fixed shard counts of JSONL
(one doc per line) plus a manifest recording per-shard row/byte counts —
the contract loaders and data-mixing configs consume. The export is
deterministic end to end: shard assignment is a key hash (reruns place
every row in the same shard) and rows within a shard are written in key
order (reruns produce byte-identical files), so shards can be diffed,
cached, and resumed safely.

Scale shape: one hash repartition to n_shards (each task owns exactly one
shard → exactly one output file per shard directory), sort within
partitions only (no global sort), manifest computed as one aggregate over
the same frame.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST_NAME = "manifest.json"


def export_sharded_jsonl(
    df: DataFrame,
    path: str,
    key: str,
    n_shards: int = 16,
) -> dict:
    """Write ``df`` as ``n_shards`` JSONL shard directories under ``path``
    (``shard=NN/part-*.json``) plus a ``manifest.json``; returns the
    manifest dict ``{shard: {"rows": n, "bytes": b}}`` (bytes = sum of
    JSON line lengths, excluding newlines)."""
    if "shard" in df.columns:
        raise ValueError(
            "'shard' is a reserved column name for sharded export — "
            "rename it first (it would be clobbered by the shard id)"
        )
    shard = F.pmod(F.xxhash64(F.col(key)), F.lit(n_shards)).cast("int")
    with_shard = df.withColumn("shard", shard)
    # sort by EVERY column, not just the key: sortWithinPartitions(key)
    # alone is not a total order, and tie order would follow shuffle-fetch
    # arrival — nondeterministic on a real cluster (identical full rows
    # may still swap, which is byte-invisible)
    order_cols = [key] + [c for c in df.columns if c != key]
    (
        with_shard.repartition(n_shards, "shard")
        .sortWithinPartitions(*order_cols)
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(path)
    )
    # manifest from the files actually written (never a second df job —
    # a separate pre-write aggregate could disagree with the materialized
    # shards if the lineage reads a moving source, and it recomputes the
    # corpus). bytes = JSON line lengths (file size minus one newline per
    # row). Local-filesystem paths; for object stores swap in the
    # FileSystem client.
    manifest = {}
    for d in os.listdir(path):
        if not d.startswith("shard="):
            continue
        sid = int(d.split("=", 1)[1])
        rows = size = 0
        for fn in os.listdir(os.path.join(path, d)):
            if not (fn.startswith("part-") and fn.endswith(".json")):
                continue
            fp = os.path.join(path, d, fn)
            size += os.path.getsize(fp)
            with open(fp, "rb") as f:
                rows += sum(1 for _ in f)
        manifest[sid] = {"rows": rows, "bytes": size - rows}
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(
            {
                "n_shards": n_shards,
                "key": key,
                "total_rows": sum(m["rows"] for m in manifest.values()),
                "shards": {str(k): v for k, v in sorted(manifest.items())},
            },
            f,
            indent=2,
            sort_keys=True,
        )
    return manifest


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        return json.load(f)


def read_sharded_jsonl(
    spark,
    path: str,
    validate: bool = True,
) -> DataFrame:
    """Read a sharded-JSONL corpus written by :func:`export_sharded_jsonl`.

    With ``validate=True`` the row count is checked against the manifest —
    a cheap end-to-end integrity gate for corpus hand-offs (a lost or
    truncated shard surfaces immediately instead of as silently missing
    training data)."""
    df = spark.read.json(path)
    if "shard" in df.columns:
        df = df.drop("shard")  # partition column re-materialized by read
    if validate:
        manifest = read_manifest(path)
        got = df.count()
        want = manifest["total_rows"]
        if got != want:
            raise ValueError(
                f"sharded corpus at {path} has {got} rows; manifest "
                f"promises {want} — a shard is missing or truncated"
            )
    return df
