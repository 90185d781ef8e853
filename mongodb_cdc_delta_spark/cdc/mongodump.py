"""``spark.read.format("mongodump")`` — bulk snapshot source for MongoDB
extended-JSON dumps (the ``mongoexport`` / ``mongodump --jsonArray``-less
line-delimited layout: ``<dir>/<db>/<collection>.json``, one document per
line).

Closes the reference's initial-load path for file dumps: the reference
bootstraps via Debezium snapshot mode (reference
config/kafka-connect/debezium-mongodb.json:9-11 ``snapshot.mode``), and a
live ``spark.read.format("mongodb")`` needs a connector jar this
environment cannot fetch. A dump directory is the other standard bulk
hand-off — this connector reads it with real parallelism and routes it
through the SAME ingestion path as streamed CDC events
(``CDCIngestor.snapshot_load``), so typing, metadata, schema evolution
and idempotence are identical to streaming.

Scale design:
- **Byte-range splits, newline-aligned.** One collection = one file in a
  dump, potentially hundreds of GB; per-file parallelism would serialize
  each collection into one task. Files are split into ``splitSizeMb``
  ranges; each reader seeks to its range start, discards the (partial)
  first line unless at offset 0, and reads one line PAST its range end —
  the standard text-splitting contract (every line is read exactly once,
  by the split containing its first byte).
- Provenance columns (db, collection) come from the path, so routing to
  per-collection tables needs no document inspection.
- The connector emits RAW document lines; extended-JSON normalization
  stays in the ingest pipeline (``normalize_extended_json``), exactly
  like the streaming path — one typing implementation, not two.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_DEFAULT_SPLIT_MB = 64


@dataclass
class _DumpSplit(InputPartition):
    path: str
    db: str
    collection: str
    start: int
    end: int  # exclusive range end; reader runs one line past it


def _discover(root: str) -> list[tuple[str, str, str]]:
    """(path, db, collection) for every ``<db>/<collection>.json`` under
    root; a bare ``.json`` file is treated as (file dir name, stem)."""
    out: list[tuple[str, str, str]] = []
    if os.path.isfile(root):
        db = os.path.basename(os.path.dirname(root)) or "dump"
        out.append((root, db, os.path.splitext(os.path.basename(root))[0]))
        return out
    for dirpath, _dirs, names in os.walk(root):
        for name in sorted(names):
            if not name.endswith(".json"):
                continue
            rel_db = os.path.relpath(dirpath, root)
            db = "dump" if rel_db == "." else rel_db.split(os.sep)[0]
            out.append(
                (
                    os.path.join(dirpath, name),
                    db,
                    os.path.splitext(name)[0],
                )
            )
    return out


class MongoDumpReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("mongodump source requires option 'path'")
        self.split_bytes = int(
            float(options.get("splitSizeMb", _DEFAULT_SPLIT_MB)) * 1024 * 1024
        )
        if self.split_bytes <= 0:
            raise ValueError("splitSizeMb must be positive")

    def partitions(self) -> list[_DumpSplit]:
        splits: list[_DumpSplit] = []
        for path, db, coll in _discover(self.root):
            size = os.path.getsize(path)
            if size == 0:
                continue
            start = 0
            while start < size:
                end = min(start + self.split_bytes, size)
                splits.append(_DumpSplit(path, db, coll, start, end))
                start = end
        if not splits:
            raise ValueError(f"no .json dump files under {self.root}")
        return splits

    def read(self, split: _DumpSplit) -> Iterator[tuple]:
        # Hadoop LineRecordReader contract: a non-first split always
        # discards its first line (partial OR complete — the previous
        # split read it by running one line past its end); a split reads
        # lines while the PRE-read position is <= its end, so a line
        # starting exactly at the boundary is read by the earlier split
        # and skipped by the later one. Every line is read exactly once.
        with open(split.path, "rb") as fh:
            fh.seek(split.start)
            if split.start > 0:
                fh.readline()
            while fh.tell() <= split.end:
                line = fh.readline()
                if not line:
                    break
                text = line.decode("utf-8").strip()
                if text:
                    yield (text, split.db, split.collection)


class MongoDumpDataSource(DataSource):
    """format("mongodump"): value/db/collection rows from a dump tree."""

    @classmethod
    def name(cls) -> str:
        return "mongodump"

    def schema(self) -> str:
        return "value string, db string, collection string"

    def reader(self, schema: StructType) -> MongoDumpReader:
        return MongoDumpReader(self.options)


def register_mongodump_source(spark) -> None:
    """Register format('mongodump') on this session. Re-registration is
    a silent replace in Spark (WARN, no error), so this needs no
    duplicate guard — and a genuine registration failure must surface
    here, not as an unrelated 'data source not found' later."""
    spark.dataSource.register(MongoDumpDataSource)
