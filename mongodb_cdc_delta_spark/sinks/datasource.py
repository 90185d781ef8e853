"""Python DataSource connector for LakeTable: ``spark.read.format("laketable")``
and ``spark.readStream.format("laketable")``.

Spark 4's Python DataSource API (pyspark.sql.datasource) lets the lake
format participate in the standard source surface (SURVEY §2.1 S8/S9)
without a JVM extension:

- **batch**: one InputPartition per active data file (so parallelism =
  file count exactly like the native path), deletion-vector filtering,
  ``version_as_of``/``timestamp_as_of`` time travel, and commit-log
  min/max stats used to SKIP whole files for pushed filters. All pushed
  filters are also returned as unsupported so Spark re-applies them —
  stats-based skipping stays a pure optimization and can never change
  results.
- **streaming**: an append-tail micro-batch source (SimpleDataSourceStream
  Reader). Offsets are commit versions — the table IS the write-ahead log,
  so exactly-once replay falls out of ``readBetweenOffsets``. Rewrite
  commits (COW update/delete) raise: tailing them as appends would
  double-count; OPTIMIZE/REPARTITION commits are dataChange=false and are
  skipped. This mirrors the Delta streaming source's append-only contract
  (its default without ignoreChanges); row-level change semantics live in
  LakeTable.read_changes / ChangeFeedTail.

The JVM-native ``LakeTable.read()`` remains the throughput path (parquet
scan + codegen); this connector exists for the *source API surface* —
streaming tails, third-party engines, and tests that want the format
behind plain ``spark.read``.

Metadata access uses ``LakeTable(None, root)``: the commit-log replay is
pure Python (no SparkSession), which is what makes this connector work
from inside data-source worker processes.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from .table import LakeTable



def _utc_aware(v: Any) -> Any:
    """pyarrow yields NAIVE datetimes for parquet timestamps; Spark's
    Python-DS row converter requires tz-aware values (it normalizes via
    astimezone). Table timestamps are written under the UTC session, so
    naive == UTC by construction."""
    import datetime as _dt

    if isinstance(v, _dt.datetime) and v.tzinfo is None:
        return v.replace(tzinfo=_dt.timezone.utc)
    return v


def _meta_table(options: dict) -> LakeTable:
    path = options.get("path")
    if not path:
        raise ValueError("laketable source requires option 'path'")
    return LakeTable(None, path)


def _snapshot(options: dict):
    t = _meta_table(options)
    v = options.get("version_as_of")
    ts = options.get("timestamp_as_of")
    return t._replay(
        version_as_of=int(v) if v is not None else None,
        timestamp_as_of=ts,
    )


@dataclass
class _FilePartition(InputPartition):
    path: str
    dv: tuple[int, ...]
    schema_idx: int


class LakeTableBatchReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.options = dict(options)
        self.snap = _snapshot(self.options)
        self.schema = schema
        self._filters: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        # keep simple single-column comparisons for stats-based file
        # skipping; EVERYTHING is returned as unsupported so Spark
        # re-applies each filter after the scan (skipping is advisory)
        for f in filters:
            if isinstance(
                f,
                (
                    EqualTo,
                    GreaterThan,
                    GreaterThanOrEqual,
                    LessThan,
                    LessThanOrEqual,
                    IsNotNull,
                ),
            ) and len(f.attribute) == 1:
                self._filters.append(f)
        return iter(filters)

    def _survives(self, stats: dict | None) -> bool:
        """Can this file contain rows matching every pushed filter?
        Conservative: missing/unknown stats → keep the file."""
        if not stats:
            return True
        mins = stats.get("minValues") or {}
        maxs = stats.get("maxValues") or {}
        nulls = stats.get("nullCount") or {}
        n = stats.get("numRecords")
        for f in self._filters:
            col = f.attribute[0]
            lo, hi = mins.get(col), maxs.get(col)
            try:
                if isinstance(f, IsNotNull):
                    if n is not None and nulls.get(col) == n:
                        return False
                    continue
                v = f.value
                if lo is None or hi is None or v is None:
                    continue
                if isinstance(f, EqualTo) and not (lo <= v <= hi):
                    return False
                if isinstance(f, GreaterThan) and not (hi > v):
                    return False
                if isinstance(f, GreaterThanOrEqual) and not (hi >= v):
                    return False
                if isinstance(f, LessThan) and not (lo < v):
                    return False
                if isinstance(f, LessThanOrEqual) and not (lo <= v):
                    return False
            except TypeError:
                continue  # incomparable types (e.g. str stat vs int): keep
        return True

    def partitions(self) -> list[InputPartition]:
        snap = self.snap
        parts = []
        for f in snap.files:
            if not self._survives((snap.file_stats or {}).get(f)):
                continue
            parts.append(
                _FilePartition(
                    path=os.path.join(self.options["path"], f),
                    dv=tuple((snap.file_dvs or {}).get(f, ())),
                    schema_idx=(snap.file_schema or {}).get(f, -1),
                )
            )
        return parts

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path)
        rows = tbl.to_pylist()
        dv = set(partition.dv)
        names = [f.name for f in self.schema.fields]
        for i, row in enumerate(rows):
            if i in dv:
                continue
            yield tuple(_utc_aware(row.get(n)) for n in names)


class LakeTableStreamReader(SimpleDataSourceStreamReader):
    """Append-tail streaming source; offset = last consumed version."""

    def __init__(self, options: dict, schema: StructType):
        self.options = dict(options)
        self.table = _meta_table(self.options)
        self.schema = schema

    def initialOffset(self) -> dict:
        start = int(self.options.get("starting_version", 0))
        return {"version": start - 1}

    def _rows_for_versions(self, versions: list[int]) -> list[tuple]:
        # returns a LIST: the Simple stream API prefetches on the driver
        # and copies the batch into its offset cache, so the result must
        # be a materialized (copyable) sequence, not a generator. Bounded
        # by the change volume between two micro-batches by construction.
        import pyarrow.parquet as pq

        names = [f.name for f in self.schema.fields]
        out: list[tuple] = []
        for v in versions:
            c = self.table._read_commit(v)
            if c.operation in LakeTable._REARRANGE_OPS:
                continue
            if c.remove or c.dv:
                raise ValueError(
                    f"laketable streaming source is append-only; commit "
                    f"{v} ({c.operation}) rewrites or deletes rows. Use "
                    "LakeTable.read_changes/ChangeFeedTail for row-level "
                    "change semantics."
                )
            for a in c.add:
                tbl = pq.read_table(
                    os.path.join(self.options["path"], a["path"])
                )
                for row in tbl.to_pylist():
                    out.append(
                        tuple(_utc_aware(row.get(n)) for n in names)
                    )
        return out

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        # iter(list): the runner copies AND advances the returned iterator
        # for its prefetch cache, so it must be a copyable iterator (a
        # list iterator is; a generator is not)
        latest = self.table.version()
        start_v = int(start["version"])
        if latest <= start_v:
            return iter([]), dict(start)
        versions = [
            v for v in self.table._versions() if start_v < v <= latest
        ]
        return iter(self._rows_for_versions(versions)), {"version": latest}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        lo, hi = int(start["version"]), int(end["version"])
        versions = [v for v in self.table._versions() if lo < v <= hi]
        return iter(self._rows_for_versions(versions))

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream checkpoint; nothing to ack


class LakeTableDataSource(DataSource):
    """format("laketable"): options path, version_as_of, timestamp_as_of
    (batch) / starting_version (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "laketable"

    def schema(self) -> StructType:
        snap = _snapshot(self.options)
        if snap.schema is None:
            raise ValueError(
                f"laketable at {self.options.get('path')} has no commits"
            )
        return snap.schema

    def reader(self, schema: StructType) -> DataSourceReader:
        return LakeTableBatchReader(self.options, schema)

    def simpleStreamReader(
        self, schema: StructType
    ) -> SimpleDataSourceStreamReader:
        return LakeTableStreamReader(self.options, schema)


def register_lake_source(spark) -> None:
    """Idempotently register format('laketable') on this session."""
    try:
        # stats-based file skipping needs the Python-DS pushdown channel
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # non-settable: reader still works, just scans every file
    spark.dataSource.register(LakeTableDataSource)
