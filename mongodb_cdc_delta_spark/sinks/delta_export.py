"""Delta-protocol export: make LakeTable snapshots readable by ANY Delta
reader (DuckDB ``delta_scan``, delta-rs, Spark+delta, Trino).

The reference's analytics read contract is DuckDB ``delta_scan`` over the
tables its writer maintains (reference: README.md:78 "query the Delta
tables directly", specs/001-mongodb-cdc-delta/research.md:546-615 —
delta_scan file skipping, partition pruning, time travel). LakeTable is a
capability-parity format (delta-spark is absent in this environment, see
sinks/table.py:1-32), so nothing outside this repo could read its tables;
this module closes that read surface by emitting a real ``_delta_log``.

Design — a converter, not a fork of the write path:

- ``export_delta(table, dest)`` publishes the CURRENT (or time-travel)
  snapshot as Delta commit 0: ``protocol`` + ``metaData`` + one ``add``
  per active file, with Delta-format per-file stats (numRecords /
  minValues / maxValues / nullCount) carried over from the commit log so
  Delta readers get the same data skipping LakeTable's own reader has.
- **Zero-copy fast path**: an active file whose write-schema equals the
  snapshot schema and that carries no deletion vector is hard-linked
  (fallback: copied) into the export — no data rewrite, O(metadata) per
  file. Files needing a cast (written under an older schema) or DV
  subtraction are rewritten through the table's own read path, so the
  export is always plain parquet + protocol 1/2 — readable by every
  Delta reader ever shipped, with no DV or column-mapping table features
  required.
- ``sync_delta(table, dest)`` appends ONE Delta commit containing only
  the add/remove delta vs the last export — O(changed files), driven by
  comparing active-file sets, never by diffing data. The exported
  LakeTable version rides in the commit's ``txn`` action
  (appId ``lake-export``), the same idempotence device Delta writers use
  for streaming exactly-once.
- Hive partition layout is preserved verbatim: LakeTable data files never
  contain partition columns (they live in the directory name), exactly
  what the Delta spec expects — partition values are re-derived from the
  path into each ``add.partitionValues``.

Scale (100 TB): export cost is O(active files) metadata plus rewrite cost
for only the cast/DV files; the common steady-state (single current
schema, deletes already compacted) is pure hard links. ``sync_delta``
touches only changed files, so a scheduled export tails the table at
O(changes) per tick — the same shape as the incremental reconciler.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import urllib.parse
import uuid
from typing import Any

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .table import LakeTable, Snapshot, _collect_file_stats, _partition_values

_LOG = "_delta_log"
_STATE = "_lake_export_state.json"  # sidecar at dest root (not in _delta_log)
_TXN_APP = "lake-export"


def _delta_path(rel: str) -> str:
    """Relative path, URL-encoded per segment (Delta spec: RFC 2396).

    ``=`` stays literal — Delta writers emit hive dirs as ``col=value``
    in add paths and readers resolve them verbatim; only genuinely unsafe
    characters (spaces, control chars) are percent-encoded."""
    return "/".join(
        urllib.parse.quote(seg, safe="=") for seg in rel.split(os.sep)
    )


def _commit_file(dest: str, version: int) -> str:
    return os.path.join(dest, _LOG, f"{version:020d}.json")


class ConcurrentExportError(Exception):
    """The target Delta commit version is already published."""


def _write_commit(dest: str, version: int, actions: list[dict]) -> str:
    """Publish one commit file with put-if-absent semantics (os.link
    fails with EEXIST) — the Delta protocol forbids rewriting a
    published commit, and a crashed/concurrent exporter must surface a
    version collision instead of silently mutating history an external
    reader may already have consumed."""
    os.makedirs(os.path.join(dest, _LOG), exist_ok=True)
    path = _commit_file(dest, version)
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    try:
        os.link(tmp, path)
    except FileExistsError as e:
        raise ConcurrentExportError(
            f"delta commit {version} already published at {dest}"
        ) from e
    finally:
        os.unlink(tmp)
    return path


def _metadata_action(
    schema: StructType,
    partition_by: list[str],
    table_id: str,
    configuration: dict[str, str] | None = None,
) -> dict:
    return {
        "metaData": {
            "id": table_id,
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema.jsonValue()),
            "partitionColumns": list(partition_by),
            "configuration": dict(configuration or {}),
            "createdTime": int(time.time() * 1000),
        }
    }


def _add_action(rel: str, abs_path: str, stats: dict | None) -> dict:
    entry: dict[str, Any] = {
        "path": _delta_path(rel),
        "partitionValues": _partition_values(rel),
        "size": os.path.getsize(abs_path),
        "modificationTime": int(os.path.getmtime(abs_path) * 1000),
        "dataChange": True,
    }
    if stats and "numRecords" in stats:
        entry["stats"] = json.dumps(
            {
                "numRecords": stats["numRecords"],
                "minValues": stats.get("minValues", {}),
                "maxValues": stats.get("maxValues", {}),
                "nullCount": stats.get("nullCount", {}),
            }
        )
    return {"add": entry}


def _remove_action(delta_rel: str) -> dict:
    return {
        "remove": {
            "path": delta_rel,
            "deletionTimestamp": int(time.time() * 1000),
            "dataChange": True,
        }
    }


def _place_file(src: str, dst: str) -> None:
    """Idempotently materialize ``src`` at ``dst`` (hard link, else copy).

    Must tolerate ``dst`` already existing: a crash between file placement
    and commit publish — or a delete→sync→restore→sync sequence whose old
    link was never vacuumed — retries the same placement, and a bare
    ``os.link`` would raise EEXIST while the ``shutil.copy2`` fallback
    would raise SameFileError on the same inode, wedging every export()
    retry. Same-inode dst is already the desired state; a different
    existing dst is replaced atomically via a temp name + ``os.replace``.
    """
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if os.path.exists(dst):
        try:
            if os.path.samefile(src, dst):
                return  # already linked (crash-retry or restore re-link)
        except OSError:
            pass  # dst vanished or unstatable: fall through and replace
    tmp = f"{dst}.__place_{os.getpid()}__"
    try:
        try:
            os.link(src, tmp)  # zero-copy when same filesystem
        except OSError:
            shutil.copy2(src, tmp)
        os.replace(tmp, dst)
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _dv_fingerprint(positions: list[int]) -> list:
    """[count, md5-of-sorted-positions]: collision-proof DV identity.
    A (len, sum) pair can collide across restore()+re-delete sequences
    (two different position sets with equal cardinality and sum would
    silently skip re-export); the digest cannot."""
    import hashlib

    digest = hashlib.md5(
        json.dumps(sorted(int(p) for p in positions)).encode()
    ).hexdigest()
    return [len(positions), digest]


def _state_from_snapshot(snap: Snapshot) -> dict:
    return {
        "lake_version": snap.version,
        "schema_json": snap.schemas[-1] if snap.schemas else None,
        "dvs": {
            k: _dv_fingerprint(v) for k, v in snap.file_dvs.items() if v
        },
    }


def _rebuild_state_from_log(dest: str) -> dict | None:
    """Reconstruct the exporter sidecar from the published log alone.

    Every commit's commitInfo.operationParameters carries the mapping
    delta (``lakeMapping`` added entries / ``lakeRemoved`` dropped lake
    files), the lake version, and the DV fingerprints as of that commit
    — so a crash between commit publish and sidecar save loses nothing:
    the sidecar is a pure cache of this replay."""
    log_dir = os.path.join(dest, _LOG)
    if not os.path.isdir(log_dir):
        return None
    versions = sorted(
        int(n[:-5])
        for n in os.listdir(log_dir)
        if n.endswith(".json") and n[:-5].isdigit()
    )
    if not versions:
        return None
    mapping: dict[str, list[str]] = {}
    state: dict[str, Any] = {"mapping": mapping}
    for v in versions:
        with open(_commit_file(dest, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "commitInfo" in action:
                    params = action["commitInfo"].get(
                        "operationParameters", {}
                    )
                    if "lakeRemoved" in params:
                        for f in json.loads(params["lakeRemoved"]):
                            mapping.pop(f, None)
                    if "lakeMapping" in params:
                        mapping.update(json.loads(params["lakeMapping"]))
                    if "lakeDvs" in params:
                        state["dvs"] = json.loads(params["lakeDvs"])
                elif "txn" in action and action["txn"]["appId"] == _TXN_APP:
                    state["lake_version"] = action["txn"]["version"]
                elif "metaData" in action:
                    state["table_id"] = action["metaData"]["id"]
                    state["schema_json"] = json.loads(
                        action["metaData"]["schemaString"]
                    )
    state["delta_version"] = versions[-1]
    state.setdefault("dvs", {})
    if "lake_version" not in state or "table_id" not in state:
        return None  # not an export this module wrote
    return state


def _load_state(dest: str) -> dict | None:
    """Sidecar if fresh, else rebuilt from the log. The sidecar can lag
    the log by exactly one commit (crash between _write_commit and
    _save_state); the log is always authoritative."""
    log_dir = os.path.join(dest, _LOG)
    log_versions = (
        sorted(
            int(n[:-5])
            for n in os.listdir(log_dir)
            if n.endswith(".json") and n[:-5].isdigit()
        )
        if os.path.isdir(log_dir)
        else []
    )
    p = os.path.join(dest, _STATE)
    if os.path.exists(p):
        with open(p) as fh:
            state = json.load(fh)
        if log_versions and state.get("delta_version") == log_versions[-1]:
            return state
    return _rebuild_state_from_log(dest)


def _save_state(dest: str, state: dict) -> None:
    p = os.path.join(dest, _STATE)
    tmp = p + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.rename(tmp, p)


def _strip_soft_fields(node):
    """Schema JSON with nullability and metadata removed, recursively —
    the parts of a Spark schema that do NOT change how parquet bytes are
    decoded. Two schemas equal under this projection are read-compatible:
    a file written under one scans correctly under the other."""
    if isinstance(node, dict):
        return {
            k: _strip_soft_fields(v)
            for k, v in node.items()
            if k not in ("nullable", "metadata")
        }
    if isinstance(node, list):
        return [_strip_soft_fields(x) for x in node]
    return node


def _norm_schema(schema_json: dict | None) -> dict | None:
    """Canonical form for schema-change detection: StructType round-trip.

    ``StructType.fromJson(...).jsonValue()`` normalizes representation
    details (absent vs empty field ``metadata``, key ordering) without
    erasing semantic differences — nullability and type changes still
    compare unequal. Both comparison sides go through this ONE function
    so a sidecar rebuilt from the published metaData schemaString equals
    the lake log's raw schema JSON whenever they describe one schema."""
    if schema_json is None:
        return None
    try:
        return StructType.fromJson(schema_json).jsonValue()
    except Exception:
        return schema_json  # unparseable → fall back to raw comparison


class DeltaExporter:
    """Exports LakeTable snapshots to a Delta-protocol table directory.

    ``change_data=True`` additionally publishes the Delta Change Data
    Feed contract: ``delta.enableChangeDataFeed`` in the table
    configuration, and per-sync ``cdc`` actions pointing at
    ``_change_data/`` parquet files carrying the exact row-level
    changes (from ``LakeTable.read_changes``) with ``_change_type``.
    CDF-aware readers then tail changes at sync granularity; commits
    whose add/remove churn is pure file rearrangement (OPTIMIZE swaps)
    carry an EMPTY cdc file, which per the protocol overrides
    add/remove derivation — so compaction never masquerades as
    delete+insert downstream.

    Granularity note: one sync = one Delta commit = one CDF
    transaction. Lake versions folded into the same sync window lose
    their relative order (the same multiset-per-commit semantics as a
    single large MERGE commit in Delta itself); a consumer that needs
    per-lake-version ordering should sync per version — the scheduled
    exporter at a short cadence approximates that, and sync is
    idempotent so over-calling is free."""

    def __init__(
        self, table: LakeTable, dest: str, change_data: bool = False
    ):
        self.table = table
        self.dest = dest
        self.change_data = change_data

    def _configuration(self) -> dict[str, str]:
        return (
            {"delta.enableChangeDataFeed": "true"}
            if self.change_data
            else {}
        )

    def _write_change_data(
        self, snap: Snapshot, from_lake_v: int, to_lake_v: int
    ) -> list[dict]:
        """Write this sync's row-level changes under ``_change_data/``
        and return the ``cdc`` actions. One hive-partitioned batched
        write — cost is O(changed rows), the same data sync's rewrites
        would touch. An empty change set still writes one empty cdc
        file: per the protocol a commit containing ANY cdc action is
        described by its cdc files alone, which is exactly what makes a
        rearrangement-only sync read as 'no changes'."""
        changes = self.table.read_changes(from_lake_v, to_lake_v).drop(
            "_commit_version", "_commit_timestamp"
        )
        if to_lake_v > from_lake_v:
            # A multi-version sync window collapses N lake commits into
            # ONE delta commit, and a delta commit's cdc files describe a
            # SINGLE state transition — the rows carry no ordering. Raw
            # concatenation would emit both the insert and the delete of
            # a row churned inside the window (insert@v1, delete@v2) and
            # a consumer folding the commit could resurrect it. The
            # spec-correct content is the commit's NET effect: multiset
            # difference of the window's inserts and deletes (equal-value
            # pairs cancel regardless of intra-window order, because
            # presence before/after the window is what the delta commit
            # actually changes). Single-version windows are already net
            # by construction (read_changes exceptAlls within a commit).
            ins = changes.where(
                F.col("_change_type") == "insert"
            ).drop("_change_type")
            dels = changes.where(
                F.col("_change_type") == "delete"
            ).drop("_change_type")
            changes = ins.exceptAll(dels).select(
                "*", F.lit("insert").alias("_change_type")
            ).unionByName(
                dels.exceptAll(ins).select(
                    "*", F.lit("delete").alias("_change_type")
                )
            )
        part_cols = [
            c
            for c in snap.partition_by
            if snap.schema is not None and c in snap.schema.names
        ]
        stage = os.path.join(self.dest, "_tmp_cdc", uuid.uuid4().hex)
        writer = changes.write.mode("overwrite")
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.parquet(stage)
        actions: list[dict] = []
        for dirpath, _dirs, names in sorted(os.walk(stage)):
            for name in sorted(names):
                if not name.endswith(".parquet"):
                    continue
                rel_dir = os.path.relpath(dirpath, stage)
                rel_dir = "" if rel_dir == "." else rel_dir
                new_rel = os.path.join(
                    "_change_data",
                    rel_dir,
                    f"cdc-{uuid.uuid4().hex}.parquet",
                ) if rel_dir else os.path.join(
                    "_change_data", f"cdc-{uuid.uuid4().hex}.parquet"
                )
                dst = os.path.join(self.dest, new_rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                os.rename(os.path.join(dirpath, name), dst)
                actions.append(
                    {
                        "cdc": {
                            "path": _delta_path(new_rel),
                            "partitionValues": _partition_values(new_rel),
                            "size": os.path.getsize(dst),
                            "dataChange": False,
                        }
                    }
                )
        shutil.rmtree(
            os.path.join(self.dest, "_tmp_cdc"), ignore_errors=True
        )
        if not actions:
            # partitionBy of an empty frame writes nothing: emit one
            # empty unpartitioned cdc file so the action set is non-empty
            empty_rel = os.path.join(
                "_change_data", f"cdc-{uuid.uuid4().hex}.parquet"
            )
            dst = os.path.join(self.dest, empty_rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            import pyarrow as pa
            import pyarrow.parquet as pq

            pq.write_table(
                pa.table({"_change_type": pa.array([], pa.string())}), dst
            )
            actions.append(
                {
                    "cdc": {
                        "path": _delta_path(empty_rel),
                        "partitionValues": {},
                        "size": os.path.getsize(dst),
                        "dataChange": False,
                    }
                }
            )
        return actions

    # -- internals ---------------------------------------------------------

    def _current_schema_idx(self, snap: Snapshot) -> int:
        return len(snap.schemas) - 1

    def _fast_path_ok(self, snap: Snapshot, rel: str) -> bool:
        """Hard-linkable: no DV, and the file's write schema is
        read-compatible with the snapshot schema — every column the file
        contains has the IDENTICAL (soft-stripped) type under the same
        name in the snapshot schema. Nullability-only evolution and
        added-column evolution keep the link (Delta readers null-fill
        missing columns by name); type widening forces a rewrite (the
        old bytes cannot decode as the new type)."""
        if snap.file_dvs.get(rel):
            return False
        write = snap.schemas[snap.file_schema[rel]]
        current = snap.schemas[self._current_schema_idx(snap)]
        cur_types = {
            f["name"]: _strip_soft_fields(f["type"])
            for f in current.get("fields", [])
        }
        return all(
            f["name"] in cur_types
            and _strip_soft_fields(f["type"]) == cur_types[f["name"]]
            for f in write.get("fields", [])
        )

    def _export_files(
        self, snap: Snapshot, rels: list[str]
    ) -> tuple[list[dict], dict[str, list[str]]]:
        """Materialize ``rels`` into the export dir.

        Returns (add actions, lake-file → exported delta paths mapping).
        Fast-path files hard-link 1:1; the rest are rewritten THROUGH the
        table's reader (applies schema cast + DV subtraction) in one
        batched write, then attributed back to their source partition —
        rewrites are grouped per partition so attribution is exact.
        """
        adds: list[dict] = []
        mapping: dict[str, list[str]] = {}
        slow: list[str] = []
        for rel in rels:
            if self._fast_path_ok(snap, rel):
                dst = os.path.join(self.dest, rel)
                _place_file(os.path.join(self.table.root, rel), dst)
                adds.append(
                    _add_action(rel, dst, snap.file_stats.get(rel))
                )
                mapping[rel] = [_delta_path(rel)]
            else:
                slow.append(rel)
        for rel in slow:
            adds_f, delta_paths = self._rewrite_one(snap, rel)
            adds.extend(adds_f)
            mapping[rel] = delta_paths
        return adds, mapping

    def _rewrite_one(
        self, snap: Snapshot, rel: str
    ) -> tuple[list[dict], list[str]]:
        """Rewrite ONE source file (cast to snapshot schema, DV applied)
        into its partition dir at the destination. Per-file granularity
        keeps the lake-file → delta-file mapping exact, which is what
        makes ``sync_delta`` O(changed files); rewrites happen only for
        legacy-schema or DV-carrying files, so this path is cold."""
        df = self.table._read_file_groups(snap, [rel], snap.schema)
        # partition columns live in the directory name, not the data file
        part_cols = [
            c for c in snap.partition_by if c in (snap.schema or []).names
        ]
        out_df = df.drop(*part_cols) if part_cols else df
        stage = os.path.join(
            self.dest, "_tmp_export", uuid.uuid4().hex
        )
        out_df.coalesce(1).write.mode("overwrite").parquet(stage)
        part_dir = os.path.dirname(rel)
        adds: list[dict] = []
        paths: list[str] = []
        n = 0
        for name in sorted(os.listdir(stage)):
            if not name.endswith(".parquet"):
                continue
            new_rel = os.path.join(
                part_dir, f"part-export-{uuid.uuid4().hex}-{n:03d}.parquet"
            ) if part_dir else f"part-export-{uuid.uuid4().hex}-{n:03d}.parquet"
            n += 1
            dst = os.path.join(self.dest, new_rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(os.path.join(stage, name), dst)
            adds.append(_add_action(new_rel, dst, _collect_file_stats(dst)))
            paths.append(_delta_path(new_rel))
        shutil.rmtree(
            os.path.join(self.dest, "_tmp_export"), ignore_errors=True
        )
        return adds, paths

    # -- public API --------------------------------------------------------

    def export(
        self,
        version_as_of: int | None = None,
        timestamp_as_of: str | int | None = None,
    ) -> dict[str, Any]:
        """Full snapshot export as Delta commit 0. Fails if ``dest``
        already holds a Delta log (use :meth:`sync` to advance one)."""
        if os.path.exists(_commit_file(self.dest, 0)):
            raise ValueError(
                f"{self.dest} already contains a Delta log; use sync()"
            )
        snap = self.table._replay(version_as_of, timestamp_as_of)
        if snap.schema is None:
            raise ValueError(f"table does not exist: {self.table.root}")
        os.makedirs(self.dest, exist_ok=True)
        table_id = uuid.uuid4().hex
        adds, mapping = self._export_files(snap, snap.files)
        base = _state_from_snapshot(snap)
        actions = [
            {
                "commitInfo": {
                    "timestamp": int(time.time() * 1000),
                    "operation": "CONVERT",
                    "operationParameters": {
                        "sourceFormat": "laketable",
                        "sourceVersion": str(snap.version),
                        # sidecar-recovery payload (see
                        # _rebuild_state_from_log)
                        "lakeMapping": json.dumps(mapping),
                        "lakeRemoved": json.dumps([]),
                        "lakeDvs": json.dumps(base["dvs"]),
                    },
                }
            },
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            _metadata_action(
                snap.schema, snap.partition_by, table_id,
                self._configuration(),
            ),
            {"txn": {"appId": _TXN_APP, "version": snap.version}},
            *adds,
        ]
        _write_commit(self.dest, 0, actions)
        _save_state(
            self.dest,
            {
                **base,
                "table_id": table_id,
                "delta_version": 0,
                "mapping": mapping,
            },
        )
        return {
            "delta_version": 0,
            "lake_version": snap.version,
            "files": len(adds),
            "linked": sum(
                1 for f in snap.files if self._fast_path_ok(snap, f)
            ),
            "rewritten": sum(
                1 for f in snap.files if not self._fast_path_ok(snap, f)
            ),
        }

    def sync(self) -> dict[str, Any]:
        """Advance the export to the table's current version with ONE
        Delta commit containing only the changed files. Idempotent: a
        sync at an already-exported version is a no-op."""
        state = _load_state(self.dest)
        if state is None:
            raise ValueError(
                f"{self.dest} has no export state; run export() first"
            )
        snap = self.table._replay()
        if snap.version == state["lake_version"]:
            return {
                "delta_version": state["delta_version"],
                "lake_version": snap.version,
                "added": 0,
                "removed": 0,
                "noop": True,
            }
        mapping: dict[str, list[str]] = dict(state["mapping"])
        old_dvs: dict[str, list] = dict(state.get("dvs", {}))
        # Compare through ONE normalization: after a sidecar loss the
        # rebuilt schema_json comes from the metaData schemaString (a
        # StructType.fromJson→jsonValue round-trip that adds e.g. empty
        # field metadata), so raw dict equality against the lake log's
        # schema JSON would flag a spurious schema change and re-rewrite
        # every previously-rewritten file.
        schema_changed = (
            _norm_schema(snap.schemas[-1])
            != _norm_schema(state.get("schema_json"))
            if snap.schemas
            else False
        )

        active = set(snap.files)
        exported = set(mapping)
        # a previously-exported file must be re-exported when its DV
        # changed (its visible rows changed) or — after a schema change —
        # when it was fast-pathed under a schema that is no longer the
        # snapshot schema (Delta readers apply ONE schema to all files)
        new_dvs = {
            f: _dv_fingerprint(v) for f, v in snap.file_dvs.items() if v
        }
        changed = {
            f
            for f in (active & exported)
            if new_dvs.get(f) != old_dvs.get(f)
        }
        if schema_changed:
            # linked files still read-compatible with the NEW schema keep
            # their link (bytes unchanged; Delta readers null-fill added
            # columns by name). Anything else — a file that now needs a
            # cast, or one previously REWRITTEN under the old schema
            # (its exported bytes were cast to a schema that no longer
            # matches) — must be re-exported.
            changed |= {
                f
                for f in (active & exported)
                if not self._fast_path_ok(snap, f)
                or mapping.get(f) != [_delta_path(f)]
            }
        new_files = sorted((active - exported) | changed)
        gone_files = sorted((exported - active) | changed)

        adds, new_mapping = self._export_files(snap, new_files)
        # The Delta protocol forbids add+remove of the SAME path within
        # one version. A restored file that keeps its fast-path link
        # re-exports under its original delta path, landing in both
        # gone_files (old link) and new_files (re-add): drop the remove —
        # the add alone conveys the identical net state.
        added_paths = {a["add"]["path"] for a in adds}
        removes = [
            _remove_action(p)
            for f in gone_files
            for p in mapping[f]
            if p not in added_paths
        ]
        for f in gone_files:
            mapping.pop(f, None)
        mapping.update(new_mapping)

        delta_version = state["delta_version"] + 1
        actions = [
            {
                "commitInfo": {
                    "timestamp": int(time.time() * 1000),
                    "operation": "WRITE",
                    "operationParameters": {
                        "mode": "sync",
                        "sourceVersion": str(snap.version),
                        # sidecar-recovery payload: the mapping DELTA and
                        # current DV fingerprints ride each commit, so
                        # the sidecar rebuilds from the log after a crash
                        # between publish and state save
                        "lakeMapping": json.dumps(new_mapping),
                        "lakeRemoved": json.dumps(gone_files),
                        "lakeDvs": json.dumps(new_dvs),
                    },
                }
            },
            {"txn": {"appId": _TXN_APP, "version": snap.version}},
        ]
        if schema_changed:
            actions.append(
                _metadata_action(
                    snap.schema, snap.partition_by, state["table_id"],
                    self._configuration(),
                )
            )
        cdc_actions: list[dict] = []
        if self.change_data:
            cdc_actions = self._write_change_data(
                snap, state["lake_version"] + 1, snap.version
            )
            actions.extend(cdc_actions)
        actions.extend(removes)
        actions.extend(adds)
        try:
            _write_commit(self.dest, delta_version, actions)
        except BaseException:
            # cdc files are placed under _change_data/ BEFORE the publish
            # and carry fresh uuid names, so a retried sync writes NEW
            # ones — a failed publish would orphan this attempt's files
            # forever. Best-effort removal here covers every in-process
            # failure; a hard crash (kill -9) is covered by
            # vacuum_export's unreferenced-cdc sweep.
            for a in cdc_actions:
                try:
                    os.remove(
                        os.path.join(
                            self.dest,
                            urllib.parse.unquote(a["cdc"]["path"]),
                        )
                    )
                except OSError:
                    pass
            raise
        _save_state(
            self.dest,
            {
                **state,
                "lake_version": snap.version,
                "delta_version": delta_version,
                "schema_json": snap.schemas[-1] if snap.schemas else None,
                "mapping": mapping,
                "dvs": new_dvs,
            },
        )
        checkpointed = False
        if delta_version % CHECKPOINT_EVERY == 0:
            # bound the reader's JSON-tail replay: one parquet checkpoint
            # every CHECKPOINT_EVERY commits (Delta's own writer cadence)
            write_checkpoint(self.dest)
            checkpointed = True
        return {
            "delta_version": delta_version,
            "lake_version": snap.version,
            "added": len(adds),
            "removed": len(removes),
            "noop": False,
            "checkpointed": checkpointed,
        }


def export_delta(
    table: LakeTable,
    dest: str,
    version_as_of: int | None = None,
    timestamp_as_of: str | int | None = None,
    change_data: bool = False,
) -> dict[str, Any]:
    """One-shot snapshot export (see :class:`DeltaExporter`)."""
    return DeltaExporter(table, dest, change_data=change_data).export(
        version_as_of, timestamp_as_of
    )


def sync_delta(
    table: LakeTable, dest: str, change_data: bool = False
) -> dict[str, Any]:
    """Incremental export advance (see :meth:`DeltaExporter.sync`)."""
    return DeltaExporter(table, dest, change_data=change_data).sync()


def vacuum_export(
    dest: str, retention_hours: float = 168.0
) -> dict[str, Any]:
    """Physically delete export data files tombstoned by ``remove``
    actions older than the retention window — the Delta VACUUM for the
    export side. Without it, every sync that rewrites or drops files
    leaves the old bytes on disk forever (removes are logical in the
    protocol). Retention protects in-flight readers of recent snapshots,
    exactly like table-side vacuum; files referenced by ANY current add
    action are never touched."""
    cutoff_ms = (time.time() - retention_hours * 3600) * 1000
    state = replay_delta_log(dest)
    live = {urllib.parse.unquote(p) for p in state["files"]}
    removed = {
        urllib.parse.unquote(p): ts
        for p, ts in _collect_tombstones(dest, state).items()
    }
    deleted, kept = [], []
    for rel, ts in sorted(removed.items()):
        if rel in live:
            continue
        path = os.path.join(dest, rel)
        if not os.path.exists(path):
            continue
        if ts > cutoff_ms:
            kept.append(rel)
            continue
        os.remove(path)
        deleted.append(rel)
    # Change-data files age on the same retention as tombstones (Delta
    # VACUUM's rule for `_change_data`): a cdc file belongs to exactly
    # one commit; once that commit is older than the window no CDF
    # reader is entitled to it, and without this sweep a change_data
    # export grows without bound (O(total changes ever), a real
    # steady-state leak at CDC rates).
    cdc_deleted = 0
    cdc_referenced: set[str] = set()
    log_dir = os.path.join(dest, _LOG)
    for n in sorted(os.listdir(log_dir)):
        if not (n.endswith(".json") and n[:-5].isdigit()):
            continue
        commit_ts = None
        with open(os.path.join(log_dir, n)) as fh:
            actions = [json.loads(x) for x in fh if x.strip()]
        for a in actions:
            if "commitInfo" in a:
                commit_ts = a["commitInfo"].get("timestamp")
        for a in actions:
            if "cdc" in a:
                cdc_referenced.add(urllib.parse.unquote(a["cdc"]["path"]))
        if commit_ts is None or commit_ts > cutoff_ms:
            continue
        for a in actions:
            if "cdc" in a:
                p = os.path.join(
                    dest, urllib.parse.unquote(a["cdc"]["path"])
                )
                if os.path.exists(p):
                    os.remove(p)
                    cdc_deleted += 1
    # UNREFERENCED cdc files: a sync that crashed between placing its
    # _change_data files and publishing the commit leaves uuid-named
    # files no commit will ever reference (the retry writes new ones).
    # Sweep them on the same retention window — mtime-aged, because no
    # commit timestamp exists for them; the window also protects the
    # files of an in-flight concurrent sync.
    cdc_dir = os.path.join(dest, "_change_data")
    if os.path.isdir(cdc_dir):
        for root_dir, _dirs, names in os.walk(cdc_dir):
            for nme in names:
                p = os.path.join(root_dir, nme)
                rel = os.path.relpath(p, dest)
                if rel in cdc_referenced:
                    continue
                try:
                    if os.path.getmtime(p) * 1000 <= cutoff_ms:
                        os.remove(p)
                        cdc_deleted += 1
                except OSError:
                    pass
    return {
        "deleted": len(deleted),
        "retained": len(kept),
        "live": len(live),
        "cdc_deleted": cdc_deleted,
    }


# ---------------------------------------------------------------------------
# Parquet checkpoints (Delta "classic checkpoint" spec): a reader lists
# _last_checkpoint, loads ONE parquet file for the full state at version N,
# then replays only the JSON commits after N — O(tail), not O(history).
# A long-running sync_delta loop writes one commit per tick, so without
# checkpoints an external reader's listing cost grows without bound.
# ---------------------------------------------------------------------------

#: write a checkpoint every N sync commits (Delta's own writer default)
CHECKPOINT_EVERY = 10


def _checkpoint_arrow_schema():
    import pyarrow as pa

    return pa.schema(
        [
            pa.field(
                "txn",
                pa.struct(
                    [
                        pa.field("appId", pa.string()),
                        pa.field("version", pa.int64()),
                    ]
                ),
            ),
            pa.field(
                "add",
                pa.struct(
                    [
                        pa.field("path", pa.string()),
                        pa.field(
                            "partitionValues",
                            pa.map_(pa.string(), pa.string()),
                        ),
                        pa.field("size", pa.int64()),
                        pa.field("modificationTime", pa.int64()),
                        pa.field("dataChange", pa.bool_()),
                        pa.field("stats", pa.string()),
                    ]
                ),
            ),
            pa.field(
                "metaData",
                pa.struct(
                    [
                        pa.field("id", pa.string()),
                        pa.field(
                            "format",
                            pa.struct(
                                [
                                    pa.field("provider", pa.string()),
                                    pa.field(
                                        "options",
                                        pa.map_(pa.string(), pa.string()),
                                    ),
                                ]
                            ),
                        ),
                        pa.field("schemaString", pa.string()),
                        pa.field("partitionColumns", pa.list_(pa.string())),
                        pa.field(
                            "configuration",
                            pa.map_(pa.string(), pa.string()),
                        ),
                        pa.field("createdTime", pa.int64()),
                    ]
                ),
            ),
            pa.field(
                "protocol",
                pa.struct(
                    [
                        pa.field("minReaderVersion", pa.int32()),
                        pa.field("minWriterVersion", pa.int32()),
                    ]
                ),
            ),
            pa.field(
                "remove",
                pa.struct(
                    [
                        pa.field("path", pa.string()),
                        pa.field("deletionTimestamp", pa.int64()),
                        pa.field("dataChange", pa.bool_()),
                    ]
                ),
            ),
        ]
    )


def _collect_tombstones(dest: str, state: dict) -> dict[str, int]:
    """Dead delta paths → deletionTimestamp ms: every removed path not
    currently live and not re-added later (restore-style)."""
    live = set(state["files"])
    log_dir = os.path.join(dest, _LOG)
    versions = sorted(
        int(n[:-5])
        for n in os.listdir(log_dir)
        if n.endswith(".json") and n[:-5].isdigit()
    )
    removed: dict[str, int] = {}
    for v in versions:
        with open(_commit_file(dest, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "remove" in action:
                    r = action["remove"]
                    removed[r["path"]] = r.get("deletionTimestamp", 0)
                elif "add" in action:
                    removed.pop(action["add"]["path"], None)
    return {p: ts for p, ts in removed.items() if p not in live}


def write_checkpoint(
    dest: str,
    version: int | None = None,
    tombstone_retention_hours: float = 168.0,
) -> dict[str, Any]:
    """Write the classic parquet checkpoint for ``dest`` at ``version``
    (default: latest) + the ``_last_checkpoint`` pointer. The checkpoint
    row set is the full replay state: protocol, metaData, latest txn per
    appId, one row per ACTIVE add, and — per the spec — the remove
    TOMBSTONES not yet past retention, so a checkpoint-based external
    VACUUM still sees recently-removed files as tracked and cannot
    delete data that in-flight time-travel readers reference."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    state = replay_delta_log(dest)
    v = state["version"] if version is None else version
    if version is not None and version != state["version"]:
        raise ValueError(
            "checkpointing a historical version requires replaying a "
            f"prefix; got {version}, latest {state['version']}"
        )
    rows: list[dict] = [
        {"protocol": state["protocol"]},
        {"metaData": state["metadata_raw"]},
    ]
    for app_id, tv in sorted(state["txns"].items()):
        rows.append({"txn": {"appId": app_id, "version": tv}})
    for _path, add in sorted(state["files"].items()):
        entry = {
            "path": add["path"],
            "partitionValues": list(
                (add.get("partitionValues") or {}).items()
            ),
            "size": add["size"],
            "modificationTime": add.get("modificationTime"),
            "dataChange": False,  # checkpoint adds are state, not changes
            "stats": add.get("stats"),
        }
        rows.append({"add": entry})
    cutoff_ms = (time.time() - tombstone_retention_hours * 3600) * 1000
    for rel, ts in sorted(_collect_tombstones(dest, state).items()):
        if ts > cutoff_ms:
            rows.append(
                {
                    "remove": {
                        "path": rel,
                        "deletionTimestamp": ts,
                        "dataChange": False,
                    }
                }
            )
    schema = _checkpoint_arrow_schema()
    cols = {}
    for name in ("txn", "add", "metaData", "protocol", "remove"):
        vals = [r.get(name) for r in rows]
        if name == "metaData":
            vals = [
                None
                if m is None
                else {
                    **m,
                    "format": {
                        "provider": m["format"]["provider"],
                        "options": list(m["format"]["options"].items()),
                    },
                    "configuration": list(
                        (m.get("configuration") or {}).items()
                    ),
                }
                for m in vals
            ]
        cols[name] = pa.array(vals, type=schema.field(name).type)
    table = pa.table(cols, schema=schema)
    ckpt_path = os.path.join(dest, _LOG, f"{v:020d}.checkpoint.parquet")
    tmp = ckpt_path + f".tmp-{uuid.uuid4().hex}"
    pq.write_table(table, tmp)
    os.rename(tmp, ckpt_path)
    last = {"version": v, "size": len(rows)}
    lp = os.path.join(dest, _LOG, "_last_checkpoint")
    tmp = lp + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(last, fh)
    os.rename(tmp, lp)
    return {"version": v, "actions": len(rows), "path": ckpt_path}


def read_checkpoint_state(dest: str) -> dict[str, Any] | None:
    """Reconstruct table state the way a checkpoint-aware reader does:
    load ``_last_checkpoint`` → the parquet checkpoint → replay only the
    JSON commits after it. Returns the same shape as
    :func:`replay_delta_log`, or None if no checkpoint exists."""
    import pyarrow.parquet as pq

    lp = os.path.join(dest, _LOG, "_last_checkpoint")
    if not os.path.exists(lp):
        return None
    with open(lp) as fh:
        ckpt_ver = json.load(fh)["version"]
    tbl = pq.read_table(
        os.path.join(dest, _LOG, f"{ckpt_ver:020d}.checkpoint.parquet")
    )
    files: dict[str, dict] = {}
    schema = None
    part_cols: list[str] = []
    txns: dict[str, int] = {}
    protocol = None
    tombstones: dict[str, int] = {}
    for row in tbl.to_pylist():
        if row.get("protocol"):
            protocol = row["protocol"]
        if row.get("metaData"):
            m = row["metaData"]
            schema = StructType.fromJson(json.loads(m["schemaString"]))
            part_cols = list(m["partitionColumns"])
        if row.get("txn"):
            txns[row["txn"]["appId"]] = row["txn"]["version"]
        if row.get("add"):
            add = dict(row["add"])
            add["partitionValues"] = dict(add["partitionValues"] or [])
            files[add["path"]] = add
        if row.get("remove"):
            r = row["remove"]
            tombstones[r["path"]] = r["deletionTimestamp"]
    # JSON tail after the checkpoint
    log_dir = os.path.join(dest, _LOG)
    tail = sorted(
        int(n[:-5])
        for n in os.listdir(log_dir)
        if n.endswith(".json") and n[:-5].isdigit() and int(n[:-5]) > ckpt_ver
    )
    version = ckpt_ver
    for v in tail:
        version = v
        with open(_commit_file(dest, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    files[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    files.pop(action["remove"]["path"], None)
                elif "metaData" in action:
                    schema = StructType.fromJson(
                        json.loads(action["metaData"]["schemaString"])
                    )
                    part_cols = action["metaData"]["partitionColumns"]
                elif "txn" in action:
                    txns[action["txn"]["appId"]] = action["txn"]["version"]
                elif "protocol" in action:
                    protocol = action["protocol"]
    return {
        "files": files,
        "schema": schema,
        "partition_columns": part_cols,
        "version": version,
        "txns": txns,
        "protocol": protocol,
        "checkpoint_version": ckpt_ver,
        "tombstones": tombstones,
    }


# ---------------------------------------------------------------------------
# Minimal Delta log replay — used by tests to verify the exported log the
# way an external reader would, and available as a sanity check in prod
# (read back what was published, compare file lists).
# ---------------------------------------------------------------------------
def replay_delta_log(dest: str) -> dict[str, Any]:
    """Replay ``dest/_delta_log`` per the public Delta protocol: apply
    add/remove in commit order; later metaData/protocol win. Returns
    {"files": {delta_path: add_entry}, "schema": StructType,
    "partition_columns": [...], "version": n, "txns": {appId: version}}.
    """
    log_dir = os.path.join(dest, _LOG)
    versions = sorted(
        int(n[:-5])
        for n in os.listdir(log_dir)
        if n.endswith(".json") and n[:-5].isdigit()
    )
    if not versions or versions != list(range(versions[-1] + 1)):
        raise ValueError(f"broken delta log in {dest}: versions={versions}")
    files: dict[str, dict] = {}
    schema = None
    part_cols: list[str] = []
    txns: dict[str, int] = {}
    protocol = None
    metadata_raw = None
    for v in versions:
        with open(_commit_file(dest, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    files[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    files.pop(action["remove"]["path"], None)
                elif "metaData" in action:
                    metadata_raw = action["metaData"]
                    schema = StructType.fromJson(
                        json.loads(action["metaData"]["schemaString"])
                    )
                    part_cols = action["metaData"]["partitionColumns"]
                elif "txn" in action:
                    txns[action["txn"]["appId"]] = action["txn"]["version"]
                elif "protocol" in action:
                    protocol = action["protocol"]
    return {
        "files": files,
        "schema": schema,
        "partition_columns": part_cols,
        "version": versions[-1],
        "txns": txns,
        "protocol": protocol,
        "metadata_raw": metadata_raw,
    }
