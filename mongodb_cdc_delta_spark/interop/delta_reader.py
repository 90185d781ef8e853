"""Independent Delta Lake reader, written ONLY from the public protocol
spec (delta-io/delta ``PROTOCOL.md``, the "Delta Transaction Log
Protocol").

Purpose: the exporter in ``sinks/delta_export.py`` claims to publish a
spec-conformant ``_delta_log``; its in-module ``replay_delta_log``
validator shares an author and a code path with the writer, so a shared
misreading of the spec would pass silently. The reference's actual read
contract is a THIRD-PARTY reader — DuckDB ``delta_scan`` (reference
README.md:78, specs/001-mongodb-cdc-delta/research.md:546-615) — which
cannot be installed in this offline container. This module is the
stand-in: a from-scratch reader that

- imports NOTHING from ``mongodb_cdc_delta_spark`` outside ``interop``
  (enforced by ``tests/test_delta_independent_reader.py``),
- parses every field from the spec text (the section is cited at each
  parse site; quotes are from PROTOCOL.md as published),
- reads data files with pyarrow, not Spark — a different parquet stack
  from the one that wrote them,
- REFUSES tables it cannot faithfully read (protocol versions / table
  features beyond what it implements) instead of guessing.

Spec sections used (PROTOCOL.md headings):
  "Delta Log Entries"            — log layout, atomic JSON commits
  "Checkpoints"                  — classic parquet checkpoint layout
  "Last Checkpoint File"         — ``_last_checkpoint`` pointer
  "Actions" (metaData/add/remove/txn/protocol/commitInfo)
  "Action Reconciliation"        — snapshot construction rules
  "Schema Serialization Format"  — schemaString JSON
  "Partition Value Serialization"
  "Protocol Evolution" / "Reader Requirements"
  "Column Mapping", "Deletion Vectors" — detected and refused
"""

from __future__ import annotations

import json
import os
import re
import urllib.parse
from dataclasses import dataclass, field
from datetime import date, datetime
from decimal import Decimal
from typing import Any

__all__ = [
    "DeltaReadError",
    "UnsupportedDeltaTable",
    "Snapshot",
    "load_snapshot",
    "read_rows",
    "read_table",
    "read_changes",
]


class DeltaReadError(Exception):
    """The log violates the Delta protocol (or is missing/corrupt)."""


class UnsupportedDeltaTable(DeltaReadError):
    """The table is valid Delta but needs reader capabilities this
    implementation does not provide (high reader version, table
    features, column mapping, deletion vectors)."""


_LOG_DIR = "_delta_log"
# "Delta Log Entries": "log entries ... use the format
# ``{n}.json`` where n is zero-padded to 20 digits"; checkpoints
# ("Checkpoints" section) use ``{n}.checkpoint.parquet`` and multi-part
# ``{n}.checkpoint.{p}.{t}.parquet``.
_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CKPT_RE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")
_CKPT_PART_RE = re.compile(
    r"^(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet$"
)


# ---------------------------------------------------------------------------
# Schema Serialization Format
# ---------------------------------------------------------------------------
# "Schema Serialization Format": primitive types are identified by name;
# this is the full primitive list given in the spec table.
_PRIMITIVE_TYPES = {
    "string",
    "long",
    "integer",
    "short",
    "byte",
    "float",
    "double",
    "boolean",
    "binary",
    "date",
    "timestamp",
    "timestamp_ntz",
    "variant",
}
_DECIMAL_RE = re.compile(r"^decimal\(\s*(\d+)\s*,\s*(-?\d+)\s*\)$")


def _check_type(t: Any, where: str) -> Any:
    """Validate one schemaString type node per "Schema Serialization
    Format": a primitive name string, or an object with ``type`` in
    {struct, array, map}."""
    if isinstance(t, str):
        if t in _PRIMITIVE_TYPES or _DECIMAL_RE.match(t):
            return t
        raise DeltaReadError(f"unknown primitive type {t!r} at {where}")
    if not isinstance(t, dict):
        raise DeltaReadError(f"malformed type node at {where}: {t!r}")
    kind = t.get("type")
    if kind == "struct":
        fields = t.get("fields")
        if not isinstance(fields, list):
            raise DeltaReadError(f"struct without fields list at {where}")
        for f in fields:
            # spec: each field has name / type / nullable / metadata
            for key in ("name", "type", "nullable"):
                if key not in f:
                    raise DeltaReadError(
                        f"struct field missing {key!r} at {where}"
                    )
            _check_type(f["type"], f"{where}.{f['name']}")
    elif kind == "array":
        # spec: array has elementType and containsNull
        _check_type(t.get("elementType"), f"{where}[]")
    elif kind == "map":
        # spec: map has keyType, valueType, valueContainsNull
        _check_type(t.get("keyType"), f"{where}<key>")
        _check_type(t.get("valueType"), f"{where}<value>")
    else:
        raise DeltaReadError(f"unknown complex type {kind!r} at {where}")
    return t


def parse_schema_string(schema_string: str) -> dict:
    """Parse and validate ``metaData.schemaString``. Per "Schema
    Serialization Format" the root must be a struct."""
    try:
        node = json.loads(schema_string)
    except json.JSONDecodeError as e:
        raise DeltaReadError(f"schemaString is not JSON: {e}") from e
    node = _check_type(node, "<root>")
    if not (isinstance(node, dict) and node.get("type") == "struct"):
        raise DeltaReadError("schemaString root is not a struct")
    return node


# ---------------------------------------------------------------------------
# Partition Value Serialization
# ---------------------------------------------------------------------------
def parse_partition_value(serialized: str | None, type_name: Any) -> Any:
    """Deserialize one ``add.partitionValues`` entry per "Partition Value
    Serialization": values are strings; the spec table gives one parse
    rule per primitive type. A null partition value "is always
    serialized as null" in the map."""
    if serialized is None:
        return None
    if not isinstance(type_name, str):
        raise UnsupportedDeltaTable(
            f"complex partition column type {type_name!r}"
        )
    if type_name == "string":
        return serialized  # spec: "the string itself"
    if serialized == "":
        # spec: for non-string primitives an empty string also reads as
        # null ("an empty string for any other data type" → null)
        return None
    if type_name in ("long", "integer", "short", "byte"):
        return int(serialized)
    if type_name in ("float", "double"):
        return float(serialized)
    if type_name == "boolean":
        if serialized not in ("true", "false"):
            raise DeltaReadError(f"bad boolean partition {serialized!r}")
        return serialized == "true"
    if type_name == "date":
        # spec: "{year}-{month}-{day}"
        return date.fromisoformat(serialized)
    if type_name in ("timestamp", "timestamp_ntz"):
        # spec: "{year}-{month}-{day} {hour}:{minute}:{second}" with
        # optional fractional seconds (microsecond precision)
        txt = serialized.replace("T", " ")
        fmt = "%Y-%m-%d %H:%M:%S.%f" if "." in txt else "%Y-%m-%d %H:%M:%S"
        return datetime.strptime(txt, fmt)
    if _DECIMAL_RE.match(type_name):
        return Decimal(serialized)
    if type_name == "binary":
        # spec: binary partition values are the raw bytes as a string
        return serialized.encode()
    raise UnsupportedDeltaTable(
        f"partition value of type {type_name!r} not supported"
    )


# ---------------------------------------------------------------------------
# Protocol / feature gating
# ---------------------------------------------------------------------------
def _check_protocol(protocol: dict | None, configuration: dict) -> None:
    """Per "Protocol Evolution": "a client should refuse to read ...
    tables whose [reader] version is higher than the maximum it
    understands". This implementation understands readerVersion 1 and 2
    (2 adds Column Mapping, which we detect and refuse below; a table
    may legally be at 2 without enabling it). readerVersion 3 means
    ``readerFeatures`` gate the table — refuse unless the listed
    features are all implemented (we implement none)."""
    if protocol is None:
        raise DeltaReadError("log contains no protocol action")
    r = protocol.get("minReaderVersion")
    if not isinstance(r, int) or r < 1:
        raise DeltaReadError(f"bad minReaderVersion {r!r}")
    if r >= 3:
        feats = protocol.get("readerFeatures") or []
        raise UnsupportedDeltaTable(
            f"readerVersion {r} with readerFeatures {feats} not supported"
        )
    if r > 2:
        raise UnsupportedDeltaTable(f"readerVersion {r} not supported")
    # "Column Mapping": active when delta.columnMapping.mode is 'name'
    # or 'id'; physical column resolution then differs from schema names.
    mode = (configuration or {}).get("delta.columnMapping.mode", "none")
    if mode not in ("", "none"):
        raise UnsupportedDeltaTable(f"column mapping mode {mode!r}")


# ---------------------------------------------------------------------------
# Snapshot construction
# ---------------------------------------------------------------------------
@dataclass
class Snapshot:
    """Reconciled table state per "Action Reconciliation"."""

    root: str
    version: int
    protocol: dict
    metadata: dict
    schema: dict  # parsed schemaString (struct node)
    partition_columns: list[str]
    files: dict[str, dict]  # add.path (still URL-encoded) -> add action
    tombstones: dict[str, dict] = field(default_factory=dict)
    txns: dict[str, int] = field(default_factory=dict)

    def data_path(self, add_path: str) -> str:
        """Resolve ``add.path`` per the "Add File" spec: "a relative
        path from the root of the table", URL-encoded (RFC 2396)."""
        if "://" in add_path or add_path.startswith("/"):
            # spec allows absolute paths; the exporter never emits them
            # and supporting them would mask a writer bug here.
            raise UnsupportedDeltaTable(f"absolute add path {add_path!r}")
        rel = urllib.parse.unquote(add_path)
        if ".." in rel.split("/"):
            raise DeltaReadError(f"path escapes table root: {add_path!r}")
        return os.path.join(self.root, *rel.split("/"))


class _State:
    """Mutable reconciliation state. "Action Reconciliation" rules:
    latest protocol wins; latest metaData wins; per (path): latest add
    wins and a remove tombstones it; latest txn version per appId."""

    def __init__(self) -> None:
        self.protocol: dict | None = None
        self.metadata: dict | None = None
        self.files: dict[str, dict] = {}
        self.tombstones: dict[str, dict] = {}
        self.txns: dict[str, int] = {}

    def apply(self, action: dict, where: str) -> None:
        if "add" in action:
            a = action["add"]
            for key in ("path", "partitionValues", "size", "dataChange"):
                # "Add File": these fields are required
                if key not in a or a[key] is None:
                    raise DeltaReadError(
                        f"add missing required {key!r} in {where}"
                    )
            self.files[a["path"]] = a
            self.tombstones.pop(a["path"], None)
        elif "remove" in action:
            r = action["remove"]
            if "path" not in r:
                raise DeltaReadError(f"remove missing path in {where}")
            if r.get("deletionVectorDescriptor") or r.get("deletionVector"):
                raise UnsupportedDeltaTable("deletion vectors present")
            self.files.pop(r["path"], None)
            self.tombstones[r["path"]] = r
        elif "metaData" in action:
            m = action["metaData"]
            for key in ("id", "format", "schemaString", "partitionColumns"):
                # "Change Metadata": required fields
                if key not in m:
                    raise DeltaReadError(
                        f"metaData missing {key!r} in {where}"
                    )
            if m["format"].get("provider") != "parquet":
                raise UnsupportedDeltaTable(
                    f"format provider {m['format'].get('provider')!r}"
                )
            self.metadata = m
        elif "protocol" in action:
            self.protocol = action["protocol"]
        elif "txn" in action:
            t = action["txn"]
            self.txns[t["appId"]] = t["version"]
        elif "commitInfo" in action or "cdc" in action or "domainMetadata" in action:
            # commitInfo is informational; cdc files are only for CDF
            # readers; domainMetadata does not affect the file list.
            pass
        else:
            # "Actions" intro: readers should refuse actions they do not
            # understand only when gated by table features; an unknown
            # top-level key on protocol 1/2 is a corrupt log.
            raise DeltaReadError(
                f"unknown action {sorted(action)!r} in {where}"
            )


def _discover(log_dir: str) -> tuple[list[int], dict[int, list[str]]]:
    """List commit versions and checkpoint file-name groups (a classic
    checkpoint is a one-element group; multi-part groups are validated
    for completeness)."""
    if not os.path.isdir(log_dir):
        raise DeltaReadError(f"no {_LOG_DIR} at {os.path.dirname(log_dir)}")
    commits: list[int] = []
    ckpts: dict[int, list[str]] = {}
    parts: dict[int, list[str]] = {}
    for name in os.listdir(log_dir):
        m = _COMMIT_RE.match(name)
        if m:
            commits.append(int(m.group(1)))
            continue
        m = _CKPT_RE.match(name)
        if m:
            ckpts[int(m.group(1))] = [name]
            continue
        m = _CKPT_PART_RE.match(name)
        if m:
            # "Checkpoints": multi-part checkpoints are named
            # {n}.checkpoint.{p}.{t}.parquet — part p of t; a reader
            # must load ALL t parts (rows are split arbitrarily)
            parts.setdefault(int(m.group(1)), []).append(name)
    for v, names in parts.items():
        declared = {int(_CKPT_PART_RE.match(n).group(3)) for n in names}
        if len(declared) != 1 or len(names) != declared.pop():
            raise DeltaReadError(
                f"multi-part checkpoint at version {v} is incomplete: "
                f"{sorted(names)}"
            )
        ckpts.setdefault(v, sorted(names))
    return sorted(commits), ckpts


def _read_checkpoint_actions(path: str) -> list[dict]:
    """Read a classic parquet checkpoint per "Checkpoints": "a single
    row per action" with "one column for each action type"; null struct
    cells mean the row is not that action. Map-typed fields come back
    from pyarrow as key/value pair lists and are normalized to dicts."""
    import pyarrow.parquet as pq

    def _undo_maps(obj: Any) -> Any:
        if isinstance(obj, list) and all(
            isinstance(x, tuple) and len(x) == 2 for x in obj
        ):
            return {k: _undo_maps(v) for k, v in obj}
        if isinstance(obj, dict):
            return {k: _undo_maps(v) for k, v in obj.items()}
        if isinstance(obj, list):
            return [_undo_maps(x) for x in obj]
        return obj

    actions: list[dict] = []
    for row in pq.read_table(path).to_pylist():
        present = {
            k: v
            for k, v in row.items()
            if v is not None and k != "commitInfo"
        }
        if len(present) > 1:
            raise DeltaReadError(
                f"checkpoint row is {sorted(present)} — spec requires a "
                "single action per row"
            )
        for kind, payload in present.items():
            if kind == "add" and isinstance(payload, dict):
                payload = {
                    **payload,
                    "partitionValues": _undo_maps(
                        payload.get("partitionValues")
                    )
                    or {},
                }
            elif isinstance(payload, dict):
                payload = _undo_maps(payload)
            actions.append({kind: payload})
    return actions


def _commit_timestamp_ms(log_dir: str, v: int) -> int:
    """Commit timestamp for time travel. Per "Commit Provenance
    Information"/timestamp semantics: without the inCommitTimestamps
    feature the commit's timestamp is its log file's modification time;
    when commitInfo carries a ``timestamp`` field (best-effort
    provenance most writers emit first in the commit), prefer it — it
    survives file copies that reset mtimes."""
    path = os.path.join(log_dir, f"{v:020d}.json")
    try:
        with open(path) as fh:
            first = json.loads(fh.readline())
        ts = first.get("commitInfo", {}).get("timestamp")
        if isinstance(ts, int):
            return ts
    except (OSError, json.JSONDecodeError):
        pass
    return int(os.path.getmtime(path) * 1000)


def load_snapshot(
    root: str,
    version: int | None = None,
    timestamp_ms: int | None = None,
) -> Snapshot:
    """Build the table snapshot at ``version`` (default latest), or at
    the latest version whose commit timestamp is <= ``timestamp_ms``.

    Per "Delta Log Entries" + "Checkpoints": start from the newest
    usable checkpoint at or below the target version, then replay JSON
    commits after it in ascending order. Commit versions after the
    checkpoint must be contiguous — a gap means an incomplete log and a
    reader "must not" silently skip versions.
    """
    log_dir = os.path.join(root, _LOG_DIR)
    commits, ckpts = _discover(log_dir)
    if not commits and not ckpts:
        raise DeltaReadError(f"empty delta log at {root}")
    latest = max(commits + list(ckpts))
    if timestamp_ms is not None:
        if version is not None:
            raise ValueError("pass version or timestamp_ms, not both")
        eligible = [
            v for v in commits if _commit_timestamp_ms(log_dir, v) <= timestamp_ms
        ]
        if not eligible:
            raise DeltaReadError(
                f"no commit at or before timestamp {timestamp_ms}"
            )
        version = max(eligible)
    target = latest if version is None else version
    if target > latest or target < 0:
        raise DeltaReadError(f"version {target} not in log (latest {latest})")

    state = _State()
    start = 0
    usable = [v for v in ckpts if v <= target]
    if usable:
        ckpt_v = max(usable)
        for fname in ckpts[ckpt_v]:
            for action in _read_checkpoint_actions(
                os.path.join(log_dir, fname)
            ):
                state.apply(action, f"checkpoint@{ckpt_v}:{fname}")
        start = ckpt_v + 1

    tail = [v for v in commits if start <= v <= target]
    if tail != list(range(start, target + 1)):
        raise DeltaReadError(
            f"non-contiguous log: need {start}..{target}, have {tail}"
        )
    for v in tail:
        path = os.path.join(log_dir, f"{v:020d}.json")
        with open(path) as fh:
            for i, line in enumerate(fh):
                if not line.strip():
                    continue
                try:
                    action = json.loads(line)
                except json.JSONDecodeError as e:
                    raise DeltaReadError(
                        f"bad JSON at {path}:{i + 1}: {e}"
                    ) from e
                state.apply(action, f"{v:020d}.json:{i + 1}")

    if state.metadata is None:
        raise DeltaReadError("log contains no metaData action")
    _check_protocol(state.protocol, state.metadata.get("configuration") or {})
    schema = parse_schema_string(state.metadata["schemaString"])
    part_cols = list(state.metadata["partitionColumns"])
    names = {f["name"] for f in schema["fields"]}
    missing = [c for c in part_cols if c not in names]
    if missing:
        raise DeltaReadError(f"partitionColumns {missing} not in schema")
    return Snapshot(
        root=root,
        version=target,
        protocol=state.protocol or {},
        metadata=state.metadata,
        schema=schema,
        partition_columns=part_cols,
        files=state.files,
        tombstones=state.tombstones,
        txns=state.txns,
    )


# ---------------------------------------------------------------------------
# Data read (pyarrow; no Spark)
# ---------------------------------------------------------------------------
def _physical_type_ok(delta_type: Any, pa_type) -> bool:
    """At protocol 1/2 a data file's physical column type must already
    MATCH the table schema ("Schema Serialization Format"; changing a
    column's type requires rewriting the files, and reading widened
    files under a narrower/wider declared type is gated behind the
    typeWidening reader feature, which this reader refuses). Benign
    parquet-level representation differences (large_string, timestamp
    timezone annotation) are accepted; a genuine type mismatch means
    the writer published a lying log and must be an error, not a cast —
    silently casting would hide exactly the exporter bug this reader
    exists to catch (un-rewritten legacy-schema files)."""
    import pyarrow as pa

    if not isinstance(delta_type, str):
        kind = delta_type.get("type")
        return (
            (kind == "struct" and pa.types.is_struct(pa_type))
            or (kind == "array" and (pa.types.is_list(pa_type)
                                     or pa.types.is_large_list(pa_type)))
            or (kind == "map" and pa.types.is_map(pa_type))
        )
    m = _DECIMAL_RE.match(delta_type)
    if m:
        return (
            pa.types.is_decimal(pa_type)
            and pa_type.precision == int(m.group(1))
            and pa_type.scale == int(m.group(2))
        )
    checks = {
        "string": lambda t: pa.types.is_string(t)
        or pa.types.is_large_string(t),
        "long": pa.types.is_int64,
        "integer": pa.types.is_int32,
        "short": pa.types.is_int16,
        "byte": pa.types.is_int8,
        "float": pa.types.is_float32,
        "double": pa.types.is_float64,
        "boolean": pa.types.is_boolean,
        "binary": lambda t: pa.types.is_binary(t)
        or pa.types.is_large_binary(t),
        "date": lambda t: pa.types.is_date32(t) or pa.types.is_date64(t),
        "timestamp": pa.types.is_timestamp,
        "timestamp_ntz": lambda t: pa.types.is_timestamp(t)
        and t.tz is None,
        "variant": lambda t: True,  # opaque at this layer
    }
    fn = checks.get(delta_type)
    return bool(fn and fn(pa_type))


def read_rows(root: str, version: int | None = None) -> list[dict]:
    """Read the full table as a list of row dicts in schema column
    order. Per "Add File": partition column values come from
    ``partitionValues`` (data files do not contain them); all other
    schema columns are read from the parquet file by NAME (no column
    mapping at protocol 1/2)."""
    import pyarrow.parquet as pq

    snap = load_snapshot(root, version)
    col_types = {f["name"]: f["type"] for f in snap.schema["fields"]}
    order = [f["name"] for f in snap.schema["fields"]]
    data_cols = [c for c in order if c not in snap.partition_columns]
    rows: list[dict] = []
    for add_path, add in sorted(snap.files.items()):
        fpath = snap.data_path(add_path)
        if not os.path.exists(fpath):
            raise DeltaReadError(f"listed file missing on disk: {fpath}")
        tbl = pq.read_table(fpath)
        have = set(tbl.column_names)
        absent = [c for c in data_cols if c not in have]
        # "Schema Serialization Format" + ALTER TABLE semantics: adding a
        # nullable column is a metadata-only change — older data files are
        # NOT rewritten, and readers return null for schema columns a file
        # predates. A missing NON-nullable column, however, means the log
        # lies about its own invariants.
        nullable = {f["name"]: f.get("nullable", True) for f in
                    snap.schema["fields"]}
        hard_absent = [c for c in absent if not nullable[c]]
        if hard_absent:
            raise DeltaReadError(
                f"{fpath} lacks non-nullable schema columns {hard_absent}"
            )
        pvals = {
            c: parse_partition_value(
                (add.get("partitionValues") or {}).get(c), col_types[c]
            )
            for c in snap.partition_columns
        }
        n_rec = None
        if add.get("stats"):
            n_rec = json.loads(add["stats"]).get("numRecords")
        if n_rec is not None and n_rec != tbl.num_rows:
            raise DeltaReadError(
                f"{fpath}: stats.numRecords={n_rec} but file has "
                f"{tbl.num_rows} rows"
            )
        present_cols = [c for c in data_cols if c in have]
        for c in present_cols:
            ftype = tbl.schema.field(c).type
            if not _physical_type_ok(col_types[c], ftype):
                raise DeltaReadError(
                    f"{fpath}: column {c!r} is {ftype} on disk but the "
                    f"schema declares {col_types[c]!r} — protocol 1/2 "
                    "type changes require file rewrite"
                )
        null_fill = {c: None for c in absent}
        for rec in tbl.select(present_cols).to_pylist():
            rec.update(pvals)
            rec.update(null_fill)
            rows.append({c: rec[c] for c in order})
    return rows


def read_table(root: str, version: int | None = None):
    """Read the full table as one pyarrow Table (schema column order,
    partition columns re-attached). Convenience over :func:`read_rows`
    for columnar comparison."""
    import pyarrow as pa

    rows = read_rows(root, version)
    snap = load_snapshot(root, version)
    order = [f["name"] for f in snap.schema["fields"]]
    if not rows:
        return pa.table({c: [] for c in order})
    return pa.Table.from_pylist(rows)


def read_changes(
    root: str,
    starting_version: int,
    ending_version: int | None = None,
) -> list[dict]:
    """Change Data Feed read per the "Add CDC File" spec section: for a
    commit containing ``cdc`` actions, that commit's changes are EXACTLY
    the rows of its cdc files (``_change_type`` column inside); for a
    commit without them, adds with dataChange=true are inserts and
    removes with dataChange=true are deletes of the removed file's rows.
    Requires ``delta.enableChangeDataFeed`` in the table configuration
    ("Change Data Files": readers must not derive CDF from tables that
    never promised it). Emits data columns + ``_change_type`` +
    ``_commit_version`` + ``_commit_timestamp`` (ms)."""
    import pyarrow.parquet as pq

    snap = load_snapshot(root)
    cfg = snap.metadata.get("configuration") or {}
    if cfg.get("delta.enableChangeDataFeed") != "true":
        raise UnsupportedDeltaTable(
            "delta.enableChangeDataFeed is not set on this table"
        )
    end = snap.version if ending_version is None else ending_version
    log_dir = os.path.join(root, _LOG_DIR)
    commits, _ckpts = _discover(log_dir)
    span = [v for v in commits if starting_version <= v <= end]
    if span != list(range(starting_version, end + 1)):
        raise DeltaReadError(
            f"CDF needs the JSON commits {starting_version}..{end}; "
            f"have {span} (checkpoint cleanup removed them?)"
        )
    col_types = {f["name"]: f["type"] for f in snap.schema["fields"]}

    def file_rows(rel: str, pvals_ser: dict, extra: dict) -> list[dict]:
        fpath = snap.data_path(rel)
        if not os.path.exists(fpath):
            raise DeltaReadError(
                f"CDF-referenced file missing on disk: {fpath}"
            )
        if pvals_ser is None:
            # remove actions may omit partitionValues ("these fields are
            # optional on remove"); the hive path carries the same facts
            pvals_ser = {}
            for seg in urllib.parse.unquote(rel).split("/")[:-1]:
                if "=" in seg:
                    k, _, val = seg.partition("=")
                    pvals_ser[k] = val
        tbl = pq.read_table(fpath)
        pvals = {
            c: parse_partition_value(
                (pvals_ser or {}).get(c), col_types[c]
            )
            for c in snap.partition_columns
            if c in col_types
        }
        out = []
        for rec in tbl.to_pylist():
            rec.update(pvals)
            rec.update(extra)
            out.append(rec)
        return out

    rows: list[dict] = []
    for v in span:
        ts = _commit_timestamp_ms(log_dir, v)
        meta = {"_commit_version": v, "_commit_timestamp": ts}
        actions = []
        with open(os.path.join(log_dir, f"{v:020d}.json")) as fh:
            actions = [json.loads(x) for x in fh if x.strip()]
        cdc = [a["cdc"] for a in actions if "cdc" in a]
        if cdc:
            for c in cdc:
                # _change_type comes from inside the cdc file
                rows.extend(
                    file_rows(c["path"], c.get("partitionValues"), meta)
                )
        else:
            for a in actions:
                if "add" in a and a["add"].get("dataChange"):
                    rows.extend(
                        file_rows(
                            a["add"]["path"],
                            a["add"].get("partitionValues"),
                            {**meta, "_change_type": "insert"},
                        )
                    )
                elif "remove" in a and a["remove"].get(
                    "dataChange", True
                ):
                    rows.extend(
                        file_rows(
                            a["remove"]["path"],
                            a["remove"].get("partitionValues"),
                            {**meta, "_change_type": "delete"},
                        )
                    )
    return rows


def main(argv: list[str] | None = None) -> int:
    """``python -m mongodb_cdc_delta_spark.interop.delta_reader PATH
    [--version N]`` — print a snapshot summary + row count, as a quick
    external-reader smoke check of any Delta table on disk."""
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("path")
    ap.add_argument("--version", type=int, default=None)
    ap.add_argument("--timestamp-ms", type=int, default=None)
    args = ap.parse_args(argv)
    snap = load_snapshot(args.path, args.version, args.timestamp_ms)
    rows = read_rows(args.path, snap.version)
    print(
        json.dumps(
            {
                "version": snap.version,
                "protocol": snap.protocol,
                "columns": [f["name"] for f in snap.schema["fields"]],
                "partition_columns": snap.partition_columns,
                "files": len(snap.files),
                "tombstones": len(snap.tombstones),
                "txns": snap.txns,
                "rows": len(rows),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
