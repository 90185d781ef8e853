"""Generate a 10x-scale synthetic dataset for the scaling bench.

The driver ships sf{0.001,0.01,0.1}; the r5 verdict asked for the heavy
dedup/ANN/BPE scale claims to be MEASURED at ~sf1.0, not argued from plan
shape. This script writes an sf1.0-equivalent dataset (10x the sf0.1 row
counts) to --out (default /tmp/scale10), derived from the sf0.1 tables:

- relational tables (customer/supplier/part/orders/lineitem/events):
  10 disjoint clones with consistent per-key-domain offsets, so every
  join cardinality, selectivity, and skew profile is preserved exactly
  at 10x rows; region/nation stay fixed (TPC-H scaling keeps dims fixed)
- documents: synthesized from the same vocabulary with the observed
  (lang, source) and word-count distributions resampled, plus ~6%
  near-duplicate mutations of earlier docs so the dedup pair space is
  non-vacuous but not the pathological 10-identical-copies shape a
  naive clone would create
- embeddings: each source vector contributes 10 jittered samples
  (cluster structure preserved, no exact duplicates)

Deterministic (seed 7). Pure pyarrow/numpy — no Spark needed.
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10


def _read(t: str) -> pa.Table:
    return pq.read_table(os.path.join(SRC, f"{t}.parquet"))


#: tables at/above this row count are written as a DIRECTORY of part
#: files instead of one pyarrow file. r11 (r10 verdict #6): the one-file
#: layout gave every scale A/B a fixed scan-straggler residue — a single
#: small file is one Spark scan partition no matter how many row groups
#: it holds (splitting is byte-ranged and capped by maxPartitionBytes,
#: which a few-MB file never reaches), so the first stage of every
#: 10x/100x measurement ran 1-13 tasks with one dominant straggler that
#: was harness shape, not query cost.
_MULTIFILE_MIN_ROWS = 10_000
_N_FILES = 32


def _write(out: str, t: str, tbl: pa.Table) -> None:
    path = os.path.join(out, f"{t}.parquet")
    n = tbl.num_rows
    if n < _MULTIFILE_MIN_ROWS:
        pq.write_table(tbl, path)
        print(f"  {t}: {n} rows (1 file)")
        return
    os.makedirs(path, exist_ok=True)
    per = -(-n // _N_FILES)  # ceil: even slices, deterministic
    for i in range(_N_FILES):
        lo = i * per
        if lo >= n:
            break
        pq.write_table(
            tbl.slice(lo, min(per, n - lo)),
            os.path.join(path, f"part-{i:05d}.parquet"),
        )
    print(f"  {t}: {n} rows ({min(_N_FILES, -(-n // per))} files)")


def _clone_with_offsets(
    tbl: pa.Table, offsets: dict[str, int], copies: int
) -> pa.Table:
    parts = []
    for i in range(copies):
        cols = []
        for name in tbl.column_names:
            col = tbl.column(name)
            if name in offsets and i > 0:
                col = pa.chunked_array(
                    [
                        pa.compute.add(c, offsets[name] * i)
                        for c in col.chunks
                    ]
                )
            cols.append(col)
        parts.append(pa.table(dict(zip(tbl.column_names, cols))))
    return pa.concat_tables(parts)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/scale10")
    ap.add_argument("--copies", type=int, default=COPIES)
    args = ap.parse_args()
    out, copies = args.out, args.copies
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    rng = np.random.default_rng(7)

    # fixed dims: straight copies
    for t in ("region", "nation"):
        _write(out, t, _read(t))

    # key domains sized from the data (max key + 1), consistent across
    # every table that references them
    orders = _read("orders")
    o_max = pa.compute.max(orders.column("o_orderkey")).as_py() + 1
    part = _read("part")
    p_max = pa.compute.max(part.column("p_partkey")).as_py() + 1
    supp = _read("supplier")
    s_max = pa.compute.max(supp.column("s_suppkey")).as_py() + 1
    cust = _read("customer")
    c_max = pa.compute.max(cust.column("c_custkey")).as_py() + 1

    _write(out, "customer", _clone_with_offsets(cust, {"c_custkey": c_max}, copies))
    _write(out, "supplier", _clone_with_offsets(supp, {"s_suppkey": s_max}, copies))
    _write(out, "part", _clone_with_offsets(part, {"p_partkey": p_max}, copies))
    _write(
        out,
        "orders",
        _clone_with_offsets(
            orders, {"o_orderkey": o_max, "o_custkey": c_max}, copies
        ),
    )
    _write(
        out,
        "lineitem",
        _clone_with_offsets(
            _read("lineitem"),
            {"l_orderkey": o_max, "l_partkey": p_max, "l_suppkey": s_max},
            copies,
        ),
    )
    ev = _read("events")
    e_max = pa.compute.max(ev.column("event_id")).as_py() + 1
    u_max = pa.compute.max(ev.column("user_id")).as_py() + 1
    _write(
        out,
        "events",
        _clone_with_offsets(
            ev, {"event_id": e_max, "user_id": u_max}, copies
        ),
    )

    # documents: synthesize from the observed vocabulary + distributions
    docs = _read("documents").to_pylist()
    vocab = sorted({w for d in docs for w in d["text"].split()})
    lang_src = [(d["lang"], d["source"]) for d in docs]
    lengths = np.array([len(d["text"].split()) for d in docs])
    n_docs = len(docs) * copies
    texts: list[str] = []
    langs: list[str] = []
    sources: list[str] = []
    varr = np.array(vocab)
    for i in range(n_docs):
        if i > 100 and rng.random() < 0.06:
            # near-duplicate: mutate ~10% of an earlier doc's words
            base = texts[int(rng.integers(0, i))].split()
            k = max(1, len(base) // 10)
            idx = rng.choice(len(base), size=k, replace=False)
            for j in idx:
                base[j] = str(varr[rng.integers(0, len(varr))])
            texts.append(" ".join(base))
        else:
            n = int(lengths[rng.integers(0, len(lengths))])
            texts.append(
                " ".join(varr[rng.integers(0, len(varr), size=n)])
            )
        ls = lang_src[int(rng.integers(0, len(lang_src)))]
        langs.append(ls[0])
        sources.append(ls[1])
    _write(
        out,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
    )

    # embeddings: 10 jittered samples per source vector
    emb = _read("embeddings")
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.array(emb.column("label").to_pylist(), dtype=np.int32)
    n, d = vecs.shape
    scale = 0.05 * float(np.std(vecs))
    all_vecs = np.concatenate(
        [
            vecs + rng.normal(0, scale, size=(n, d)).astype(np.float32)
            if i > 0
            else vecs
            for i in range(copies)
        ]
    )
    all_labels = np.tile(labels, copies)
    _write(
        out,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(range(n * copies), pa.int64()),
                "embedding": pa.array(
                    [row.tolist() for row in all_vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(all_labels, pa.int32()),
            }
        ),
    )
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
