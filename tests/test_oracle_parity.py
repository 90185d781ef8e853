"""Mirror of the driver's correctness gate: run every registered query on
Spark AND its DuckDB oracle on the same parquet tables, then compare
row count + column names + order-insensitive canonical values.

Canonicalization is stricter than any reasonable hash (exact float bits via
repr, decimals normalized) — if this passes, the driver's compare passes.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import pytest

from mongodb_cdc_delta_spark.queries import all_queries
from mongodb_cdc_delta_spark.session import TABLE_NAMES

REGISTRY = all_queries()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if not q.oracle)


def _canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # scale differences (Spark decimal(28,4) vs DuckDB decimal(38,4))
        # must not matter: normalize away trailing zeros
        return str(v.normalize())
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


def _duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_oracle, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_oracle)
    s_rows = sdf.collect()
    s_cols = sdf.columns
    d_cols, d_rows = _duckdb_run(q.oracle, sf_oracle)

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} (spark) != {len(d_rows)} (duckdb)"
    )
    sc, sv = _canon_rows(s_cols, [tuple(r) for r in s_rows])
    dc, dv = _canon_rows(d_cols, d_rows)
    mismatches = [
        (a, b) for a, b in zip(sv, dv) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, sf_oracle, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_oracle)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_no_oracle_is_vacuous(sf_oracle):
    """Every oracle query must return >0 rows at sf0.01.

    A parity check on an empty result is 0 == 0 — it proves nothing about
    the query logic (a sign-flipped join would also pass). Round 3 shipped
    four such vacuous checks (event_gap_days, product_profit, set_ops,
    anti_join — predicates that matched nothing in generated data); this
    meta-test makes that class of regression impossible to ship silently.
    DuckDB-only, so it costs milliseconds per query.
    """
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_oracle, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    empty = []
    for name in ORACLE_QUERIES:
        n = con.execute(
            f"SELECT count(*) FROM ({REGISTRY[name].oracle})"
        ).fetchone()[0]
        if n == 0:
            empty.append(name)
    assert not empty, (
        f"vacuous oracle checks (0 rows at {sf_oracle}): {empty} — "
        "tune the predicate to hit generated data or add a seeded-frame "
        "unit test and make the query rows-only"
    )


def test_entry_smoke(spark, sf_smoke):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    # every oracle key must exist in queries()
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
