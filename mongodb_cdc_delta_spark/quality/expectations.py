"""Declarative data-quality constraint suites (the Deequ/Great-Expectations
shape), compiled to ONE aggregation pass per table.

A suite is a list of constraints — completeness, uniqueness, accepted
range, set membership, referential integrity — evaluated together:
every non-join metric folds into a single groupBy().agg() over one scan,
and each referential-integrity check adds exactly one broadcast-or-shuffle
anti-join. On a 100 TB table the whole suite costs one pass, not one pass
per constraint (the naive loop most QA harnesses run).

Reference parity: extends the reference's validation rules
(delta-writer's quality config — SURVEY §2.9 T1/T5) from per-row
split/quarantine to table-level constraint verification.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """One declarative expectation.

    kind: completeness | uniqueness | min_value | max_value | in_set |
          ref_integrity
    column: the checked column
    threshold: pass bar for ratio metrics (completeness/uniqueness/in_set/
          ref_integrity: metric >= threshold passes; default 1.0 = exact)
    value: kind-specific payload (min/max bound, allowed set, or the
          (other_df, other_col) pair for ref_integrity supplied at verify)
    """

    kind: str
    column: str
    threshold: float = 1.0
    value: object = None


def _metric_cols(constraints: list[Constraint]) -> list:
    aggs = [F.count("*").cast("double").alias("__n")]
    for i, c in enumerate(constraints):
        col = F.col(c.column)
        if c.kind == "completeness":
            aggs.append(
                F.count(col).cast("double").alias(f"__m{i}")
            )  # count(col) skips nulls
        elif c.kind == "uniqueness":
            aggs.append(
                F.count_distinct(col).cast("double").alias(f"__m{i}")
            )
        elif c.kind == "min_value":
            aggs.append(F.min(col).cast("double").alias(f"__m{i}"))
        elif c.kind == "max_value":
            aggs.append(F.max(col).cast("double").alias(f"__m{i}"))
        elif c.kind == "in_set":
            allowed = F.array(*[F.lit(v) for v in c.value])
            aggs.append(
                F.sum(
                    F.when(F.array_contains(allowed, col), 1).otherwise(0)
                ).cast("double").alias(f"__m{i}")
            )
        elif c.kind == "ref_integrity":
            aggs.append(F.lit(None).cast("double").alias(f"__m{i}"))
        else:
            raise ValueError(f"unknown constraint kind: {c.kind}")
    return aggs


def verify_suite(
    df: DataFrame,
    constraints: list[Constraint],
    refs: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """Evaluate a constraint suite; returns one row per constraint:
    (constraint, column, metric, threshold, status).

    Ratio metrics are fractions in [0, 1]; min/max metrics compare the
    observed extreme against the declared bound. ``refs`` maps a
    ref_integrity constraint's column to the dimension DataFrame holding
    the valid keys (first column used)."""
    spark = df.sparkSession
    base = df.agg(*_metric_cols(constraints)).first()
    n = base["__n"] or 0.0
    rows = []
    for i, c in enumerate(constraints):
        m = base[f"__m{i}"]
        if c.kind == "completeness":
            metric = (m / n) if n else 1.0
            ok = metric >= c.threshold
        elif c.kind == "uniqueness":
            metric = (m / n) if n else 1.0
            ok = metric >= c.threshold
        elif c.kind == "min_value":
            metric = m
            ok = m is not None and m >= float(c.value)
        elif c.kind == "max_value":
            metric = m
            ok = m is not None and m <= float(c.value)
        elif c.kind == "in_set":
            metric = (m / n) if n else 1.0
            ok = metric >= c.threshold
        elif c.kind == "ref_integrity":
            dim = (refs or {}).get(c.column)
            if dim is None:
                raise ValueError(
                    f"ref_integrity for {c.column} needs refs[{c.column!r}]"
                )
            key = dim.columns[0]
            orphans = (
                df.select(F.col(c.column).alias(key))
                .where(F.col(key).isNotNull())
                .join(dim.select(key), key, "left_anti")
                .count()
            )
            metric = 1.0 - (orphans / n if n else 0.0)
            ok = metric >= c.threshold
        # for bound constraints the meaningful bar is the declared bound,
        # not the ratio threshold
        bar = (
            float(c.value)
            if c.kind in ("min_value", "max_value")
            else float(c.threshold)
        )
        rows.append(
            (
                c.kind,
                c.column,
                round(float(metric), 6) if metric is not None else None,
                bar,
                "pass" if ok else "fail",
            )
        )
    return spark.createDataFrame(
        rows,
        "constraint string, column string, metric double, "
        "threshold double, status string",
    )
