"""LakeCatalog: the SQL query surface over a lake of CDC tables (M5).

Replaces the reference's DuckDB analytics layer (README.md:73-78
`query-deltalake.sh "SELECT * FROM users WHERE name='Alice'"`,
research.md:539-634 delta_scan usage incl. version/timestamp params):
every table under the lake root becomes a Spark SQL view, optionally at a
time-travel snapshot, and `sql()` runs the declared query classes Q1-Q8
through Catalyst — pushdown, pruning, AQE all built in.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .table import LakeTable, _LOG_DIR


class LakeCatalog:
    def __init__(self, spark: SparkSession, lake_root: str):
        self.spark = spark
        self.lake_root = lake_root

    def tables(self) -> list[str]:
        """All committed tables under the root (dirs with a commit log)."""
        if not os.path.isdir(self.lake_root):
            return []
        return sorted(
            d
            for d in os.listdir(self.lake_root)
            if os.path.isdir(os.path.join(self.lake_root, d, _LOG_DIR))
        )

    def table(self, name: str) -> LakeTable:
        return LakeTable(self.spark, os.path.join(self.lake_root, name))

    def register_views(
        self,
        names: list[str] | None = None,
        version_as_of: int | None = None,
        timestamp_as_of: str | int | None = None,
        suffix: str = "",
    ) -> list[str]:
        """Register each table as a temp view `<name><suffix>` (optionally a
        time-travel snapshot — the DuckDB delta_scan(version=...) analogue).
        Returns the view names."""
        out = []
        for name in names if names is not None else self.tables():
            df = self.table(name).read(
                version_as_of=version_as_of, timestamp_as_of=timestamp_as_of
            )
            view = f"{name}{suffix}"
            df.createOrReplaceTempView(view)
            out.append(view)
        return out

    def sql(self, query: str) -> DataFrame:
        """Run SQL against the registered views (register_views first)."""
        return self.spark.sql(query)
